package graft

import org.apache.spark.sql.functions._
import graft.queries.KgQ

/** k21's scale backbone: the seed sample is CONSTANT-SIZE as the
  * graph grows (BFS state K·n, the Eppstein–Wang estimator's k —
  * never a fixed fraction of the nodes), deterministic, and the
  * per-node sums respect the per-seed hop bounds. */
class HarmonicClosenessSpec extends SparkSpec {

  test("the seed sample is constant-size as the graph grows (K·n state, not n²)") {
    val (edges, _) = KgQ.bfsGraph(spark, Sf0001)
    val n1 = edges.select(col("src"))
      .filter(col("src") < 1000000L).distinct().count()
    val s1 = KgQ.hcSeeds(edges).count()
    assert(s1 == math.min(KgQ.HcSeedK.toLong, n1),
      s"seed count $s1 must be min(K, customer nodes $n1)")
    // grow the graph 4×: id-offset copies (customers stay < 1e6,
    // suppliers stay >= 1e6) — customer nodes quadruple, seeds don't
    val grown = (0 until 4).map(i => edges.select(
        (col("src") + lit(i * 100000L)).as("src"),
        (col("dst") + lit(i * 100000L)).as("dst")))
      .reduce(_ unionByName _)
    val nG = grown.select(col("src"))
      .filter(col("src") < 1000000L).distinct().count()
    assert(nG == 4 * n1)
    val sG = KgQ.hcSeeds(grown).count()
    assert(sG == math.min(KgQ.HcSeedK.toLong, nG))
    assert(nG < KgQ.HcSeedK || sG == KgQ.HcSeedK.toLong,
      s"a grown graph must still yield exactly K seeds, got $sG")
    // the selection is deterministic (hash-rank + node tie-break)
    val a = KgQ.hcSeeds(edges).collect().map(_.getLong(0)).toSet
    val b = KgQ.hcSeeds(edges).collect().map(_.getLong(0)).toSet
    assert(a == b && a.forall(_ < 1000000L))
  }

  test("k21 sums respect the per-seed hop bounds over the bounded sample") {
    val k21 = SparkEntry.queries("k21_harmonic_closeness")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(k21.nonEmpty)
    k21.foreach { case (node, nSeeds, micro) =>
      assert(nSeeds >= 1 && nSeeds <= KgQ.HcSeedK,
        s"node $node reached by $nSeeds seeds, above the K=${KgQ.HcSeedK} cap")
      // every positive-distance term is floor(1e6/d) with 1 <= d <=
      // BfsRounds, so the sum sits in [nSeeds·1e6/rounds, nSeeds·1e6]
      assert(micro <= nSeeds * 1000000L, s"node $node sum above per-seed max")
      assert(micro >= nSeeds * (1000000L / KgQ.BfsRounds),
        s"node $node sum below the max-hop floor")
    }
  }
}
