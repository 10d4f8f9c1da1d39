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

  test("k22's neighborhood function is monotone and the verdict IS the 90% rule") {
    val rows = SparkEntry.queries("k22_effective_diameter")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getInt(5)))
    assert(rows.map(_._1).toSeq == (0 to KgQ.BfsRounds),
      "one row per hop from 0 to the round cap")
    // N(h) is a running sum of the per-hop counts, ending at the total
    val within = rows.map(_._3).toSeq
    assert(within == rows.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    assert(within.last == rows.head._4)
    // the verdict column replays the x10/x9 integer rule per row, and
    // eff_diameter is the first hop that satisfies it
    rows.foreach { case (_, _, w, tot, r90, _) =>
      assert(r90 == (w * 10 >= tot * 9))
    }
    val eff = rows.head._6
    assert(rows.filter(_._5).map(_._1).min == eff)
    assert(rows.forall(_._6 == eff), "the verdict is one global scalar")
  }
}
