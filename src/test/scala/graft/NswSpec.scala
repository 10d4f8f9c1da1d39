package graft

import org.apache.spark.sql.functions._
import graft.ops.Nsw

/** Graph-ANN (v30) contracts: the build is deterministic and
  * degree-bounded, descent rounds only improve neighbor quality, the
  * beam walk never scans the corpus, and search quality is measured
  * against brute force. */
class NswSpec extends SparkSpec {
  import spark.implicits._

  // a deterministic 2-ring corpus: two well-separated shells so the
  // true neighbors of any point live on its own shell
  private def corpus(n: Int) = {
    val rows = (0 until n).map { i =>
      val shell = i % 2
      val angle = 2 * math.Pi * i / n
      val base = if (shell == 0) 1.0 else 10.0
      (i.toLong, Array(base * math.cos(angle), base * math.sin(angle),
        base * 0.5, base * 0.25))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def centroidsOf(df: org.apache.spark.sql.DataFrame) =
    graft.ops.Ivf.buildExact(df, "vec_id", "embedding",
      k = 4, assignPasses = 2)

  test("build is deterministic, degree-bounded, and self-loop-free") {
    val v = corpus(80)
    val idx = centroidsOf(v)
    def edgesOf() = Nsw.build(v, "vec_id", "embedding", idx.centroids,
      blocks = 2, m = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e1 = edgesOf()
    assert(e1 == edgesOf(), "two builds over the same input must be identical")
    assert(!e1.exists { case (a, b) => a == b }, "no self loops")
    val deg = e1.groupBy(_._1).view.mapValues(_.size)
    assert(deg.values.forall(_ <= 3), "out-degree bounded by m")
    assert(deg.size == 80, "every node keeps out-edges")
  }

  test("descent rounds only improve kept neighbor quality (monotone per node)") {
    val v = corpus(80)
    val idx = centroidsOf(v)
    def qualityAt(rounds: Int): Map[Long, Double] =
      Nsw.build(v, "vec_id", "embedding", idx.centroids,
        blocks = 2, m = 3, rounds = rounds)
        .groupBy(col("a")).agg(sum(col("score")).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q0 = qualityAt(0)
    val q2 = qualityAt(2)
    assert(q0.keySet == q2.keySet)
    assert(q0.forall { case (n, q) => q2(n) >= q - 1e-12 },
      "NN-descent keeps the best-of union — per-node quality never drops")
  }

  test("beam search finds the exact neighbors on a separable corpus") {
    val v = corpus(120)
    val idx = centroidsOf(v)
    val edges = Nsw.build(v, "vec_id", "embedding", idx.centroids,
      blocks = 2, m = 4, rounds = 2)
    val q = v.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Nsw.search(edges, v, "vec_id", "embedding",
      Nsw.entries(idx.assigned, "vec_id"), q,
      beam = 4, walkRounds = 3, topK = 3)
      .select(col("qid"), col("nb_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth by the same (score desc, id) rule
    val brute = v.crossJoin(broadcast(
        q.select(col("qid"), col("qvec").cast("array<double>").as("_q"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("s", graft.ops.VectorOps.dotHof(col("embedding"), col("_q")))
    val truth = graft.plans.TopK.perKey(brute, Seq("qid"),
        Seq(col("s").desc, col("vec_id")), 3)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"beam walk must recover the separable truth, got $recall")
  }

  test("v33: recall is monotone non-decreasing in beam width") {
    val v = corpus(120)
    val idx = centroidsOf(v)
    val edges = Nsw.build(v, "vec_id", "embedding", idx.centroids,
      blocks = 2, m = 4, rounds = 2)
    val qd = v.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = v.crossJoin(broadcast(
        qd.select(col("qid"), col("qvec").cast("array<double>").as("_q"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("s", graft.ops.VectorOps.dotHof(col("embedding"), col("_q")))
    val truth = graft.plans.TopK.perKey(brute, Seq("qid"),
        Seq(col("s").desc, col("vec_id")), 3)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = Seq(1, 2, 4, 8).map { b =>
      Nsw.search(edges, v, "vec_id", "embedding",
        Nsw.entries(idx.assigned, "vec_id"), qd,
        beam = b, walkRounds = 3, topK = 3)
        .select(col("qid"), col("nb_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(truth).size
    }
    assert(hits == hits.sorted,
      s"widening the beam must never lose recall: $hits")
    assert(hits.last == truth.size,
      "a beam twice the serving width recovers the separable truth exactly")
  }

  test("external queries with excludeSelf=false keep id-colliding nodes") {
    val v = corpus(80)
    val idx = centroidsOf(v)
    val edges = Nsw.build(v, "vec_id", "embedding", idx.centroids,
      blocks = 2, m = 4, rounds = 2)
    // an EXTERNAL query whose qid numerically collides with corpus
    // node 1 (outer shell — under dot-product scoring its self-dot
    // strictly dominates every cross-dot) and whose vector IS node
    // 1's vector: the true top-1 is node 1 itself — self-exclusion
    // would silently drop it
    val q = v.filter(col("vec_id") === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val withSelf = Nsw.search(edges, v, "vec_id", "embedding",
      Nsw.entries(idx.assigned, "vec_id"), q,
      beam = 4, walkRounds = 3, topK = 3, excludeSelf = false)
      .collect().map(r => r.getAs[Long]("nb_id"))
    assert(withSelf.contains(1L),
      "external-query mode must keep the colliding node in the top-k")
    val without = Nsw.search(edges, v, "vec_id", "embedding",
      Nsw.entries(idx.assigned, "vec_id"), q,
      beam = 4, walkRounds = 3, topK = 3)
      .collect().map(r => r.getAs[Long]("nb_id"))
    assert(!without.contains(1L), "default self-recall mode excludes qid")
  }

  test("v31: blocked local repair touches only batch-adjacent neighborhoods") {
    val v = corpus(100)
    val idx = centroidsOf(v)
    val hist = v.filter(col("vec_id") < 80)
    val batch = v.filter(col("vec_id") >= 80)
    val edges = Nsw.build(hist, "vec_id", "embedding", idx.centroids,
      blocks = 1, m = 3, rounds = 1)
    val rep = Nsw.insert(edges, v, "vec_id", "embedding", idx.centroids,
      blocks = 1, m = 3, newIds = batch.select(col("vec_id")))
    val touched = rep.touched.collect().map(_.getLong(0)).toSet
    // every batch node is touched (it needs out-edges)
    assert((80L until 100L).forall(touched), "new nodes must be touched")
    // untouched nodes' edges pass through IDENTICALLY
    val before = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = rep.adjacency.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val untouchedBefore = before.filterNot { case (a, _) => touched(a) }
    val untouchedAfter = after.filterNot { case (a, _) => touched(a) }
    assert(untouchedBefore == untouchedAfter,
      "repair must never rewrite an untouched neighborhood")
    // degree bound holds everywhere after the repair
    val deg = after.groupBy(_._1).view.mapValues(_.size)
    assert(deg.values.forall(_ <= 3), "out-degree bounded by m after repair")
    // the delta is exactly the touched nodes' edge sets
    val deltaAs = rep.delta.select(col("a")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deltaAs.subsetOf(touched))
    // repaired quality never drops: a touched node keeps at least its
    // old best score (the union re-keep can only improve)
    val oldBest = edges.groupBy(col("a")).agg(max(col("score")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val newBest = rep.adjacency.groupBy(col("a")).agg(max(col("score")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(oldBest.forall { case (a, s) => newBest(a) >= s - 1e-12 })
  }

  test("v36: purgeRepair erases purged ids from rows AND neighbor lists, re-links touched nodes") {
    val v = corpus(80)
    val idx = centroidsOf(v)
    val edges = Nsw.build(v, "vec_id", "embedding", idx.centroids,
      blocks = 2, m = 3, rounds = 2)
    // purge BIG-shell nodes (odd ids, norm 10): dot-product neighbor
    // lists are dominated by big-norm vectors, so these ids sit in
    // many survivors' lists — the splice path must actually fire
    val pSet = Set(1L, 3L, 5L)
    val purged = pSet.toSeq.sorted.toDF("vec_id")
    val survivors = v.filter(!col("vec_id").isin(pSet.toSeq: _*))
    val rep = Nsw.purgeRepair(edges, survivors, "vec_id", "embedding",
      idx.centroids, blocks = 2, m = 3, purged)
    val before = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = rep.adjacency.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!adj.exists { case (a, b) => pSet(a) || pSet(b) },
      "no purged id survives — not as a row, not inside a neighbor list")
    val touched = before.collect { case (a, b) if pSet(b) && !pSet(a) => a }
    assert(touched.nonEmpty, "the fixture must exercise neighbor-list splicing")
    // untouched neighborhoods pass through bit-identically
    val untouchedBefore = before.filter { case (a, _) =>
      !touched(a) && !pSet(a) }
    assert(untouchedBefore.subsetOf(adj.toSet),
      "untouched nodes' edges are never recomputed")
    // touched nodes re-link (never vanish) and stay degree-bounded
    val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
    assert(touched.forall(t => deg.getOrElse(t, 0) > 0),
      "every touched survivor re-links from block-mates")
    assert(deg.values.forall(_ <= 3), "out-degree stays bounded by m")
    // the storage-commit key set = touched ∪ purged
    assert(rep.touched.collect().map(_.getLong(0)).toSet == touched ++ pSet,
      "DV keys must cover both replaced and erased rows")
    // deterministic: a second repair is bit-identical
    val again = Nsw.purgeRepair(edges, survivors, "vec_id", "embedding",
      idx.centroids, blocks = 2, m = 3, purged)
      .adjacency.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(adj.sorted.toSeq == again.sorted.toSeq)
  }

  test("the walk scores only touched candidates, never the corpus") {
    val v = corpus(200)
    val idx = centroidsOf(v)
    val m = 3; val beam = 4; val rounds = 2
    val edges = Nsw.build(v, "vec_id", "embedding", idx.centroids,
      blocks = 2, m = m, rounds = 1)
    val q = v.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val touched = Nsw.searchCandidateCount(edges, v, "vec_id", "embedding",
      Nsw.entries(idx.assigned, "vec_id"), q, beam, rounds)
    // entries + per round at most beam·(m+1) new candidates
    val bound = 4 + rounds * beam * (m + 1)
    assert(touched <= bound, s"walk touched $touched > bound $bound")
    assert(touched < 200, "a walk must never degenerate into a corpus scan")
  }

  test("v32 pricing identity: dot against a PQ-reconstructed vector IS the ADC LUT sum") {
    val v = corpus(64)
    val pq = graft.ops.Pq.buildExact(v, "vec_id", "embedding",
      dim = 4, m = 2, k = 4, assignPasses = 2)
    val q = v.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // LUT pricing over every (query, candidate) pair
    val cands = q.select(col("qid"))
      .crossJoin(v.select(col("vec_id")))
    val lut = graft.ops.Pq.searchAmong(pq, q, cands, topK = 64)
      .select(col("qid"), col("nb_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // decoded pricing: dot(q, reconstruct(code))
    graft.ops.VectorOps.ensureRegistered(spark)
    val recon = graft.ops.Pq.reconstruct(pq)
    val dec = q.crossJoin(recon.withColumnRenamed("vec_id", "nb_id"))
      .filter(col("nb_id") =!= col("qid"))
      .withColumn("s", graft.ops.VectorOps.dot(
        col("qvec").cast("array<double>"), col("vec_hat")))
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nb_id")) ->
        r.getAs[Double]("s")).toMap
    assert(lut.keySet == dec.keySet)
    assert(lut.forall { case (k, s) => math.abs(dec(k) - s) < 1e-9 },
      "decoded-vector dot must equal the asymmetric-distance LUT sum")
  }
}
