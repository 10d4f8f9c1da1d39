package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ivf, VectorOps}

/** The self-contained IVF index: probing every bucket must equal the
  * brute-force scan exactly; narrow probes trade recall for candidate
  * reduction but keep high recall on clustered fixture data.
  */
class IvfSpec extends SparkSpec {

  private lazy val vecs = Tables.load(spark, Sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private lazy val queries = Tables.load(spark, Sf0001, "embeddings")
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val index = Ivf.build(vecs, "vec_id", "embedding", k = 4, iters = 3)

  private def bruteForce(topK: Int) = {
    VectorOps.ensureRegistered(spark)
    val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("score", VectorOps.dot(
        col("qvec").cast("array<double>"), col("embedding").cast("array<double>")))
    graft.plans.TopK.perKey(scored, Seq("qid"),
        Seq(col("score").desc, col("vec_id")), topK)
      .select(col("qid"), col("vec_id").as("nb_id"), col("score"))
  }

  test("nprobe = k probes every bucket and equals brute force exactly") {
    val exact = Ivf.probe(index, queries, nprobe = 4, topK = 3)
      .select("qid", "nb_id").orderBy("qid", "nb_id").collect()
    val brute = bruteForce(3)
      .select("qid", "nb_id").orderBy("qid", "nb_id").collect()
    assert(exact.nonEmpty && exact.sameElements(brute))
  }

  test("narrow probe keeps most neighbors (recall) with fewer candidates") {
    val approx = Ivf.probe(index, queries, nprobe = 2, topK = 3)
      .select("qid", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = bruteForce(3)
      .select("qid", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
    // every query still answered
    assert(approx.map(_._1) == brute.map(_._1))
  }

  test("probe monotonicity: narrow-probe scores never beat the exact probe rank-wise") {
    // a narrower probe only SHRINKS the candidate set, so at every
    // rank its score is <= the exact (nprobe = k) score — the
    // approximation contract v8_knn_ivf_probe2 relies on
    def byRank(nprobe: Int) = Ivf.probe(index, queries, nprobe, topK = 3)
      .select("qid", "nb_rank", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = byRank(4)
    val narrow = byRank(2)
    assert(narrow.nonEmpty)
    narrow.foreach { case (key, s) =>
      assert(s <= exact(key) + 1e-12, s"$key: narrow $s > exact ${exact(key)}")
    }
  }

  test("ranks are dense from 1 and scores non-increasing per query") {
    val out = Ivf.probe(index, queries, nprobe = 2, topK = 3)
      .orderBy("qid", "nb_rank").collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("nb_rank")).toSeq == (1 to rows.length))
      val scores = rows.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("append equals a full rebuild at fixed centroids (probe parity)") {
    // the v20 contract: admitting a batch with frozen centroids must
    // give exactly the probe results of bucketing the whole corpus at
    // those centroids — both nprobe=2 and the exhaustive nprobe=k
    val hist = vecs.filter(col("vec_id") % 10 < 8)
    val batch = vecs.filter(col("vec_id") % 10 >= 8)
    val idx = Ivf.buildExact(hist, "vec_id", "embedding", k = 4, assignPasses = 3)
    val appended = Ivf.append(idx, batch, "embedding")
    // "rebuild": assign EVERYTHING at the same frozen centroids
    val rebuilt = Ivf.append(
      Ivf.Index(idx.centroids, appended.assigned.limit(0), "vec_id"),
      vecs, "embedding")
    for (np <- Seq(2, 4)) {
      def res(ix: Ivf.Index) = Ivf.probe(ix, queries, nprobe = np, topK = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("nb_rank")))
        .toSet
      assert(res(appended) == res(rebuilt), s"append/rebuild diverge at nprobe=$np")
    }
    // and the appended index actually contains every vector once
    assert(appended.assigned.count() == vecs.count())
    assert(appended.assigned.select("vec_id").distinct().count() == vecs.count())
  }

  test("shareDrift: an unbiased batch stays under the line, a biased one flips rebuild") {
    import spark.implicits._
    // stored corpus 50/50 across two clusters; batch with the same mix
    val unbiased = (0L until 40L).map(i => (i, (i % 2).toInt, i >= 32))
      .toDF("vec_id", "cluster_id", "is_batch")
    val ok = Ivf.shareDrift(unbiased, !col("is_batch"), threshold256 = 32)
    assert(!ok.select("rebuild").head().getBoolean(0))
    assert(ok.select(max(col("drift_256"))).head().getInt(0) == 0)
    // distribution shift: the whole batch crowds into cluster 0
    val biased = ((0L until 32L).map(i => (i, (i % 2).toInt, false)) ++
        (32L until 40L).map(i => (i, 0, true)))
      .toDF("vec_id", "cluster_id", "is_batch")
    val r = Ivf.shareDrift(biased, !col("is_batch"), threshold256 = 32)
      .orderBy("cluster_id").collect()
    // cluster 0: hist 128/256 vs batch 256/256; cluster 1: 128 vs 0
    assert(r.map(_.getInt(5)).toSeq == Seq(128, 128))
    assert(r.forall(_.getBoolean(6)), "a 50-point share shift must demand a rebuild")
  }
}
