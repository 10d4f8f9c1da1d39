package graft

import org.apache.spark.sql.functions._
import graft.ops.KMeans

/** Deterministic Lloyd's k-means: assignment optimality, inertia
  * monotonicity, and run-to-run reproducibility on the fixture
  * embeddings.
  */
class KMeansSpec extends SparkSpec {

  private lazy val vecs = Tables.load(spark, Sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("every vector assigned to exactly one existing centroid") {
    val (cents, assign) = KMeans.fit(vecs, "vec_id", "embedding", k = 4, maxIters = 3)
    assert(cents.count() == 4)
    assert(assign.count() == vecs.count())
    assert(assign.select("vec_id").distinct().count() == vecs.count())
    val known = cents.select("cluster_id").collect().map(_.getInt(0)).toSet
    assert(assign.select("cluster_id").distinct().collect()
      .map(_.getInt(0)).forall(known.contains))
  }

  test("more iterations never increase inertia (Lloyd's descent)") {
    val i1 = KMeans.inertia(KMeans.fit(vecs, "vec_id", "embedding", 4, 1)._2)
    val i5 = KMeans.inertia(KMeans.fit(vecs, "vec_id", "embedding", 4, 5)._2)
    assert(i5 <= i1 * (1 + 1e-9), s"inertia rose: $i1 -> $i5")
  }

  test("fit is deterministic across runs") {
    val a = KMeans.fit(vecs, "vec_id", "embedding", 4, 3)._1
      .orderBy("cluster_id").collect()
    val b = KMeans.fit(vecs, "vec_id", "embedding", 4, 3)._1
      .orderBy("cluster_id").collect()
    assert(a.sameElements(b))
  }

  test("fitExact with one pass assigns every vector to its nearest seed (independent math)") {
    val emb = Tables.load(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val out = KMeans.fitExact(emb, "vec_id", "embedding", k = 4, assignPasses = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // plain-Scala brute force over the same seeding rule, same
    // |v|² + |c|² − 2·v·c formula and left-to-right folds
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    val seeds = rows.take(4).map(_._2)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    rows.foreach { case (id, v) =>
      val vv = dot(v, v)
      val best = seeds.indices.minBy(c =>
        (vv + dot(seeds(c), seeds(c)) - 2.0 * dot(v, seeds(c)), c))
      assert(out(id) == best, s"vec $id: got ${out(id)}, brute force says $best")
    }
  }

  test("assignment is the argmin centroid for each point") {
    val (cents, assign) = KMeans.fit(vecs, "vec_id", "embedding", 3, 2)
    val c = cents.withColumnRenamed("cluster_id", "cid2")
    val best = vecs.crossJoin(broadcast(c))
      .withColumn("d", graft.ops.VectorOps.dot(
        col("embedding").cast("array<double>"), col("embedding").cast("array<double>")) +
        graft.ops.VectorOps.dot(col("cvec"), col("cvec")) -
        lit(2.0) * graft.ops.VectorOps.dot(col("embedding").cast("array<double>"), col("cvec")))
      .groupBy(col("vec_id")).agg(min(col("d")).as("best_d"))
    val bad = assign.join(best, "vec_id")
      .filter(col("sq_dist") > col("best_d") + 1e-6)
    assert(bad.count() == 0)
  }
}
