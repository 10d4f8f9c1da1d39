package graft

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  test("semi-synchronous LPA assigns each biclique one community") {
    // biclique A: customers 1,2 x suppliers 11,12; biclique B: 3 x 13
    val dir = java.nio.file.Files.createTempDirectory("lpa").toString
    Seq((101L, 1L), (102L, 2L), (103L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((101L, 11L), (101L, 12L), (102L, 11L), (102L, 12L), (103L, 13L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("k14_label_prop")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 3L, 2L),
      (1000011L, 1L, 4L), (1000012L, 1L, 4L), (1000013L, 3L, 2L)))
  }

  test("LPA labels stay stable once converged (idempotent rounds)") {
    // a single biclique converges after round 1; rounds 2-4 must not
    // move labels — guards against reintroducing the synchronous
    // bipartite oscillation
    val dir = java.nio.file.Files.createTempDirectory("lpa2").toString
    Seq((101L, 5L), (102L, 6L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((101L, 21L), (102L, 21L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("k14_label_prop")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((5L, 5L, 3L), (6L, 5L, 3L), (1000021L, 5L, 3L)))
  }

  test("ANN recall report: hits bounded by both sides, recall in [0,1]") {
    val rows = SparkEntry.queries("v17_recall_eval")(spark, Sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    rows.foreach { case (_, nBf, nAnn, nHits, recall) =>
      assert(nBf == 3L)
      assert(nHits <= math.min(nBf, nAnn))
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall == math.rint(nHits.toDouble / nBf * 10000) / 10000 ||
        math.abs(recall - nHits.toDouble / nBf) < 1e-9)
    }
  }
}
