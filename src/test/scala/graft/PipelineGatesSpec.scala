package graft

import org.apache.spark.sql.functions._

/** Semantic anchors for the round-4 additions t19 (DSIR importance
  * weights), t20 (Gopher quality rules), and x17 (SCD-2 history):
  * each query's oracle pins the arithmetic; these tests pin the
  * CONTRACTS — the identities and invariants that must hold for any
  * corpus, not just the fixture values.
  */
class PipelineGatesSpec extends SparkSpec {

  private def tmpDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("gates").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t19: target ≡ raw (all-English corpus) zeroes every weight") {
    // when the target slice IS the corpus, tgt_c == raw_c per bucket
    // and the log-ratio is exactly 0 before rounding — so every doc
    // must score logw_micro == 0, keep == 1
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Tables.load(spark, Sf0001, "documents")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t19_dsir_weights")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("logw_micro") == 0L),
      "uniform target must give zero log-weight everywhere")
    assert(out.forall(_.getAs[Int]("keep") == 1))
  }

  test("t19: feature count is 2n−1 per document (unigrams + bigrams)") {
    val out = SparkEntry.queries("t19_dsir_weights")(spark, Sf0001)
      .select("doc_id", "n_feats")
    val expected = Tables.load(spark, Sf0001, "documents")
      .filter(graft.ops.TextFns.wordCount(col("text")) > 0)
      .select(col("doc_id"),
        (graft.ops.TextFns.wordCount(col("text")).cast("long") * 2 - 1)
          .as("n_expected"))
    val bad = out.join(expected, "doc_id")
      .filter(col("n_feats") =!= col("n_expected")).count()
    assert(bad == 0, "every doc must contribute n unigrams + (n−1) bigrams")
  }

  test("t20: each Gopher rule independently gates its crafted violator") {
    val good = "The quick brown fox and the lazy dog have agreed to " +
      "share all of that fine food with everyone present today"
    val dir = tmpDocs(Seq(
      (1L, good, "en", "web"),                               // passes all
      (2L, "too short text", "en", "web"),                   // n_words < 5
      (3L, good + " ### ### ### ### ### ### ### ### ### ### ### ###",
        "en", "web"),                                        // symbol ratio
      (4L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk", "en", "web"),
      //                                            ^ no stopwords
      (5L, "12 34 56 78 90 11 22 33 44 55 66 77 88 99 00 10", "en", "web")))
    //                                            ^ non-alphabetic words
    val out = SparkEntry.queries("t20_gopher_rules")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(out(1L) == 1, "the well-formed doc must pass")
    assert(out(2L) == 0, "word-count floor must reject")
    assert(out(3L) == 0, "symbol-to-word ratio must reject")
    assert(out(4L) == 0, "stopword floor must reject")
    assert(out(5L) == 0, "alphabetic-word floor must reject")
  }

  test("x17: versions are contiguous, intervals chain, one current row per key") {
    val hist = SparkEntry.queries("x17_scd2_history")(spark, Sf0001).cache()
    try {
      val perKey = hist.groupBy("c_custkey").agg(
        count(lit(1)).as("n"), max(col("version")).as("maxv"),
        min(col("version")).as("minv"),
        sum(col("is_current")).as("n_current"))
      assert(perKey.filter(col("minv") =!= 1 || col("maxv") =!= col("n"))
        .count() == 0, "version numbers must be 1..n per key")
      assert(perKey.filter(col("n_current") =!= 1).count() == 0,
        "exactly one open interval per key")
      // interval chaining: valid_to of version v == valid_from of v+1
      val chain = hist.as("a").join(hist.as("b"),
        col("a.c_custkey") === col("b.c_custkey") &&
          col("a.version") + 1 === col("b.version"))
        .filter(col("a.valid_to") =!= col("b.valid_from") ||
          col("a.valid_to").isNull)
      assert(chain.count() == 0, "history intervals must tile the timeline")
      // version 1 is always the snapshot seed
      val nCust = Tables.load(spark, Sf0001, "customer").count()
      val seeds = hist.filter(col("version") === 1)
      assert(seeds.count() == nCust, "every customer gets a seed row")
      assert(seeds.filter(col("valid_from") =!=
        lit("1996-12-31").cast("timestamp")).count() == 0)
    } finally hist.unpersist(): Unit
  }

  test("t27: gated sampling never serves a reject, strata stay within budget, " +
    "and an under-filled stratum is NOT padded with rejects") {
    val good = "The quick brown fox and the lazy dog have agreed to " +
      "share all of that fine food with everyone present today"
    // lang 'xx' has ONE eligible doc among rejects: the sample must
    // return exactly that one row, never pad to the budget
    val dir = tmpDocs(
      (1L to 30L).map(i => (i, good + s" extra$i", "en", "web")) ++ Seq(
        (100L, good, "xx", "web"),
        (101L, "too short", "xx", "web"),
        (102L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk", "xx", "web")))
    val out = SparkEntry.queries("t27_gated_sample")(spark, dir).collect()
    val eligible = graft.queries.TextQ.gopherBattery(
      Tables.load(spark, dir, "documents"))
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(r => eligible(r.getAs[Long]("doc_id"))),
      "every sampled doc must pass the gate")
    val byLang = out.groupBy(_.getString(0)).map { case (l, rs) => l -> rs.length }
    assert(byLang.values.forall(_ <= graft.queries.TextQ.StratN))
    assert(byLang("xx") == 1, "an under-filled stratum serves its survivors only")
    assert(out.filter(_.getString(0) == "xx").head.getAs[Long]("doc_id") == 100L)
    assert(byLang("en") == math.min(30, graft.queries.TextQ.StratN))
  }
}
