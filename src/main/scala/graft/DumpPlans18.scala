package graft

import org.apache.spark.sql.functions._

/** Round-18 plan-evidence dumper: writes `.explain("formatted")` for
  * every query/operator the optimization round touched to
  * plans/r18/<name>_<suffix>.txt. Run in the pre-round tree with
  * suffix `before` and in the optimized tree with suffix `after`:
  *   sbt "runMain graft.DumpPlans18 after"
  * Declared queries are explained at sf0.001 (Explain's convention).
  * Two internal frames are dumped as well, because their operators
  * run eagerly inside the declared queries and the final plans cannot
  * show them: the x120 pollPage page plan (the claim: no
  * unpartitioned Window, pages served as range reads of a
  * once-numbered sidecar) and the Nsw block-pair stage (the claim:
  * pair dedup and top-m share one exchange).
  */
object DumpPlans18 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val outDir = args.lift(1).getOrElse("plans/r18")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), p)
      println(s"dumped $name")
    }
    // declared queries this round touched (walk family + parity hosts)
    for (q <- Seq("v30_graph_ann", "v38_hnsw_descent", "v39_hnsw_persisted",
        "v31_graph_index_lifecycle", "v36_index_rtbf",
        "x115_posdelete_compaction", "x120_cdf_row_throttle",
        "x103_change_stream", "x118_positional_cdc"))
      try dump(q, SparkEntry.queries(q)(spark, d))
      catch { case e: Throwable => println(s"$q FAILED: $e") }

    // x120 internal: the plan a served PAGE executes
    {
      import spark.implicits._
      import graft.sources.Snapshots
      val base = java.nio.file.Files.createTempDirectory("plandump").toString
      val (dir, cursorDir) = (s"$base/t", s"$base/cursor")
      Snapshots.commit((1L to 10L).map(i => (i, "a")).toDF("id", "v"), dir)
      val sub = Snapshots.readChangeStream(spark, dir, Seq("id"), cursorDir)
      val (_, _, page) = sub.pollPage(4).get
      dump("x120_pollpage_page", page)
    }

    // Nsw internal: the block-pair candidate stage (pair dedup feeding
    // the per-node top-m re-keep) — replicated verbatim from
    // ops/Nsw.scala's build() so the dump shows what that code plans
    {
      graft.ops.VectorOps.ensureRegistered(spark)
      val e = Tables.load(spark, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = e.limit(8).select(col("vec_id").as("cluster_id"),
        col("embedding").cast("array<double>").as("cvec"))
      val asg = graft.ops.Nsw.blockAssign(e, "vec_id", "embedding", cents, 2)
      val v = e.select(col("vec_id").as("_nid"),
        col("embedding").cast("array<double>").as("_nvec"))
      val rawPairs = asg.select(col("vec_id").as("a"), col("cluster_id"))
        .join(asg.select(col("vec_id").as("b"), col("cluster_id")), "cluster_id")
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b"))
      // keep this block in sync with Nsw.build's pair pipeline
      val pairs =
        if (suffix == "before") rawPairs.distinct()
        else rawPairs.repartition(col("a")).dropDuplicates(Seq("a", "b"))
      val scored = pairs
        .join(v.select(col("_nid").as("a"), col("_nvec").as("_va")), "a")
        .join(v.select(col("_nid").as("b"), col("_nvec").as("_vb")), "b")
        .withColumn("score", graft.ops.VectorOps.dot(col("_va"), col("_vb")))
        .select(col("a"), col("b"), col("score"))
      dump("nsw_build_pair_stage",
        graft.plans.TopK.perKey(scored, Seq("a"),
          Seq(col("score").desc, col("b")), 4))
    }
    spark.stop()
  }
}
