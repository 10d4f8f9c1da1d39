package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Round-18 profiling scratch main (not part of the driver contract):
  * times selected queries with a listener that counts jobs/stages and
  * sums executor task time, so wall-vs-task gaps (driver/plan/job
  * overhead) are visible per query. Run:
  *   SPARK_GRAFT_ONLY=v38_hnsw_descent sbt "runMain graft.Profile18"
  */
object Profile18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B hook: SPARK_GRAFT_CONF="k=v;k=v" applies extra session conf
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    val byStage = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val ms = s.stageInfo.taskMetrics.executorRunTime
        taskMs += ms
        // attribute AQE's CompletableFuture stages to the first graft
        // frame in the stage's call-site stack
        val key = s.stageInfo.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("Profile18"))
          .getOrElse(s.stageInfo.name).trim.take(80)
        byStage.merge(key, (ms, s.stageInfo.numTasks.toLong, 1L),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    })
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // absorb session bring-up
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.mode("overwrite").format("noop").save())

    if (sys.env.get("SPARK_GRAFT_PHASES").contains("v38")) {
      import org.apache.spark.sql.functions._
      import graft.queries.VectorQ._
      def phase[T](label: String)(body: => T): T = {
        val (j0, s0, t0) = (jobs, stages, taskMs)
        val w0 = System.nanoTime()
        val r = body
        Thread.sleep(150)
        println(f"PHASE $label wall=${(System.nanoTime() - w0) / 1e9}%.2fs jobs=${jobs - j0} stages=${stages - s0} taskSec=${(taskMs - t0) / 1e3}%.1f")
        r
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.mode("overwrite").format("noop").save()
      val e = graft.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val b = phase("ivf_train") {
        graft.ops.Ivf.buildExact(e, "vec_id", "embedding",
          k = IvfClusters, assignPasses = IvfIters)
      }
      phase("centroids_mat") { noop(b.centroids) }
      val l0 = phase("layer0_build") {
        val df = graft.ops.Nsw.build(e, "vec_id", "embedding", b.centroids,
          NswBlocks, NswM, NswRounds)
        noop(df); df
      }
      val l1 = phase("layer1_build") {
        val df = graft.ops.Nsw.build(
          e.filter(graft.ops.Nsw.levelOf(col("vec_id"), NswMaxLevel) >= 1),
          "vec_id", "embedding", b.centroids, NswBlocks, NswM, NswUpperRounds)
        noop(df); df
      }
      val l2 = phase("layer2_build") {
        val df = graft.ops.Nsw.build(
          e.filter(graft.ops.Nsw.levelOf(col("vec_id"), NswMaxLevel) >= 2),
          "vec_id", "embedding", b.centroids, NswBlocks, NswM, NswUpperRounds)
        noop(df); df
      }
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      phase("descent") {
        noop(graft.ops.Nsw.searchLayered(Seq(l0, l1, l2), e, "vec_id",
          "embedding", q, NswUpperBeam, NswUpperWalk, NswBeam, NswWalk, topK = 3))
      }
      phase("descent_again") {
        noop(graft.ops.Nsw.searchLayered(Seq(l0, l1, l2), e, "vec_id",
          "embedding", q, NswUpperBeam, NswUpperWalk, NswBeam, NswWalk, topK = 3))
      }
      phase("level_counts") {
        (1 to NswMaxLevel).foreach(l => e.filter(
          graft.ops.Nsw.levelOf(col("vec_id"), NswMaxLevel) >= l).count())
      }
      spark.stop()
      return
    }
    for ((name, fn) <- sel; pass <- 1 to 2) {
      val (j0, s0, t0) = (jobs, stages, taskMs)
      val w0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(200) // let stage-completed events drain
      println(f"PROF $name pass$pass wall=$wall%.2fs jobs=${jobs - j0} stages=${stages - s0} taskSec=${(taskMs - t0) / 1e3}%.1f")
      import scala.jdk.CollectionConverters._
      for ((k, (ms, nt, ns)) <- byStage.asScala.toSeq.sortBy(-_._2._1).take(12))
        println(f"  STAGE ${ms / 1e3}%7.1fs tasks=$nt%5d stages=$ns%4d  $k")
      byStage.clear()
    }
    spark.stop()
  }
}
