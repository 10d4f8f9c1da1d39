package graft
// Dev-only profiling harness (deleted before round end).
import org.apache.spark.sql.{DataFrame, SparkSession}

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (q <- args)
      time(q)(SparkEntry.queries(q)(spark, sfDir))
    spark.stop()
  }
}
