package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and loads
  * exactly the tables it needs — projections/filters are left to the
  * query so Catalyst pushes them into the parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
    // default; read nanos as long and truncate to micros (identical to
    // DuckDB's nanos→micros truncation, so oracle timestamps agree).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // Fixture files carry TIMESTAMP(NANOS) (read as long under the
      // flag); derived copies (e.g. ScaleSmoke's scaled corpus) are
      // re-written as plain micros timestamps — convert only the
      // former so both load identically.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Newer fixtures store TIMESTAMP(MICROS, isAdjustedToUTC=false),
          // which Spark 4 reads as TIMESTAMP_NTZ. The session tz is pinned
          // UTC, so the NTZ→LTZ cast is a pure re-tagging that matches the
          // DuckDB oracle's naive timestamps value-for-value.
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
