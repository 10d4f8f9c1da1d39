package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the fixture parquet (SURVEY.md §2.1):
  * schema-enforced readers and append/overwrite writers for the
  * formats the reference touches — parquet (stage checkpoints,
  * data/config.py:13-17), JSON (the append-only history log,
  * backend/app.py:42-71), CSV (generic tabular interchange).
  *
  * Readers take an explicit schema — at 100 TB, schema inference is
  * a full extra pass over the data; explicit schemas also pin
  * nullability so downstream plans don't change shape between runs.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE") // malformed rows → nulls (P6 semantics)
      .csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  def writeParquet(df: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** S7 — append-only JSON-lines log (one file set per append). */
  def appendJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).json(path)

  /** Write a table bucketed+sorted on a join key. Joining two tables
    * bucketed the same way needs NO shuffle on either side — the
    * pre-partitioning pattern for repeated big-big joins (e.g.
    * chunks⋈papers at every query). Requires a catalog table
    * (`saveAsTable`), not a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
