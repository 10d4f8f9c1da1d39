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

  /** Training-shard delivery writer — the LAST step of a data
    * pipeline: emit the corpus as `numShards` range-partitioned,
    * internally sorted parquet shards plus a `_manifest.json`
    * consumers read instead of listing the directory. Range
    * partitioning on the sort key gives (a) globally ordered shards
    * (shard i's keys all precede shard i+1's — a reader can binary-
    * search the manifest), (b) deterministic shard MEMBERSHIP for a
    * fixed key distribution, and (c) balanced shard sizes via
    * Spark's range-exchange sampling. `maxRecordsPerFile` bounds any
    * single file for downstream loaders that stream whole files.
    * Returns the number of data files written.
    */
  def writeShards(df: DataFrame, outDir: String, sortCol: String,
                  numShards: Int, maxRecordsPerFile: Long = 0L): Int = {
    require(numShards >= 1, "writeShards: numShards must be >= 1")
    val spark = df.sparkSession
    val w = df.repartitionByRange(numShards, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(outDir)
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val rows = spark.read.parquet(outDir).count()
    val manifest = files.map(f =>
      s"""{"file":${graft.util.Jsons.quote(f.getPath.getName)},"bytes":${f.getLen}}""")
      .mkString(
        s"""{"sort_col":${graft.util.Jsons.quote(sortCol)},"n_shards":$numShards,""" +
          s""""n_rows":$rows,"files":[""", ",", "]}\n")
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_manifest.json"), true)
    try out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    files.length
  }

  /** Small-files compaction — the table-maintenance operator every
    * long-running ingest needs: streaming/micro-batch sinks and
    * per-stage checkpoints accumulate thousands of KB-sized files,
    * and at 100 TB the resulting task-per-file scheduling + NameNode
    * pressure dominate scan cost. Rewrites `inDir` to `outDir` as
    * ⌈totalBytes / targetBytes⌉ files via `coalesce` (no shuffle —
    * partition merge only; use `repartition` instead when output
    * skew matters more than the shuffle). Returns the output file
    * count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    fs.listStatus(out).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
