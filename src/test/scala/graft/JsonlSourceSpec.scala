package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DataSourceV2 provenance JSONL connector: correctness of rows +
  * provenance columns, file-filter pushdown (planning-time file
  * pruning), column pruning, and P6 malformed-line semantics.
  */
class JsonlSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("score", DoubleType)))

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"doc_id":1,"text":"alpha","score":0.5}
        |{"doc_id":2,"text":"beta","score":1.5}
        |not json at all
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.jsonl"),
      """{"doc_id":3,"text":"gamma","score":2.5}
        |""".stripMargin)
    dir
  }

  private def read(dir: String) =
    spark.read.format("graft.sources.JsonlSource").schema(schema).load(dir)

  test("rows + provenance columns, malformed line follows P6 (nulls, provenance kept)") {
    val df = read(fixture()).orderBy("_file", "_line")
    val rows = df.collect()
    assert(rows.length == 4)
    assert(df.columns.toSeq == Seq("doc_id", "text", "score", "_file", "_line"))
    val bad = rows(2) // a.jsonl line 3
    assert(bad.getAs[String]("_file") == "a.jsonl" && bad.getAs[Long]("_line") == 3L)
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
    assert(rows(3).getAs[Long]("doc_id") == 3L && rows(3).getAs[String]("_file") == "b.jsonl")
  }

  test("_file filter prunes whole files at planning time (pushdown visible)") {
    val df = read(fixture()).filter(col("_file") === "b.jsonl")
    // one partition per surviving file: the filtered scan must not
    // even plan a partition for a.jsonl
    assert(df.rdd.getNumPartitions == 1)
    assert(df.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(3L))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters"), s"expected pushed file filter:\n$plan")
  }

  test("conjunctive _file filters intersect and stay residual (contradiction => empty)") {
    val dir = fixture()
    // contradictory ANDed equalities can match nothing — union-style
    // pruning plus consumed filters would wrongly return both files
    val none = read(dir)
      .filter(col("_file") === "a.jsonl").filter(col("_file") === "b.jsonl")
    assert(none.count() == 0)
    // a full-path value never matches the base-name column: the scan
    // may prune conservatively but the residual filter must zero it
    val fullPath = read(dir)
      .filter(col("_file") === s"file:$dir/a.jsonl")
    assert(fullPath.count() == 0)
  }

  test("provenance-only projection parses nothing but still counts lines") {
    val df = read(fixture()).select("_file", "_line")
    assert(df.count() == 4)
    // pruned read schema must not mention user columns
    val scanSchema = df.queryExecution.executedPlan.collectLeaves().head.schema
    assert(scanSchema.fieldNames.toSet == Set("_file", "_line"))
  }

  test("missing schema is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.JsonlSource").load(fixture()).collect()
    }
    assert(e.getMessage.contains("schema"))
  }
}
