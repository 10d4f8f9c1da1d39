package graft

import org.apache.spark.sql.functions._
import graft.ops.Entities

class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  private def occ(text: String) = {
    val df = Seq(("c1", text)).toDF("chunk_id", "text")
    Entities.occurrences(df, Seq("chunk_id"), "text")
      .select("ord", "name", "name_normalized", "node_id")
      .orderBy("ord").collect()
  }

  test("tokenizes with 1-based ord, strips edge punctuation") {
    val rows = occ("Spark, (query) engine")
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "Spark"), (2, "query"), (3, "engine")))
  }

  test("min length 3 filter (reference KG_MIN_NAME_LENGTH)") {
    assert(occ("an ox big").map(_.getString(1)).toSeq == Seq("big"))
  }

  test("stopwords and pure-digit tokens are excluded") {
    assert(occ("the data 12345 was here").map(_.getString(1)).toSeq ==
      Seq("data", "here"))
  }

  test("normalization + node ids match the reference formula") {
    val rows = occ("Spark-SQL")
    assert(rows.head.getString(1) == "Spark-SQL")
    assert(rows.head.getString(2) == "sparksql")
    assert(rows.head.getString(3) == "node_sparksql")
  }

  test("duplicate mentions stay as separate occurrence rows (G3)") {
    assert(occ("data data data").length == 3)
  }
}
