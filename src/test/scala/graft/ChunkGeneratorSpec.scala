package graft

import org.apache.spark.sql.functions._
import graft.functions.ChunkGenerator
import graft.ops.Chunker

/** The Generator (v2) and explode-composition (v1) chunkers must be
  * row-for-row equivalent on arbitrary inputs.
  */
class ChunkGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("generator output equals explode-based Chunker on varied lengths") {
    ChunkGenerator.register(spark)
    val ns = Seq(1, 29, 30, 199, 200, 201, 370, 371, 545, 1000)
    val df = ns.map(n => (s"p$n", words(n))).toDF("paper_id", "text")
    df.createOrReplaceTempView("gen_docs")

    val viaGen = spark.sql(
      """SELECT paper_id, chunk_ord, start, word_count, text_content
        |FROM gen_docs
        |LATERAL VIEW chunk_windows(text, 200, 30, 30) t
        |  AS chunk_ord, start, word_count, text_content
        |""".stripMargin)
      .orderBy("paper_id", "chunk_ord")
      .collect()

    val viaExplode = Chunker.chunk(
        df.withColumn("section_name", lit("body")),
        "paper_id", "section_name", "text", 200, 30, 30)
      .select(col("paper_id"), col("chunk_ord"), col("word_count"), col("text_content"))
      .orderBy("paper_id", "chunk_ord")
      .collect()

    assert(viaGen.length == viaExplode.length)
    viaGen.zip(viaExplode).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getInt(1) == e.getInt(1))             // chunk_ord
      assert(g.getInt(3) == e.getInt(2))             // word_count
      assert(g.getString(4) == e.getString(3))       // text_content
    }
  }

  test("generator handles null/empty/short text") {
    ChunkGenerator.register(spark)
    Seq(("a", null: String), ("b", ""), ("c", "too short"))
      .toDF("id", "text").createOrReplaceTempView("gen_edge")
    val out = spark.sql(
      "SELECT id FROM gen_edge LATERAL VIEW chunk_windows(text, 200, 30, 30) t " +
        "AS chunk_ord, start, word_count, text_content")
    assert(out.count() == 0)
  }
}
