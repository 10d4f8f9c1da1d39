package graft

import org.apache.spark.sql.functions._
import graft.ops.Chunker

/** Window math from the reference chunker (data/ingestion.py:173-212):
  * stride = size - overlap, loop stops after the window whose end
  * reaches the text end, last partial window kept, abstract sections
  * always one chunk, short sections skipped, short chunks dropped.
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  private def run(text: String, section: String = "body",
                  size: Int = 200, overlap: Int = 30, min: Int = 30) = {
    val df = Seq(("p1", section, text)).toDF("paper_id", "section_name", "text")
    Chunker.chunk(df, "paper_id", "section_name", "text", size, overlap, min)
      .select("chunk_id", "chunk_ord", "word_count", "text_content")
      .orderBy("chunk_ord").collect()
  }

  test("400 words -> windows at 0, 170, 340; last partial kept") {
    val rows = run(words(400))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(rows.map(_.getInt(2)).toSeq == Seq(200, 200, 60))
    assert(rows.head.getString(3).startsWith("w1 w2 "))
    assert(rows(2).getString(3).startsWith("w341 "))
  }

  test("370 words -> loop breaks once a window reaches the end (no w at 340)") {
    // reference: window [170,370) ends exactly at len -> stop
    val rows = run(words(370))
    assert(rows.map(_.getInt(2)).toSeq == Seq(200, 200))
  }

  test("371 words -> window at 340 exists (31 words)") {
    val rows = run(words(371))
    assert(rows.map(_.getInt(2)).toSeq == Seq(200, 200, 31))
  }

  test("exactly size words -> single chunk") {
    assert(run(words(200)).map(_.getInt(2)).toSeq == Seq(200))
  }

  test("section below min words is skipped entirely") {
    assert(run(words(29)).isEmpty)
  }

  test("abstract is always one chunk, even when longer than size") {
    val rows = run(words(500), section = "abstract")
    assert(rows.length == 1 && rows.head.getInt(2) == 500)
    assert(rows.head.getString(0) == "p1_abstract_c000")
  }

  test("chunk ids are {paper}_{slug}_c{i:03d}") {
    val rows = run(words(400))
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("p1_body_c000", "p1_body_c001", "p1_body_c002"))
  }

  test("chunks shorter than min are dropped when min > overlap") {
    // size=10, overlap=2, min=5: n=19 -> starts 0,8,16; last window has
    // 3 words < 5 -> dropped after id assignment (ids stay c000,c001).
    val rows = run(words(19), size = 10, overlap = 2, min = 5)
    assert(rows.map(_.getInt(2)).toSeq == Seq(10, 10))
    assert(rows.map(_.getString(0)).toSeq == Seq("p1_body_c000", "p1_body_c001"))
  }

  test("every chunk word_count within [min, size] and coverage is complete") {
    for (n <- Seq(30, 100, 199, 200, 201, 369, 370, 371, 540, 1000)) {
      val rows = run(words(n))
      assert(rows.forall(r => r.getInt(2) >= 30 && r.getInt(2) <= 200), s"n=$n")
      // stride-aligned reconstruction: concatenating the first
      // stride words of each chunk plus the tail of the last covers 1..n
      val all = rows.flatMap(_.getString(3).split(" ")).distinct
      assert(all.length == n, s"n=$n: coverage ${all.length}")
    }
  }
}
