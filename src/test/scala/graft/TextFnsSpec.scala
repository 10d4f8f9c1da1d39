package graft

import org.apache.spark.sql.functions._
import graft.ops.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(c.cast("string")).head.getString(0)

  test("cleanText strips display math, inline math, latex commands, urls") {
    val in = "intro $$x^2 + y$$ mid $a+b$ \\cite{foo} \\alpha see http://x.co/page end"
    assert(one(TextFns.cleanText(col("x")), in) == "intro mid see end")
  }

  test("cleanText collapses whitespace and trims") {
    assert(one(TextFns.cleanText(col("x")), "  a \n\t b  ") == "a b")
  }

  test("cleanText display math spans newlines (DOTALL)") {
    assert(one(TextFns.cleanText(col("x")), "a $$x\ny$$ b") == "a b")
  }

  test("normalizeEntity: lowercase, strip non-alnum, collapse ws") {
    assert(one(TextFns.normalizeEntity(col("x")), "  Spark-SQL  Engine! ") == "sparksql engine")
  }

  test("slug replaces every non-alnum with underscore") {
    assert(one(TextFns.slug(col("x")), "Intro & Overview") == "intro___overview")
  }

  test("nodeId: node_ prefix, spaces to underscore, 60-char cap") {
    assert(one(TextFns.nodeId(col("x")), "big data engine") == "node_big_data_engine")
    val long = ("a " * 40).trim // 79 chars normalized
    val out = one(TextFns.nodeId(col("x")), long)
    assert(out.startsWith("node_") && out.length == 65)
  }

  test("wordCount: blank is 0, whitespace runs count once") {
    assert(one(TextFns.wordCount(col("x")), "") == "0")
    assert(one(TextFns.wordCount(col("x")), "  ") == "0")
    assert(one(TextFns.wordCount(col("x")), " a  b\tc ") == "3")
  }

  test("hash60 matches the md5-prefix definition and is non-negative") {
    // md5('abc') = 900150983cd24fb0..., first 15 hex = 900150983cd24fb
    val expected = java.lang.Long.parseLong("900150983cd24fb", 16)
    assert(one(TextFns.hash60(col("x")), "abc") == expected.toString)
    assert(expected > 0)
  }

  test("hash60 seeded variants are independent") {
    val a = one(TextFns.hash60(col("x"), 0), "abc")
    val b = one(TextFns.hash60(col("x"), 1), "abc")
    assert(a != b)
  }

  test("paperId / chunkId formatting") {
    assert(one(TextFns.paperId(col("x").cast("long")), "42") == "doc_000042")
    val df = Seq(("doc_000001", "body", 7)).toDF("p", "s", "i")
    assert(df.select(TextFns.chunkId(col("p"), col("s"), col("i"))).head.getString(0)
      == "doc_000001_body_c007")
  }
}
