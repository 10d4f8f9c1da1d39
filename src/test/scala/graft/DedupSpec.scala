package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQ

/** Determinism and semantics of the dedup suite on crafted docs. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical texts to min doc_id") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = df.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .orderBy("keep").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("simhash: identical texts get identical signatures, disjoint texts differ") {
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "omicron sigma tau upsilon phi"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupQ.defs("d4_dedup_simhash")(spark, dir)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == out(1).getLong(1))
    assert(out(0).getLong(1) != out(2).getLong(1))
  }

  test("minhash LSH: near-identical docs collide, unrelated docs do not") {
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq((0L, base), (1L, base + " extra"), // ~97% shingle overlap
      (2L, (100 to 140).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = DedupQ.defs("d3_dedup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("d12's hash60 gram keys are collision-free at oracle scale") {
    // d12 shuffles hash60(gram) instead of the gram string; a
    // cross-gram collision would merge groups and flip the dup flags
    // vs the string-keyed DuckDB oracle. The documented risk bound is
    // ~n²/2⁶¹; this pins that it actually holds at the SF the oracle
    // compares (distinct strings == distinct hashes ⇒ zero merges).
    import graft.ops.TextFns
    val n = DedupQ.SpanN
    val grams = spark.read.parquet(s"$Sf001/documents.parquet")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"),
        TextFns.wordCount(col("text")).as("nw"))
      .filter(col("nw") >= n)
      .select(explode(transform(sequence(lit(1), col("nw") - (n - 1)),
        i => array_join(slice(col("w"), i, lit(n)), " "))).as("gram_str"))
    val r = grams.agg(
      countDistinct(col("gram_str")).as("strs"),
      countDistinct(TextFns.hash60(col("gram_str"))).as("hashes")).head()
    assert(r.getLong(0) == r.getLong(1),
      s"hash60 collision at sf0.01: ${r.getLong(0)} distinct grams vs ${r.getLong(1)} hashes")
  }
}
