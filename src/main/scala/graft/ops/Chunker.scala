package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G1/G2 — sliding-window word chunker (reference: data/ingestion.py:173-212).
  *
  * Reference semantics, reproduced exactly:
  *  - sections with fewer than `minWords` words are skipped entirely;
  *  - `abstract` sections always yield ONE chunk (the whole section);
  *  - other sections yield windows of `size` words with stride
  *    `size - overlap`; the loop emits the window starting at `s` and
  *    stops after the first window whose end reaches the text end —
  *    equivalently a window at `s > 0` exists iff `s + overlap < n`;
  *  - the per-section chunk ordinal `i` counts every generated window
  *    (even ones later dropped for being short: the reference assigns
  *    ids before the `word_count < minWords` filter);
  *  - chunks shorter than `minWords` are dropped after id assignment;
  *  - `chunk_id = {paper_id}_{section_slug}_c{i:03d}`.
  *
  * Implemented as `explode` over a computed array of window starts —
  * a pure narrow transformation: no shuffle, parallel over input rows,
  * and the per-row work is O(words). This is the Generator shape
  * (one text row → many chunk rows) without a custom Catalyst
  * Generator; `explode` + higher-order functions stay codegen-friendly.
  */
object Chunker {

  /** Explode `(idCol, sectionCol, textCol)` rows into chunk rows.
    * Output columns: idCol, sectionCol, `chunk_ord` (per-section, incl.
    * dropped windows), `chunk_id`, `text_content`, `word_count`.
    */
  def chunk(df: DataFrame, idCol: String, sectionCol: String, textCol: String,
            size: Int = 200, overlap: Int = 30, minWords: Int = 30): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val stride = size - overlap

    val isAbstract = col(sectionCol) === "abstract"
    val starts =
      when(isAbstract, array(lit(0)))
        .otherwise(
          filter(
            sequence(lit(0), greatest(col("_n") - 1, lit(0)), lit(stride)),
            s => s === 0 || s + lit(overlap) < col("_n")))

    df.withColumn("_words", TextFns.tokens(col(textCol)))
      .withColumn("_n", TextFns.wordCount(col(textCol)))
      .filter(col("_n") >= minWords)
      .withColumn("_start", explode(starts))
      .withColumn("chunk_ord",
        when(isAbstract, lit(0)).otherwise((col("_start") / stride).cast("int")))
      .withColumn("word_count",
        when(isAbstract, col("_n"))
          .otherwise(least(col("_n") - col("_start"), lit(size))).cast("int"))
      .filter(col("word_count") >= minWords)
      .withColumn("text_content",
        array_join(
          slice(col("_words"), col("_start") + 1,
            when(isAbstract, col("_n")).otherwise(lit(size))), " "))
      .withColumn("chunk_id",
        TextFns.chunkId(col(idCol), TextFns.slug(col(sectionCol)), col("chunk_ord")))
      .drop("_words", "_n", "_start")
  }
}
