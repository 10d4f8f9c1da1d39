package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V5 — deterministic entity extraction.
  *
  * The reference uses scispaCy NER (data/ingestion.py:306-331) — an
  * external model that cannot be reproduced deterministically. We keep
  * its *engine-relevant* contract (one text row → many entity
  * occurrence rows; min-length filter `KG_MIN_NAME_LENGTH=3`;
  * normalization lowercase/collapse-ws/strip-non-alnum,
  * data/ingestion.py:325-332) and replace the model with a
  * deterministic rule: whitespace tokens, edge punctuation stripped,
  * ≥3 chars, containing a letter, not in a fixed stopword list.
  *
  * Every step is a Catalyst built-in expression so the exact same
  * definition is expressible in the DuckDB oracle SQL.
  */
object Entities {

  /** Fixed stopword list — must stay in sync with Oracle.stopSqlList. */
  val stopwords: Seq[String] = Seq(
    "the", "and", "for", "with", "that", "this", "from", "are", "was",
    "were", "has", "have", "had", "not", "but", "all", "any", "can",
    "will", "one", "two", "its", "our", "out", "who", "she", "his",
    "her", "you")

  /** Strip leading/trailing non-alphanumeric runs from a token. */
  def stripEdges(token: Column): Column =
    regexp_replace(token, "^[^A-Za-z0-9]+|[^A-Za-z0-9]+$", "")

  /** One row per entity *occurrence* (reference emits a map record per
    * mention, data/ingestion.py:348-353). Output: input id columns +
    * `ord` (1-based token position), `name` (surface form),
    * `name_normalized`, `node_id`.
    */
  def occurrences(df: DataFrame, idCols: Seq[String], textCol: String): DataFrame = {
    val exploded = df.select(
      idCols.map(col) :+ posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "token")): _*)
    exploded
      .withColumn("ord", col("pos") + 1)
      .withColumn("name", stripEdges(col("token")))
      .filter(length(col("name")) >= 3)
      .withColumn("name_normalized", TextFns.normalizeEntity(col("name")))
      .filter(col("name_normalized") =!= "" &&
        col("name_normalized").rlike("[a-z]") &&
        !col("name_normalized").isin(stopwords: _*))
      .withColumn("node_id", TextFns.nodeId(col("name_normalized")))
      .drop("pos", "token")
  }
}
