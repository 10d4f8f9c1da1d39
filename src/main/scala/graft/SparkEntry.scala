package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups:
  *  - RelationalQ (q1–q20): SURVEY.md §2.1–2.8 relational inventory
  *  - VectorQ (v1–v5): §2.9 vector ops + ANN (brute-force, IVF)
  *  - DedupQ (d1–d5): dedup suite (exact, Jaccard, MinHash, SimHash,
  *    embedding)
  *  - TextQ (t1–t4, m1, s1): text analysis, multimodal metadata,
  *    windowed events
  *  - KgQ (k1–k7): chunker / knowledge-graph pipeline + flagship search
  *
  * Every entry has a DuckDB oracle twin in `oracleSql` with identical
  * column names/types and a deterministic total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("k7_search_chunks")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQ.defs ++ VectorQ.defs ++ DedupQ.defs ++ TextQ.defs ++ KgQ.defs ++ ExtQ.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQ.oracles ++ VectorQ.oracles ++ DedupQ.oracles ++ TextQ.oracles ++
      KgQ.oracles ++ ExtQ.oracles
}
