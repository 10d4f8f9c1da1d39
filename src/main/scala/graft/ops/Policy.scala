package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** ROW/COLUMN-LEVEL GOVERNANCE (x95) — read-path masking policies,
  * the access-control half the governance family lacked (x39 audits,
  * x50/x76/x89 erase; nothing shaped what a READER sees). The shape
  * is Snowflake masking policies / Unity Catalog column masks + row
  * filters reduced to their load-bearing parts:
  *
  *  - the POLICY is data, not code: a Snapshots table of rows
  *    `(kind, column, expr)` — `mask` rows rewrite one column as a
  *    SQL expression over the row's own columns, `filter` rows AND a
  *    row-level predicate into the read. Landing policies on the
  *    snapshot log makes them versioned, auditable (table_history),
  *    and atomically switchable — governance artifacts need their
  *    own provenance.
  *  - [[bind]] applies the CURRENT policy to the data table's
  *    resolved latest as a VIEW REWRITE: masks evaluate inside the
  *    scan's projection (no extra pass, codegen'd like any
  *    expression) and row filters sit directly on the scan, where
  *    Catalyst pushes them into the parquet reader. At 100 TB a
  *    policy-bound read costs exactly what the equivalent
  *    hand-masked query costs — zero added jobs, zero data movement;
  *    the policy fetch itself is one manifest-sized read.
  *
  * A mask may not RENAME or DROP columns (the consumer's schema
  * contract survives masking — same names, same order); a mask
  * naming a column the table lacks fails loudly at bind time.
  */
object Policy {

  /** Policy row schema helper: build a policy frame from (kind,
    * column, expr) triples — `kind` ∈ {mask, filter}; `column` is
    * null for filters. */
  def frame(spark: SparkSession,
            rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("kind", "column", "expr")
  }

  /** The data table's resolved latest with `policyDir`'s CURRENT
    * policy applied — masked columns in place (names and order
    * preserved), row filters ANDed onto the scan. */
  def bind(spark: SparkSession, dataDir: String, policyDir: String): DataFrame = {
    val data = Snapshots.readResolved(spark, dataDir)
    val pol = Snapshots.readResolved(spark, policyDir)
      .select(col("kind"), col("column"), col("expr")).collect()
    val masks = pol.filter(_.getString(0) == "mask")
      .map(r => r.getString(1) -> r.getString(2)).toMap
    val filters = pol.filter(_.getString(0) == "filter").map(_.getString(2))
    val unknown = pol.map(_.getString(0)).toSet -- Set("mask", "filter")
    require(unknown.isEmpty, s"unknown policy kinds: ${unknown.mkString(",")}")
    val missing = masks.keySet.filterNot(data.columns.contains)
    require(missing.isEmpty,
      s"policy masks name columns $dataDir lacks: ${missing.mkString(",")}")
    val filtered = filters.foldLeft(data)((df, p) => df.filter(expr(p)))
    filtered.select(data.columns.toSeq.map { c =>
      masks.get(c).map(m => expr(m).as(c)).getOrElse(col(c))
    }: _*)
  }
}
