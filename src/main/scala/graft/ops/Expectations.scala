package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CHECK-CONSTRAINT enforcement at write time (x47) — Delta table
  * constraints / DLT expectations reduced to their load-bearing
  * parts: every named constraint is evaluated per row in ONE narrow
  * pass (no per-constraint scans), rows failing any split into a
  * QUARANTINE frame carrying the comma-joined names of every failed
  * constraint (declaration order — deterministic, SQL-replayable),
  * and the caller lands clean + quarantine atomically (an x45
  * transaction), so the gate's invariant — table rows all satisfy
  * the constraints, nothing is silently dropped — is never torn.
  * A NULL constraint result counts as a violation (SQL CHECK says
  * NULL passes; a quality gate must not let unknowns through, so
  * the stricter reading is deliberate and documented here).
  * At 100 TB this is the ingest quality gate: the split is a
  * filter-scan (predicate work only), quarantine cost follows the
  * violation count, and the corpus never needs a post-hoc audit
  * scan because violations could never land in it. */
object Expectations {

  /** Split `df` by the named constraints: (clean — every constraint
    * holds, original schema; quarantine — original schema plus
    * `violations`, the failed names comma-joined). */
  def split(df: DataFrame,
            constraints: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(!df.columns.contains("violations"),
      "split would overwrite the input's own 'violations' column " +
        "(and drop it from the clean side) — rename it first")
    val failed = array(constraints.map { case (name, c) =>
      when(!coalesce(c, lit(false)), lit(name))
    }: _*)
    val tagged = df.withColumn("violations",
      array_join(filter(failed, v => v.isNotNull), ","))
    (tagged.filter(col("violations") === "").drop("violations"),
      tagged.filter(col("violations") =!= ""))
  }
}
