package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed SCD-1 merge — `MERGE INTO` semantics over immutable
  * snapshots, the nightly-refresh primitive of every lakehouse table
  * (and the batch twin of the streaming idempotent sink).
  *
  * `upsert(snapshot, changes)` applies a changeset of upserts
  * (`op = 'U'`, full payload) and deletes (`op = 'D'`) to a snapshot,
  * keyed by `key`, change-wins:
  *
  *   union(snapshot tagged v=0, changes tagged v=1)
  *     → ONE hash shuffle on the key
  *     → max_by(payload, v) per key   (no sort, no window)
  *     → drop rows whose winner is a delete
  *
  * One shuffle total, partial-aggregated map-side — the scalable shape
  * when the changeset is too big to broadcast (if it isn't, Catalyst
  * still picks a broadcast exchange for the union's small side — the
  * plan degrades gracefully). Contract: `changes` carries at most one
  * row per key (pre-reduce upstream, e.g. latest-wins per key), and
  * exactly the snapshot's columns plus `op`.
  */
object Merge {

  def upsert(snapshot: DataFrame, changes: DataFrame, key: String,
             opCol: String = "op"): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == key).toIndexedSeq
    require(payload.nonEmpty, "snapshot needs at least one non-key column")
    val missing = (payload :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: ${missing.mkString(", ")}")
    val s2 = snapshot.select(
      (col(key) +: payload.map(col)) ++ Seq(lit("U").as(opCol), lit(0).as("_v")): _*)
    val c2 = changes.select(
      (col(key) +: payload.map(col)) ++ Seq(col(opCol), lit(1).as("_v")): _*)
    s2.unionByName(c2)
      .groupBy(col(key))
      .agg(max_by(struct((payload.map(col) :+ col(opCol)): _*), col("_v")).as("_r"))
      .filter(col(s"_r.$opCol") =!= "D")
      .select(col(key) +: payload.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** General four-arm `MERGE INTO` — the lakehouse's primary write
    * verb (Delta/Iceberg MERGE), over same-schema frames:
    *
    *   WHEN MATCHED AND matchedDelete(t, s)            THEN DELETE
    *   WHEN MATCHED AND matchedUpdate(t, s)            THEN UPDATE SET *  (source row wins)
    *   WHEN MATCHED                     (fallthrough)  → keep the target row
    *   WHEN NOT MATCHED AND notMatchedInsert(s)        THEN INSERT *
    *   WHEN NOT MATCHED BY SOURCE AND bySourceDelete(t) THEN DELETE
    *   WHEN NOT MATCHED BY SOURCE       (fallthrough)  → keep the target row
    *
    * Arm conditions receive the matched rows as STRUCT columns
    * (`t("c")` / `s("c")` field access), evaluated in the order
    * above — delete outranks update, mirroring SQL MERGE's
    * first-matching-clause rule. Contract: `source` carries at most
    * one row per key (SQL MERGE raises on multi-match; pre-reduce
    * upstream, e.g. latest-wins per key) and exactly the target's
    * columns.
    *
    * Plan: ONE full-outer equi join on the key — each side shuffles
    * once on its own key partitioning (Catalyst broadcasts a small
    * source instead) — then a narrow per-row arm select; nothing
    * data-sized happens twice. This is copy-on-write over the whole
    * frame, the right shape when the source touches a wide key
    * range; a tiny delete-only source is better served by the
    * merge-on-read deletion-vector path
    * ([[graft.sources.Snapshots.commitDeletes]], x27).
    */
  /** Enforce the at-most-one-source-row-per-key contract EAGERLY —
    * SQL MERGE (and Delta/Iceberg) raise on a multi-match source; a
    * silent pass would emit duplicate output rows. One source-sized
    * (churn-sized, not table-sized) groupBy — ON BY DEFAULT, matching
    * SQL MERGE / Delta / Iceberg semantics; a hot path that has
    * already deduplicated (e.g. a latest-wins reduce) may opt out via
    * `checkUniqueSource = false` to stay one job. */
  def requireUniqueKeys(source: DataFrame, key: String): Unit = {
    val dup = source.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"MERGE source violates the one-row-per-key contract: key " +
        s"'$key' value ${dup.head.get(0)} appears ${dup.head.getLong(1)} times")
  }

  def mergeInto(target: DataFrame, source: DataFrame, key: String,
      matchedDelete: (Column, Column) => Column = (_, _) => lit(false),
      matchedUpdate: (Column, Column) => Column = (_, _) => lit(true),
      notMatchedInsert: Column => Column = _ => lit(true),
      bySourceDelete: Column => Column = _ => lit(false),
      checkUniqueSource: Boolean = true): DataFrame = {
    if (checkUniqueSource) requireUniqueKeys(source, key)
    val (joined, payload) = mergedFrame(target, source, key,
      matchedDelete, matchedUpdate, notMatchedInsert, bySourceDelete)
    joined.filter(col("_a") =!= "X")
      .withColumn("_r", when(col("_a") === "K", col("_t")).otherwise(col("_s")))
      .select(col(key) +: payload.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** The same four-arm MERGE as [[mergeInto]], expressed as DELTAS for
    * the merge-on-read path (x58): returns (maskKeys, newImages) where
    * `maskKeys` are the TARGET rows the merge removes or supersedes
    * (matched deletes + matched updates + by-source deletes — a
    * deletion vector against the base) and `newImages` are the rows
    * the merge adds (updated images + inserts — an append). Base
    * anti-join maskKeys ∪ newImages ≡ mergeInto's output (MergeSpec
    * pins the identity). At 100 TB a low-churn MERGE lands as
    * key-sized DV + delta-sized append instead of a copy-on-write
    * table rewrite — Delta's merge-with-deletion-vectors shape. */
  def mergeDeltas(target: DataFrame, source: DataFrame, key: String,
      matchedDelete: (Column, Column) => Column = (_, _) => lit(false),
      matchedUpdate: (Column, Column) => Column = (_, _) => lit(true),
      notMatchedInsert: Column => Column = _ => lit(true),
      bySourceDelete: Column => Column = _ => lit(false),
      checkUniqueSource: Boolean = true): (DataFrame, DataFrame) = {
    if (checkUniqueSource) requireUniqueKeys(source, key)
    val (joined, payload) = mergedFrame(target, source, key,
      matchedDelete, matchedUpdate, notMatchedInsert, bySourceDelete)
    // each delta plans the join independently ON PURPOSE: Catalyst
    // prunes each pass to the columns its projection needs (maskKeys
    // reads only key + arm inputs), and two pruned scans of the
    // target beat materializing the table-sized join that a shared
    // cut would force — the deltas, not the join, are churn-sized
    val maskKeys = joined
      .filter(col("_t").isNotNull && col("_a").isin("X", "U"))
      .select(col(key))
    val newImages = joined.filter(col("_a").isin("I", "U"))
      .select(col(key) +: payload.map(c => col(s"_s.$c").as(c)): _*)
    (maskKeys, newImages)
  }

  /** Shared arm evaluation: the full-outer join with one action code
    * per row (`_a` ∈ I/U/K/X) next to both payload structs. Arms
    * collapse to codegen'd CASE chains over the join output — no
    * second pass, no driver-side row handling; delete outranks
    * update, mirroring SQL MERGE's first-matching-clause rule. */
  private def mergedFrame(target: DataFrame, source: DataFrame, key: String,
      matchedDelete: (Column, Column) => Column,
      matchedUpdate: (Column, Column) => Column,
      notMatchedInsert: Column => Column,
      bySourceDelete: Column => Column): (DataFrame, IndexedSeq[String]) = {
    val payload = target.columns.filterNot(_ == key).toIndexedSeq
    require(payload.nonEmpty, "target needs at least one non-key column")
    val missing = (key +: payload).filterNot(source.columns.contains)
    require(missing.isEmpty, s"source is missing columns: ${missing.mkString(", ")}")
    val t2 = target.select(col(key), struct(payload.map(col): _*).as("_t"))
    val s2 = source.select(col(key), struct(payload.map(col): _*).as("_s"))
    val (tc, sc) = (col("_t"), col("_s"))
    val action =
      when(tc.isNull, when(notMatchedInsert(sc), "I").otherwise("X"))
        .when(sc.isNull, when(bySourceDelete(tc), "X").otherwise("K"))
        .otherwise(when(matchedDelete(tc, sc), "X")
          .when(matchedUpdate(tc, sc), "U")
          .otherwise("K"))
    (t2.join(s2, Seq(key), "full_outer").withColumn("_a", action), payload)
  }
}
