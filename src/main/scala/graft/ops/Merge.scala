package graft.ops

import org.apache.spark.sql.DataFrame
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
}
