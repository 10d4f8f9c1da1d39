package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

/** Backward as-of join semantics (ops.AsofJoin): latest right row at
  * or before each left row's time, per key, via the union+window
  * sweep plan.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))) // key with no right rows
      .toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.5),
      (101L, 10L, ts("2024-01-01 11:00:00"), 2.5),
      (102L, 20L, ts("2024-01-01 09:00:00"), 9.0), // equal ts -> inclusive
      (103L, 20L, ts("2024-01-01 10:00:00"), 8.0)) // after left -> ignored
      .toDF("rid", "rk", "rt", "rv")

    val out = AsofJoin.backward(left, right, "k", "rk", "t", "rt",
        Seq("rid", "rv"), "m")
      .select(col("id"), col("m.rid").as("rid"), col("m.rv").as("rv"))
      .orderBy("id").collect()

    assert(out(0).getLong(1) == 100L && out(0).getDouble(2) == 1.5)
    assert(out(1).getLong(1) == 101L && out(1).getDouble(2) == 2.5)
    assert(out(2).getLong(1) == 102L && out(2).getDouble(2) == 9.0) // tie inclusive
    assert(out(3).isNullAt(1)) // no match -> null struct
  }

  test("every left row survives (left-join contract), columns intact") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"), "x")).toDF("id", "k", "t", "tag")
    val right = Seq((9L, 2L, ts("2023-01-01 00:00:00"))).toDF("rid", "rk", "rt")
    val out = AsofJoin.backward(left, right, "k", "rk", "t", "rt", Seq("rid"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "tag", "asof"))
    assert(out.count() == 1)
    assert(out.head.isNullAt(4))
  }

  test("agrees with the brute-force range-join definition on events") {
    val ev = Tables.load(spark, Sf0001, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).limit(200)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("event_id")).as("v_event_id"))
    val fast = AsofJoin.backward(purchases, views, "user_id", "v_user",
        "ts", "v_ts", Seq("v_event_id"), "m")
      .select(col("event_id"), col("m.v_event_id").as("v_event_id"))
    // brute force: range join + keep the max (v_ts, v_event_id)
    val brute = purchases.join(views,
        col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("v_event_id"), struct(col("v_ts"), col("v_event_id"))).as("v_event_id"))
    val diff = fast.join(brute, Seq("event_id"))
      .filter(!(fast("v_event_id") <=> brute("v_event_id")))
    assert(diff.count() == 0)
  }
}
