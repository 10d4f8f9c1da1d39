package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** ops.RangeJoin: the binned point-in-interval join must equal the
  * brute-force cross-join answer — including when the configured
  * bucket width is SMALLER than the longest interval (the contract:
  * an undersized width costs build-side expansion, never rows).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val points = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-01 00:07:30")),
    (3L, ts("2024-01-01 00:15:00")), // exactly on an interval end
    (4L, ts("2024-01-01 00:15:00.000001")), // just past it
    (5L, ts("2024-01-01 03:00:00"))
  ).toDF("pid", "ts")

  private val intervals = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:15:00")),
    (11L, ts("2024-01-01 00:10:00"), ts("2024-01-01 01:10:00")), // 1h — longer than one bucket
    (12L, ts("2024-01-01 02:59:00"), ts("2024-01-01 03:01:00"))
  ).toDF("iid", "start", "end")

  private def bruteForce = points.crossJoin(intervals)
    .filter(col("ts") >= col("start") && col("ts") <= col("end"))
    .select("pid", "iid").orderBy("pid", "iid")

  test("binned join equals brute force (inclusive bounds, no dup pairs)") {
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end", 3600)
      .select("pid", "iid").orderBy("pid", "iid")
    assert(got.collect().toSeq == bruteForce.collect().toSeq)
  }

  test("undersized bucket width still returns the exact answer") {
    // width 60 s ≪ the 1-hour interval: it explodes into 61 buckets
    // but the result set is identical
    val got = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end", 60)
      .select("pid", "iid").orderBy("pid", "iid")
    assert(got.collect().toSeq == bruteForce.collect().toSeq)
  }

  test("joins as a hash equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, "ts", "start", "end", 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bin to an equi join:\n$plan")
  }
}
