package graft

import org.apache.spark.sql.functions._
import graft.ops.Analyze

/** ANALYZE legs (x34/x36) and the stats→planner loop (x37): the
  * statistics must be right, and the planning decision must actually
  * follow them — in both directions, with the byte-cap guard. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  test("numLeg/strLeg profile counts, NDV, bounds and width") {
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, null)).toDF("k", "s")
    val num = Analyze.numLeg(df, "k", col("k")).collect().head
    assert(num.getString(0) == "k" && num.getLong(1) == 3 &&
      num.getLong(2) == 0 && num.getLong(3) == 3)
    assert(num.getDouble(4) == 1.0 && num.getDouble(5) == 3.0)
    val str = Analyze.strLeg(df, "s").collect().head
    assert(str.getLong(1) == 3 && str.getLong(2) == 1 && str.getLong(3) == 1)
    assert(str.getString(6) == "aa" && str.getString(7) == "aa" &&
      str.getDouble(8) == 2.0)
  }

  test("estBytes combines row count with per-column widths") {
    val df = Seq((1L, "abcd"), (2L, "ab")).toDF("k", "s")
    val stats = Analyze.numLeg(df, "k", col("k"))
      .unionByName(Analyze.strLeg(df, "s")).collect()
    // 2 rows × (8 numeric + (3.0 avg + 4) string) = 30
    assert(Analyze.estBytes(stats) == 30L)
  }

  test("statsChosenJoin follows the stats in both directions and respects the byte cap") {
    val big = spark.range(1000).select(col("id").as("k"), col("id").as("v"))
    val small = spark.range(10).select(col("id").as("k"), col("id").as("w"))
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      Analyze.numLeg(df, "k", col("k")).collect()
    val (bs, ss) = (statsOf(big), statsOf(small))
    // the static threshold is disabled, so ONLY the stats-driven hint
    // can produce a broadcast join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def physical(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.toString
      val (j1, side1) = Analyze.statsChosenJoin(
        big, bs, small, ss, big("k") === small("k"))
      assert(side1 == "right")
      assert(physical(j1).contains("BroadcastHashJoin") &&
        physical(j1).contains("BuildRight"),
        "the fewer-rows right side must be the broadcast build side")
      assert(j1.count() == 10)
      // reversed inputs: the decision flips with the stats
      val (j2, side2) = Analyze.statsChosenJoin(
        small, ss, big, bs, small("k") === big("k"))
      assert(side2 == "left")
      assert(physical(j2).contains("BroadcastHashJoin") &&
        physical(j2).contains("BuildLeft"))
      // lying stats flip the decision too — proof the plan follows the
      // STATS, not the data: tell it the big side is the small one
      val (j3, side3) = Analyze.statsChosenJoin(
        big, ss, small, bs, big("k") === small("k"))
      assert(side3 == "left" && physical(j3).contains("BuildLeft"))
      // neither side under the cap -> no hint, shuffle join
      val (j4, side4) = Analyze.statsChosenJoin(
        big, bs, small, ss, big("k") === small("k"), maxBroadcastBytes = 10)
      assert(side4 == "none" && !physical(j4).contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("x36's sketch envelope holds on the fixture (every ndv_ok true)") {
    val rows = SparkEntry.queries("x36_table_stats_hll")(spark, Sf0001).collect()
    assert(rows.length == 4 && rows.forall(_.getBoolean(4)),
      "HLL estimates must sit inside the 3-sigma envelope")
  }
}
