package graft

import org.apache.spark.sql.functions._

/** x64's exact-mode contract: below nominal-entry capacity a theta
  * sketch retains every hash, so estimates — and the estimates of
  * unions, intersections and differences of such sketches — are
  * EXACT integers, which is what lets the declared query's oracle
  * replay them from exact SQL. Also pins the conditional-input
  * build (null rows skipped) and partition-count invariance of the
  * partial-merge path.
  */
class ThetaSetSpec extends SparkSpec {

  private def algebra(parts: Int): Seq[Long] = {
    // A = {0..599}, B = {300..899}: |A|=600 |B|=600 |∪|=900 |∩|=300
    val df = spark.range(0, 1800)
      .select(col("id"), (col("id") < 900).as("inA"))
      .select(
        when(col("inA"), col("id") % 600).as("a_k"),
        when(!col("inA"), col("id") % 600 + 300).as("b_k"))
      .repartition(parts)
    df.agg(
      call_function("theta_sketch_agg", col("a_k"), lit(12)).as("a"),
      call_function("theta_sketch_agg", col("b_k"), lit(12)).as("b"))
      .select(
        call_function("theta_sketch_estimate", col("a")),
        call_function("theta_sketch_estimate", col("b")),
        call_function("theta_sketch_estimate",
          call_function("theta_union", col("a"), col("b"))),
        call_function("theta_sketch_estimate",
          call_function("theta_intersection", col("a"), col("b"))),
        call_function("theta_sketch_estimate",
          call_function("theta_difference", col("a"), col("b"))))
      .collect().head.toSeq.map(_.asInstanceOf[Long])
  }

  test("exact mode: set algebra below capacity matches exact counts, at any partitioning") {
    val expected = Seq(600L, 600L, 900L, 300L, 300L)
    assert(algebra(1) == expected)
    // partial states merged across 8 tasks land on the same integers
    assert(algebra(8) == expected)
  }

  test("the union carries its OWN capacity: above 4096 keys a default union estimates") {
    // two exact lgk=20 sketches folded through theta_union's default
    // lgk=12 (4096 nominal entries) drop into estimation — the trap
    // the sf0.1 oracle sweep caught in x64 (14,300 keys → 14,198)
    val df = spark.range(0, 15000).select(
      when(col("id") % 2 === 0, col("id")).as("a_k"),
      when(col("id") % 2 === 1, col("id")).as("b_k"))
    val ag = df.agg(
      call_function("theta_sketch_agg", col("a_k"), lit(20)).as("a"),
      call_function("theta_sketch_agg", col("b_k"), lit(20)).as("b"))
    val r = ag.select(
      call_function("theta_sketch_estimate",
        call_function("theta_union", col("a"), col("b"))),
      call_function("theta_sketch_estimate",
        call_function("theta_union", col("a"), col("b"), lit(20))))
      .collect().head
    assert(r.getLong(1) == 15000L,
      "a capacity-matched union of exact inputs must be exact")
    assert(r.getLong(0) != 15000L,
      "the default-capacity union estimates — pass lgk through the union")
  }

  test("conditional input skips nulls: a when() with no otherwise adds nothing") {
    val df = spark.range(0, 100)
    val n = df.agg(
      call_function("theta_sketch_estimate",
        call_function("theta_sketch_agg",
          when(col("id") < 10, col("id")), lit(12))))
      .collect().head.getLong(0)
    assert(n == 10L)
  }
}
