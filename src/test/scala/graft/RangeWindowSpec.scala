package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q34's frame semantics: RANGE is VALUE distance — calendar gaps
  * shrink the window, which a ROWS frame silently gets wrong. */
class RangeWindowSpec extends SparkSpec {
  import spark.implicits._

  test("a gap day shrinks the RANGE frame where ROWS would not") {
    val df = Seq(("p", 0L, 1L), ("p", 1L, 2L), ("p", 10L, 4L))
      .toDF("pri", "day_int", "v")
    val range = Window.partitionBy($"pri").orderBy($"day_int").rangeBetween(-6, 0)
    val rows = Window.partitionBy($"pri").orderBy($"day_int").rowsBetween(-2, 0)
    val r = df.select($"day_int",
        sum($"v").over(range).as("range_sum"),
        sum($"v").over(rows).as("rows_sum"))
      .orderBy($"day_int").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // day 10: days 4..10 hold only day 10 itself → RANGE = 4, while
    // ROWS(2 preceding) would reach back across the gap → 7
    assert(r.toSeq == Seq((0L, 1L, 1L), (1L, 3L, 3L), (10L, 4L, 7L)))
  }

  test("declared q34 trailing totals replay from a brute-force recompute") {
    val out = SparkEntry.queries("q34_range_window")(spark, Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val daily = out.groupBy(_._1).map { case (pri, rs) =>
      pri -> rs.map(r => r._2 -> r._3).toMap
    }
    out.foreach { case (pri, day, _, n7d) =>
      val expected = (day - 6 to day).flatMap(daily(pri).get).sum
      assert(n7d == expected, s"($pri, $day): n_7d $n7d != brute $expected")
    }
  }
}
