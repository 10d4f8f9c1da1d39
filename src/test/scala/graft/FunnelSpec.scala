package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Funnel
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Steps = Seq("view", "click", "purchase")

  // user 1 converts fully; user 2 clicked before viewing (stuck at 1);
  // user 3 views only; user 4 has only a click (reaches 0 steps)
  private val events = Seq(
    Funnel.FEvent(1, ts("2024-01-01 10:00:00"), 1L, "view"),
    Funnel.FEvent(2, ts("2024-01-01 10:05:00"), 1L, "click"),
    Funnel.FEvent(3, ts("2024-01-01 10:09:00"), 1L, "purchase"),
    Funnel.FEvent(4, ts("2024-01-01 09:00:00"), 2L, "click"),
    Funnel.FEvent(5, ts("2024-01-01 09:30:00"), 2L, "view"),
    Funnel.FEvent(6, ts("2024-01-01 09:10:00"), 3L, "view"),
    Funnel.FEvent(7, ts("2024-01-01 09:20:00"), 4L, "click"))

  test("chain: strict ordering, ties and unreached steps") {
    assert(Funnel.chain(Seq((10L, "view"), (20L, "click"), (30L, "purchase")),
      Steps) == (3, Some(30L)))
    // click at the same ms as view does NOT count (strictly after)
    assert(Funnel.chain(Seq((10L, "view"), (10L, "click")), Steps) == (1, None))
    // a later view cannot resurrect an earlier click
    assert(Funnel.chain(Seq((20L, "view"), (10L, "click")), Steps) == (1, None))
    assert(Funnel.chain(Seq((10L, "click")), Steps) == (0, None))
  }

  test("batch funnel matches the chain replay per user") {
    val out = Funnel.funnelBatch(events.toDF(), Steps)
      .orderBy("user_id")
      .select("user_id", "steps_reached", "completed_at")
      .as[(Long, Int, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, 3, Some(ts("2024-01-01 10:09:00"))),
      (2L, 1, None),
      (3L, 1, None),
      (4L, 0, None)))
  }

  test("streaming funnel agrees with batch, including out-of-order arrivals") {
    val dir = java.nio.file.Files.createTempDirectory("funnel_stream").toString
    // batch 1 delivers user 2's click AFTER its view (out of order in
    // arrival, in order in event time) and user 1's purchase first
    Seq(events(2), events(4), events(0), events(6)).toDF()
      .write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Funnel.FEvent]].schema)
      .parquet(dir).as[Funnel.FEvent]
    val q = Funnel.funnelStream(src, Steps, horizonSeconds = 600,
        watermark = "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel").start()
    try {
      q.processAllAvailable()
      Seq(events(1), events(3), events(5)).toDF()
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      // advance the watermark far past every horizon to flush state
      Seq(Funnel.FEvent(8, ts("2024-01-02 12:00:00"), 9L, "view")).toDF()
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq(Funnel.FEvent(9, ts("2024-01-03 12:00:00"), 9L, "view")).toDF()
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("funnel")
        .filter(col("user_id") < 9)
        .select("user_id", "steps_reached", "completed_at")
        .as[(Long, Int, Option[Timestamp])].collect().toSeq.sortBy(_._1)
      val batch = Funnel.funnelBatch(events.toDF(), Steps)
        .select("user_id", "steps_reached", "completed_at")
        .as[(Long, Int, Option[Timestamp])].collect().toSeq.sortBy(_._1)
      assert(streamed == batch)
    } finally q.stop()
  }
}
