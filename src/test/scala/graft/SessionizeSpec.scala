package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Sessionize
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: two sessions separated by a 2h gap
    Sessionize.Event(1, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
    Sessionize.Event(2, ts("2024-01-01 10:10:00"), 1L, "view", 2.0),
    Sessionize.Event(3, ts("2024-01-01 12:30:00"), 1L, "click", 3.0),
    // user 2: one session
    Sessionize.Event(4, ts("2024-01-01 09:00:00"), 2L, "click", 4.0))

  test("batch sessionization: gap splits sessions, aggregates are exact") {
    val out = Sessionize.sessionsBatch(events.toDF(), gapSeconds = 1800)
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Long]("user_id") == 1L)
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("late event far before the live session forms its own session") {
    val dir = java.nio.file.Files.createTempDirectory("sess_late").toString
    // batch 1: a session at 10:00 for user 7
    Seq(
      Sessionize.Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      Sessionize.Event(2, ts("2024-01-01 10:00:10"), 7L, "click", 2.0))
      .toDF().write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Sessionize.Event]].schema)
      .parquet(dir).as[Sessionize.Event]
    // large watermark so the 09:00 event is NOT dropped upstream
    val q = Sessionize.sessionsStream(src, gapSeconds = 30, watermark = "3 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_late").start()
    try {
      q.processAllAvailable()
      // batch 2: an event an hour EARLIER than the live session start;
      // merging it would stretch one session across a >gap hole
      Seq(Sessionize.Event(3, ts("2024-01-01 09:00:00"), 7L, "view", 5.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      // advance watermark far past everything to flush the live session
      Seq(Sessionize.Event(4, ts("2024-01-02 00:00:00"), 8L, "click", 0.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq(Sessionize.Event(5, ts("2024-01-03 00:00:00"), 8L, "click", 0.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val u7 = spark.table("sess_late")
        .filter(col("user_id") === 7L).collect()
      // two sessions: the historical single-event one and the 10:00 pair
      assert(u7.length == 2, u7.mkString(";"))
      assert(u7.exists(r => r.getAs[Long]("n_events") == 1L &&
        r.getAs[Double]("sum_value") == 5.0))
      assert(u7.exists(r => r.getAs[Long]("n_events") == 2L &&
        r.getAs[Double]("sum_value") == 3.0))
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions as watermark advances") {
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    events.take(2).toDF().write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Sessionize.Event]].schema)
      .parquet(dir).as[Sessionize.Event]
    val q = Sessionize.sessionsStream(src, gapSeconds = 1800, watermark = "1 minute")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // late batch far past the gap → watermark jumps, session 1 closes
      events.drop(2).toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      // one more batch to let the timeout fire after watermark update
      Seq(Sessionize.Event(9, ts("2024-01-01 15:00:00"), 3L, "click", 0.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val sessions = spark.table("sessions").collect()
      assert(sessions.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2L && r.getAs[Double]("sum_value") == 3.0))
    } finally q.stop()
  }
}
