package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture's on-disk timestamp encoding is owned by the driver
  * and has changed once already (round 4: TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
  * TIMESTAMP_NTZ, breaking the two `unix_micros` call sites). These tests
  * make the loader contract explicit so a fixture regeneration surfaces
  * here — in `sbt test` — and never first in the driver's bench.
  */
class FixtureEncodingSpec extends SparkSpec {

  test("Tables.load normalizes events.ts to TimestampType in every fixture dir") {
    for (dir <- Seq(Sf0001, Sf001, "/root/testdata/sf0.1")) {
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir/events.parquet: ts loaded as ${df.schema("ts").dataType}; " +
          "add the new encoding to Tables.load")
      // and the normalized column is actually computable downstream
      assert(df.select(unix_micros(col("ts"))).limit(1).count() == 1)
    }
  }

  test("loader handles all three historical ts encodings identically") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("enc").toString
    val micros = 1704103200000000L // 2024-01-01 10:00:00 UTC
    val row = (1L, 7L, "click", 1.5, "{}")

    // (a) legacy TIMESTAMP(NANOS): Spark cannot write nanos parquet, but
    // under `nanosAsLong` the loader sees a LongType column — write the
    // long directly to exercise that branch byte-for-byte.
    Seq((row._1, micros * 1000L, row._2, row._3, row._4, row._5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")

    // (b) current fixtures: micros NTZ (isAdjustedToUTC=false)
    Seq((row._1, java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, 0, java.time.ZoneOffset.UTC),
        row._2, row._3, row._4, row._5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")

    // (c) derived copies (ScaleSmoke etc.): plain micros LTZ
    Seq((row._1, new java.sql.Timestamp(micros / 1000L),
        row._2, row._3, row._4, row._5))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/ltz/events.parquet")

    val loaded = Seq("nanos", "ntz", "ltz").map { enc =>
      val df = Tables.load(spark, s"$base/$enc", "events")
      assert(df.schema("ts").dataType == TimestampType, s"encoding $enc")
      enc -> df.select(unix_micros(col("ts"))).as[Long].head()
    }.toMap
    assert(loaded.values.toSet == Set(micros),
      s"encodings disagree after normalization: $loaded")
  }
}
