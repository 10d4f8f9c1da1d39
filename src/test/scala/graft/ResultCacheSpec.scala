package graft

import org.apache.spark.sql.functions._
import graft.ops.ResultCache
import graft.sources.Snapshots

/** x46's correctness backbone: hit/miss is decided by (query id,
  * exact input versions) alone, a hit never touches the input, and a
  * version bump is the entire invalidation story. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("rcache").toString + "/t"

  test("miss computes and stores; replay hits with identical content") {
    val (src, cache) = (freshDir(), freshDir())
    Snapshots.commit(Seq((1L, 10L), (2L, 5L)).toDF("k", "n"), src)
    def agg = Snapshots.read(spark, src, Some(1))
      .agg(sum(col("n")).cast("long").as("total"))
    val (r1, hit1) = ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1), agg)
    val (r2, hit2) = ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1), agg)
    assert(!hit1 && hit2)
    assert(r1.head.getLong(0) == 15L && r2.head.getLong(0) == 15L)
  }

  test("a hit never touches the input: serve after the input is DELETED") {
    val (src, cache) = (freshDir(), freshDir())
    Snapshots.commit(Seq((1L, 7L)).toDF("k", "n"), src)
    ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1),
      Snapshots.read(spark, src).agg(sum(col("n")).cast("long").as("total")))
    Snapshots.drop(spark, src) // the input table no longer exists at all
    val (served, hit) = ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1),
      sys.error("cache hit must not evaluate the compute thunk"))
    assert(hit && served.head.getLong(0) == 7L)
  }

  test("fingerprint sensitivity: version bump and query id both miss") {
    val (src, cache) = (freshDir(), freshDir())
    Snapshots.commit(Seq((1L, 1L)).toDF("k", "n"), src)
    Snapshots.commit(Seq((1L, 1L), (2L, 2L)).toDF("k", "n"), src)
    def aggOf(v: Int) = Snapshots.read(spark, src, Some(v))
      .agg(sum(col("n")).cast("long").as("total"))
    val (a, h1) = ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1), aggOf(1))
    val (b, h2) = ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 2), aggOf(2))
    val (c, h3) = ResultCache.getOrCompute(spark, cache, "q2", Seq(src -> 2), aggOf(2))
    assert(!h1 && !h2 && !h3, "each distinct fingerprint is its own entry")
    assert(a.head.getLong(0) == 1L && b.head.getLong(0) == 3L && c.head.getLong(0) == 3L)
    // and all three now hit independently
    assert(ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1),
      sys.error("hit")) ._2)
    assert(ResultCache.getOrCompute(spark, cache, "q2", Seq(src -> 2),
      sys.error("hit"))._2)
  }

  test("a racing input commit during materialization cannot publish a stale-keyed result") {
    val (src, cache) = (freshDir(), freshDir())
    Snapshots.commit(Seq((1L, 10L)).toDF("k", "n"), src) // v1: total 10
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("n")).cast("long").as("total"))
    val (r, hit, pinned) =
      ResultCache.getOrComputeLatest(spark, cache, "q", Seq(src)) { frames =>
        // the race: another writer lands v2 WHILE the result materializes
        Snapshots.commit(Seq((1L, 10L), (2L, 90L)).toDF("k", "n"), src)
        total(frames.head)
      }
    assert(!hit && pinned == Seq(src -> 1),
      "the pin must be the version read, taken before the race")
    assert(r.head.getLong(0) == 10L,
      "the result must be computed from the PINNED v1, not the racer's v2")
    // latest is now v2: the next read must MISS — never a stale hit
    // serving v1's numbers under v2's key
    val (r2, hit2, p2) =
      ResultCache.getOrComputeLatest(spark, cache, "q", Seq(src))(f => total(f.head))
    assert(!hit2 && p2 == Seq(src -> 2) && r2.head.getLong(0) == 100L)
    // and the raced entry is a correctly OLD-keyed hit, not corrupt
    val (r3, hit3) = ResultCache.getOrCompute(spark, cache, "q", Seq(src -> 1),
      sys.error("the v1 entry must hit without recomputing"))
    assert(hit3 && r3.head.getLong(0) == 10L)
  }

  test("duplicate keys are benign; lookup takes the newest") {
    val (cache) = freshDir()
    Snapshots.commitKeyed(Seq((1L, "old")).toDF("k", "v"), cache, "fp")
    val v2 = Snapshots.commitKeyed(Seq((1L, "new")).toDF("k", "v"), cache, "fp")
    assert(Snapshots.findKeyed(spark, cache, "fp").contains(v2))
    assert(Snapshots.findKeyed(spark, cache, "nope").isEmpty)
  }
}
