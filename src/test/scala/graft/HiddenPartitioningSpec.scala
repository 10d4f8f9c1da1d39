package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{HiddenPartitioning => HP}
import graft.sources.Snapshots

/** Hidden partitioning's contract: raw-column predicates prune the
  * transform-partitioned layout, translations are implications only
  * (never a dropped row), and a fresh session recovers the spec from
  * the table's own metadata. */
class HiddenPartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"hp$tag").toString + "/t"
    val rows = (0 until 400).map { i =>
      (i.toLong, (i % 37).toLong,
        java.sql.Timestamp.valueOf(f"199${6 + i % 2}-${1 + i % 12}%02d-15 00:00:00"),
        i * 1.5)
    }
    HP.write(spark, rows.toDF("id", "k", "ts", "v"), dir,
      Seq(HP.Month("ts"), HP.Bucket("k", 4)))
    dir
  }

  test("range + equality predicates on raw columns prune the layout") {
    val dir = fixture("a")
    val t = HP.table(spark, dir)
    assert(!t.columns.exists(_.startsWith("_p_")), "partition columns stay hidden")
    val q = t.filter($"ts" >= lit("1996-03-01").cast("timestamp") &&
      $"ts" <= lit("1996-05-31").cast("timestamp") && $"k" === 7L)
    val scanned = HP.partitionsScanned(q)
    val total = HP.partitionsScanned(t)
    assert(scanned <= 3, s"3 months x 1 bucket, got $scanned")
    assert(total >= 24, s"24 month x bucket directories expected, got $total")
    // no dropped rows: the pruned answer is the brute-force answer
    HP.remove(dir)
    val want = Snapshots.read(spark, dir)
      .filter($"ts" >= lit("1996-03-01").cast("timestamp") &&
        $"ts" <= lit("1996-05-31").cast("timestamp") && $"k" === 7L)
      .select($"id").as[Long].collect().toSet
    assert(q.select($"id").as[Long].collect().toSet == want)
  }

  test("IN-lists translate to bucket lists; untranslatable shapes widen, never wrong") {
    val dir = fixture("b")
    val t = HP.table(spark, dir)
    val total = HP.partitionsScanned(t)
    val inQ = t.filter($"k".isin(3L, 5L))
    assert(HP.partitionsScanned(inQ) < total, "IN must prune buckets")
    // a bucket RANGE is meaningless — must not prune (and must not fire)
    val rangeQ = t.filter($"k" > 30L)
    assert(HP.partitionsScanned(rangeQ) == total,
      "range on a bucket column has no implication — full listing")
    assert(rangeQ.count() == Snapshots.read(spark, dir).filter($"k" > 30L).count())
    HP.remove(dir)
  }

  test("x94: runtime dim keys prune directories, including the InSet spelling (>10 keys)") {
    val dir = fixture("dpp")
    val t = HP.table(spark, dir)
    val total = HP.partitionsScanned(t)
    // a dim-sized key frame known only at run time — 2 keys stay `In`
    val dim2 = Seq(3L, 5L).toDF("k")
    val q2 = HP.pruneByDim(t, "k", dim2)
    assert(HP.partitionsScanned(q2) < total, "2 runtime keys must prune")
    // >10 keys: OptimizeIn rewrites the predicate to InSet before the
    // rule sees it — the InSet arm must still translate. 12 keys all
    // ≡ 1 (mod 4 buckets is not guaranteed — use keys hashing into a
    // strict bucket subset is data-dependent, so assert on fewer-
    // than-total rather than an exact count)
    val dim12 = (0 until 12).map(i => (i * 37 + 3).toLong).toDF("k")
    val q12 = HP.pruneByDim(t, "k", dim12)
    val rows12 = q12.select($"id").as[Long].collect().toSet
    HP.remove(dir)
    val want12 = Snapshots.read(spark, dir)
      .filter($"k".isin((0 until 12).map(i => (i * 37 + 3).toLong): _*))
      .select($"id").as[Long].collect().toSet
    assert(rows12 == want12, "pruning must never drop a row (InSet arm)")
  }

  test("x94: pruneByDim refuses a key side beyond the dim-sized cap") {
    val dir = fixture("dppcap")
    val t = HP.table(spark, dir)
    intercept[IllegalArgumentException] {
      HP.pruneByDim(t, "k", (0 until 50).map(_.toLong).toDF("k"), maxKeys = 10)
    }
    HP.remove(dir)
  }

  test("a fresh registry recovers the spec from the table's sidecar metadata") {
    val dir = fixture("c")
    HP.remove(dir) // simulate a new session/process
    val t = HP.table(spark, dir) // re-registers from _hidden_spec.json
    val q = t.filter($"ts" === lit("1996-04-15").cast("timestamp"))
    assert(HP.partitionsScanned(q) <= 1, "month equality must prune to one month")
    HP.remove(dir)
  }

  test("a query that already names the partition column is left alone") {
    val dir = fixture("d")
    val raw = Snapshots.read(spark, dir) // layout-aware reader
    val q = raw.filter(col("_p_ts_m") === lit(23955))
    // no double-injection, still prunes via the explicit predicate
    assert(HP.partitionsScanned(q) <= 4)
    HP.remove(dir)
  }

  test("a table whose path merely extends another's name is never cross-served") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("hpx").toString
    val rows = (0 until 64).map(i => (i.toLong, i.toLong % 16))
    // same source column, DIFFERENT bucket counts — t's spec applied
    // to t2 would prune directories holding matching rows
    HP.write(spark, rows.toDF("id", "k"), s"$root/t", Seq(HP.Bucket("k", 8)))
    HP.write(spark, rows.toDF("id", "k"), s"$root/t2", Seq(HP.Bucket("k", 4)))
    val q = HP.table(spark, s"$root/t2").filter($"k" === 7L)
    assert(q.select($"id").as[Long].collect().toSet ==
      (0 until 64).filter(_ % 16 == 7).map(_.toLong).toSet,
      "t2 must be pruned with ITS transform, never t's")
    HP.remove(s"$root/t"); HP.remove(s"$root/t2")
  }

  test("commuted literal-first range spellings still prune") {
    import spark.implicits._
    val dir = fixture("f")
    val t = HP.table(spark, dir)
    val q = t.filter(lit("1996-03-01").cast("timestamp") <= $"ts" &&
      lit("1996-03-31").cast("timestamp") >= $"ts")
    assert(HP.partitionsScanned(q) <= 4,
      "lit <= col must translate like col >= lit")
    HP.remove(dir)
  }

  test("an IN-list of dates on a Month-transformed column prunes to those months") {
    val dir = fixture("g")
    val t = HP.table(spark, dir)
    val total = HP.partitionsScanned(t)
    val q = t.filter($"ts".isin(
      java.sql.Timestamp.valueOf("1996-03-15 00:00:00"),
      java.sql.Timestamp.valueOf("1997-06-15 00:00:00")))
    val scanned = HP.partitionsScanned(q)
    assert(scanned <= 8, s"2 months x 4 buckets expected, got $scanned")
    assert(scanned < total)
    // no dropped rows: the pruned answer is the brute-force answer
    HP.remove(dir)
    val want = Snapshots.read(spark, dir)
      .filter($"ts".isin(
        java.sql.Timestamp.valueOf("1996-03-15 00:00:00"),
        java.sql.Timestamp.valueOf("1997-06-15 00:00:00")))
      .select($"id").as[Long].collect().toSet
    assert(q.select($"id").as[Long].collect().toSet == want)
  }

  test("Day transform: ranges, equality and IN-lists prune to day directories") {
    val dir = java.nio.file.Files.createTempDirectory("hpday").toString + "/t"
    val rows = (0 until 240).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(f"1996-03-${1 + i % 30}%02d 12:00:00"),
        i * 2.0)
    }
    HP.write(spark, rows.toDF("id", "ts", "v"), dir, Seq(HP.Day("ts")))
    val t = HP.table(spark, dir)
    val total = HP.partitionsScanned(t)
    assert(total >= 30, s"one directory per day expected, got $total")
    val rangeQ = t.filter($"ts" >= lit("1996-03-10").cast("timestamp") &&
      $"ts" < lit("1996-03-13").cast("timestamp"))
    assert(HP.partitionsScanned(rangeQ) <= 4, "3-day range must prune to <=4 days")
    val inQ = t.filter($"ts".isin(
      java.sql.Timestamp.valueOf("1996-03-05 12:00:00"),
      java.sql.Timestamp.valueOf("1996-03-25 12:00:00")))
    assert(HP.partitionsScanned(inQ) <= 2, "2-day IN must prune to 2 days")
    // exactness: the residual keeps strict/equality semantics
    HP.remove(dir)
    val raw = Snapshots.read(spark, dir)
    assert(rangeQ.select($"id").as[Long].collect().toSet ==
      raw.filter($"ts" >= lit("1996-03-10").cast("timestamp") &&
        $"ts" < lit("1996-03-13").cast("timestamp"))
        .select($"id").as[Long].collect().toSet)
    assert(inQ.select($"id").as[Long].collect().toSet ==
      raw.filter($"ts".isin(
        java.sql.Timestamp.valueOf("1996-03-05 12:00:00"),
        java.sql.Timestamp.valueOf("1996-03-25 12:00:00")))
        .select($"id").as[Long].collect().toSet)
  }

  test("a relocated copy whose path embeds a registered dir never borrows its spec") {
    val dirA = java.nio.file.Files.createTempDirectory("hpcovA").toString + "/t"
    val rows = (0 until 64).map(i => (i.toLong, i.toLong % 16))
    HP.write(spark, rows.toDF("id", "k"), dirA, Seq(HP.Bucket("k", 8)))
    // the "backup" path embeds dirA's ABSOLUTE path as a trailing
    // segment run — written under an older spec (different modulus),
    // its own registration then lost (new process, no sidecar read)
    val dirB = java.nio.file.Files.createTempDirectory("hpcovB").toString + dirA
    HP.write(spark, rows.toDF("id", "k"), dirB, Seq(HP.Bucket("k", 4)))
    HP.remove(dirB)
    val q = Snapshots.read(spark, dirB).filter($"k" === 7L)
    assert(HP.partitionsScanned(q) ==
      HP.partitionsScanned(Snapshots.read(spark, dirB)),
      "no spec covers dirB — nothing may inject a borrowed modulus")
    assert(q.select($"id").as[Long].collect().toSet ==
      (0 until 64).filter(_ % 16 == 7).map(_.toLong).toSet)
    HP.remove(dirA)
  }

  test("strict bounds map to inclusive month bounds (over-select, never under)") {
    val dir = fixture("e")
    val t = HP.table(spark, dir)
    val q = t.filter($"ts" > lit("1996-03-20").cast("timestamp") &&
      $"ts" < lit("1996-04-10").cast("timestamp"))
    HP.remove(dir)
    val want = Snapshots.read(spark, dir)
      .filter($"ts" > lit("1996-03-20").cast("timestamp") &&
        $"ts" < lit("1996-04-10").cast("timestamp"))
      .select($"id").as[Long].collect().toSet
    assert(q.select($"id").as[Long].collect().toSet == want,
      "the residual predicate must keep strict-bound semantics exact")
  }

  test("a legacy pre-suffix bucket layout still hides its column and prunes") {
    // a table written when Bucket's column was `_p_<src>_b` (no n
    // suffix): its sidecar spec parses to Bucket(k,4) whose current
    // partCol is `_p_k_b4` — absent from the relation. The legacy
    // fallback must (a) keep `_p_k_b` out of the user-visible schema
    // and (b) keep pruning on it, instead of silently disabling both.
    val dir = java.nio.file.Files.createTempDirectory("hpleg").toString + "/t"
    val rows = (0 until 64).map(i => (i.toLong, (i % 16).toLong)).toDF("id", "k")
      .withColumn("_p_k_b", pmod(hash($"k"), lit(4)))
    Snapshots.commit(rows.repartition($"_p_k_b"), dir,
      partitionBy = Seq("_p_k_b"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_hidden_spec.json"),
      """[{"kind":"bucket","source":"k","n":4}]""".getBytes("UTF-8"))
    val t = HP.table(spark, dir)
    assert(!t.columns.contains("_p_k_b"),
      "the legacy partition column must stay hidden")
    val total = HP.partitionsScanned(t)
    val q = t.filter($"k" === 7L)
    assert(HP.partitionsScanned(q) < total,
      "equality on the raw column must still prune the legacy layout")
    assert(q.select($"id").as[Long].collect().toSet ==
      (0 until 64).filter(_ % 16 == 7).map(_.toLong).toSet)
    HP.remove(dir)
  }

  test("an untrusted spec never translates against a legacy bucket column") {
    // The legacy column name does not encode the bucket modulus, so a
    // spec that did NOT come from the table's own sidecar could carry
    // a different n than the layout was written with — injecting its
    // pmod(hash(lit), n) would then select the wrong directory and
    // silently DROP matching rows. Scenario: a legacy table (written
    // with n=4) lives under a directory whose spec was registered by
    // a fresh write() with n=8; path coverage offers the parent's
    // spec to the child's scan. The guard must refuse the legacy
    // column (residual-only, full listing) instead of under-selecting.
    val base = java.nio.file.Files.createTempDirectory("hpmix").toString
    val legacyDir = s"$base/t"
    val rows = (0 until 64).map(i => (i.toLong, (i % 16).toLong)).toDF("id", "k")
      .withColumn("_p_k_b", pmod(hash($"k"), lit(4)))
    Snapshots.commit(rows.repartition($"_p_k_b"), legacyDir,
      partitionBy = Seq("_p_k_b"))
    // registers Spec(Bucket(k, 8), legacyTrusted = false) covering base/
    HP.write(spark, Seq((999L, 999L)).toDF("id", "k"), base,
      Seq(HP.Bucket("k", 8)))
    try {
      val t = Snapshots.read(spark, legacyDir).drop("_p_k_b8")
      val q = t.filter($"k" === 7L)
      assert(q.select($"id").as[Long].collect().toSet ==
        (0 until 64).filter(_ % 16 == 7).map(_.toLong).toSet,
        "a mismatched-n spec must never drop rows via the legacy column")
      assert(HP.partitionsScanned(q) == HP.partitionsScanned(t),
        "the untrusted spec must not prune the legacy layout at all")
    } finally HP.remove(base)
  }
}
