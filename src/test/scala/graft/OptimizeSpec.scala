package graft

import org.apache.spark.sql.functions._
import graft.ops.Optimize
import graft.sources.Snapshots

/** ops.Optimize (x85/x86's engine): whole-table layout rewrites as
  * dataChange=false layout versions — rows preserved exactly, the
  * change feed quiet, freshness re-stamped, OCC-guarded. */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) = {
    val dir = s"target/optspec_${tag}_${System.nanoTime()}"
    Snapshots.drop(spark, dir)
    dir
  }

  test("compact collapses the file count and preserves rows + change feed silence") {
    val dir = freshDir("compact")
    val df = (1 to 400).map(i => (i.toLong, i % 13)).toDF("id", "g")
    Snapshots.commit(df.repartition(col("g")), dir, partitionBy = Seq("g"))
    assert(Snapshots.filesPerDir(spark, dir, 1).values.sum >= 13)
    val v = Optimize.compact(spark, dir, 3)
    assert(v == 2)
    assert(Snapshots.filesPerDir(spark, dir, 2).values.sum <= 3)
    // same logical rows, exactly
    assert(Snapshots.readResolved(spark, dir).select(sum($"id")).head.getLong(0)
      == 400L * 401 / 2)
    assert(Snapshots.readResolved(spark, dir).count() == 400)
    // a layout commit feeds NOTHING downstream
    assert(Snapshots.stepChanges(spark, dir, 2, Seq("id")).count() == 0)
  }

  test("compact is OCC-guarded against a version landing between read and rewrite") {
    val dir = freshDir("occ")
    Snapshots.commit((1 to 10).toDF("id"), dir)
    Snapshots.commit((1 to 20).toDF("id"), dir)
    // a layout rewrite planned against v1 must not clobber v2's rows
    assertThrows[graft.sources.ConcurrentCommitException] {
      Snapshots.commitLayout((1 to 10).toDF("id").repartition(1), dir, base = 1)
    }
  }

  test("zorder clusters the box query into a prunable subset of slices") {
    val dir = freshDir("zorder")
    // a 64x64 grid: equi-width buckets and rank slices are exact
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong * 64 + y, x, y))).toDF("id", "x", "y")
    Snapshots.commit(grid, dir)
    val v = Optimize.zorder(spark, dir, Seq("x", "y"), 16)
    assert(v == 2)
    val files = Snapshots.filesPerDir(spark, dir, 2)
    assert(files.size == 16 && files.values.forall(_ == 1),
      s"want 16 one-file slices, got $files")
    // `_zfile` is write-only: the logical read never sees it…
    assert(!Snapshots.read(spark, dir, Some(2)).columns.contains("_zfile"))
    assert(Snapshots.readResolved(spark, dir).columns.toSeq ==
      Seq("id", "x", "y"))
    // …and the layout-audit read serves it for zone maps: a 16x16
    // corner box must NOT touch every slice (the point of clustering)
    val zones = Snapshots.readLayout(spark, dir, 2)
      .groupBy($"_zfile")
      .agg(min($"x").as("xl"), max($"x").as("xh"),
        min($"y").as("yl"), max($"y").as("yh"))
      .collect()
    val touched = zones.count(r => r.getAs[Int]("xh") >= 0 &&
      r.getAs[Int]("xl") <= 15 && r.getAs[Int]("yh") >= 0 &&
      r.getAs[Int]("yl") <= 15)
    assert(touched < 16, s"corner box touched all $touched slices")
    // rows ride through the rewrite untouched
    assert(Snapshots.readResolved(spark, dir).count() == 64 * 64)
    assert(Snapshots.stepChanges(spark, dir, 2, Seq("id")).count() == 0)
  }

  test("zorder build is deterministic across runs") {
    def layout(): Seq[(Int, Long)] = {
      val dir = freshDir("det")
      Snapshots.commit(
        (1 to 500).map(i => (i.toLong, i % 37, (i * 7) % 23)).toDF("id", "a", "b"),
        dir)
      Optimize.zorder(spark, dir, Seq("a", "b"), 8)
      Snapshots.readLayout(spark, dir, 2)
        .groupBy($"_zfile").agg(sum($"id").as("s"))
        .collect().map(r => (r.getAs[Int]("_zfile"), r.getAs[Long]("s")))
        .sortBy(_._1).toSeq
    }
    assert(layout() == layout())
  }

  test("DML composes after OPTIMIZE ZORDER: INSERT INTO / MERGE still read") {
    val dir = freshDir("compose")
    Snapshots.commit(
      (1 to 100).map(i => (i.toLong, i % 7, (i * 3) % 11)).toDF("id", "a", "b"),
      dir)
    Optimize.zorder(spark, dir, Seq("a", "b"), 4)
    // an append written with the ORIGINAL schema (no _zfile) must
    // resolve — the regression the write-only contract exists for
    val v3 = Snapshots.commitAppend(
      Seq((101L, 1, 1)).toDF("id", "a", "b"), dir,
      base = Snapshots.versions(spark, dir).last)
    assert(v3 == 3)
    val resolved = Snapshots.readResolved(spark, dir)
    assert(resolved.columns.toSeq == Seq("id", "a", "b"))
    assert(resolved.count() == 101)
    // a MERGE over the zordered table works too (reads resolved state)
    val merged = graft.ops.Merge.mergeInto(
      Snapshots.readResolved(spark, dir),
      Seq((101L, 9, 9), (102L, 2, 2)).toDF("id", "a", "b"), "id",
      matchedUpdate = (_, _) => lit(true),
      notMatchedInsert = _ => lit(true))
    Snapshots.commit(merged, dir,
      expectedVersion = Snapshots.versions(spark, dir).last)
    assert(Snapshots.readResolved(spark, dir).count() == 102)
    assert(Snapshots.readResolved(spark, dir)
      .filter($"id" === 101L).head.getAs[Int]("a") == 9)
  }

  test("zorder refuses non-numeric columns loudly") {
    val dir = freshDir("refuse")
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    assertThrows[IllegalArgumentException] {
      Optimize.zorder(spark, dir, Seq("s"), 4)
    }
  }
}
