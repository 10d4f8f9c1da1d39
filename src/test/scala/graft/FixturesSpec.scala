package graft

import org.apache.spark.sql.functions._
import graft.queries.Fixtures
import graft.sources.Snapshots

/** The cross-run fixture cache (queries.Fixtures) + its Snapshots
  * primitive (dropVersionsAbove): reuse resets exactly to the
  * as-built ceiling, staleness/mutation force a rebuild, and the
  * truncation never touches data a kept version needs. */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) = {
    val dir = s"target/fixspec_${tag}_${System.nanoTime()}"
    Snapshots.drop(spark, dir)
    dir
  }
  private def frame(n: Int) = (1 to n).toDF("id")

  test("ensureAt builds once, then reuses without re-running build") {
    val dir = freshDir("build_once")
    var builds = 0
    def go() = Fixtures.ensureAt(spark, dir, "fp-a") { fd =>
      builds += 1; Snapshots.commit(frame(5), fd); ()
    }
    go(); go()
    assert(builds == 1)
    assert(Snapshots.versions(spark, dir) == Seq(1))
    assert(Snapshots.read(spark, dir).count() == 5)
  }

  test("reuse truncates the query's own mutation commits back to the ceiling") {
    val dir = freshDir("truncate")
    var builds = 0
    def go() = Fixtures.ensureAt(spark, dir, "fp-b") { fd =>
      builds += 1
      Snapshots.commit(frame(3), fd); Snapshots.commit(frame(4), fd); ()
    }
    go()
    // the "query" mutates on top: a data commit and a restore entry
    Snapshots.commit(frame(9), dir)
    Snapshots.commitRestore(spark, dir, 1)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2, 3, 4))
    go()
    assert(builds == 1) // reused
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
    // truncating the restore entry must not have deleted v1's data
    assert(Snapshots.read(spark, dir, Some(1)).count() == 3)
    assert(Snapshots.read(spark, dir, Some(2)).count() == 4)
  }

  test("fingerprint change and in-place version loss both rebuild") {
    val dir = freshDir("stale")
    var builds = 0
    def go(fp: String, rows: Int) = Fixtures.ensureAt(spark, dir, fp) { fd =>
      builds += 1
      Snapshots.commit(frame(rows), fd); Snapshots.commit(frame(rows), fd); ()
    }
    go("fp-v1", 3)
    go("fp-v2", 7) // knob changed → rebuild
    assert(builds == 2)
    assert(Snapshots.read(spark, dir, Some(1)).count() == 7)
    // vacuum removes v1 IN PLACE — the (1 to max) reuse check fails
    Snapshots.vacuum(spark, dir, keepLast = 1)
    go("fp-v2", 7)
    assert(builds == 3)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
  }

  test("checkout clones by file copy; mutations stay private to the clone") {
    val tmpl = freshDir("tmpl")
    Fixtures.ensureAt(spark, tmpl, "fp-t") { fd =>
      Snapshots.commit(frame(6), fd); ()
    }
    val work = freshDir("work")
    Fixtures.checkout(spark, tmpl, work)
    assert(Snapshots.read(spark, work).count() == 6)
    // the clone is a working table, not a cached fixture: no sidecar
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(work, "_fixture.json")))
    Snapshots.purgeKeys(spark, work, Seq(1, 2).toDF("id"))
    assert(Snapshots.read(spark, work).count() == 4)
    assert(Snapshots.read(spark, tmpl).count() == 6) // template pristine
  }

  test("ensureVia builds against the work dirs once, then restores pristine copies") {
    val t = System.nanoTime()
    val (w1, w2, tmpl) = (s"target/fixspec_via_a_$t", s"target/fixspec_via_b_$t",
      s"target/fixspec_via_t_$t")
    var builds = 0
    def go() = Fixtures.ensureVia(spark, tmpl, "fp-via", Seq(w1, w2)) {
      builds += 1
      Snapshots.commit(frame(4), w1)
      Snapshots.commit(frame(7), w2)
    }
    go()
    assert(builds == 1)
    // the "query" mutates both stores in place
    Snapshots.purgeKeys(spark, w1, frame(2))
    Snapshots.commit(frame(1), w2)
    assert(Snapshots.read(spark, w1).count() == 2)
    go() // checkout restores the pristine copies without rebuilding
    assert(builds == 1)
    assert(Snapshots.read(spark, w1).count() == 4)
    assert(Snapshots.versions(spark, w2) == Seq(1))
    assert(Snapshots.read(spark, w2).count() == 7)
    Seq(w1, w2, tmpl).foreach(Snapshots.drop(spark, _))
  }

  test("a regenerated source corpus changes the fingerprint (dirSig)") {
    val dir = freshDir("dirsig")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val f = java.nio.file.Paths.get(dir, "t.parquet")
    java.nio.file.Files.writeString(f, "aaaa")
    val sig1 = Fixtures.dirSig(dir)
    java.nio.file.Files.writeString(f, "aaaabbbb") // regenerated: new size
    assert(Fixtures.dirSig(dir) != sig1)
    assert(Fixtures.fp(dir, "x") != Fixtures.fp(dir + "_other", "x"))
    Snapshots.drop(spark, dir)
  }

  test("dropVersionsAbove refuses a checkpoint above the ceiling") {
    val dir = freshDir("ckpt")
    Snapshots.commit(frame(1), dir); Snapshots.commit(frame(2), dir)
    Snapshots.checkpointLog(spark, dir) // checkpoint at v2
    assertThrows[IllegalArgumentException] {
      Snapshots.dropVersionsAbove(spark, dir, 1)
    }
    // at-or-below the ceiling is fine (nothing above to drop)
    assert(Snapshots.dropVersionsAbove(spark, dir, 2).isEmpty)
  }
}
