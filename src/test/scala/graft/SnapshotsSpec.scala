package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The copy-on-write snapshot log's visibility contract (x24's
  * operator): versions are immutable, the log — not the directory
  * tree — defines what exists, and pinned reads are isolated from
  * later commits.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    dir
  }

  test("commit/read round-trip and latest resolution") {
    val dir = freshDir()
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val v2 = Snapshots.commit(Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), dir)
    assert(v1 == 1 && v2 == 2 && Snapshots.versions(spark, dir) == Seq(1, 2))
    assert(Snapshots.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a2"), (3L, "c")))
  }

  test("a pinned read is isolated from later commits") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, 10.0)).toDF("id", "bal"), dir)
    // capture the pinned plan BEFORE the refresh lands, execute after
    val pinned = Snapshots.read(spark, dir, Some(1))
    Snapshots.commit(Seq((1L, 99.0), (2L, 5.0)).toDF("id", "bal"), dir)
    assert(pinned.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0)), "v1 files must be untouched by the v2 commit")
    assert(Snapshots.read(spark, dir, Some(1)).count() == 1)
    assert(Snapshots.read(spark, dir).count() == 2)
  }

  test("the log, not the directory tree, defines visibility") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    // simulate a crashed half-commit: a v2 directory with data files
    // but NO log entry — it must be invisible garbage
    Seq((9L, "torn")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/v2")
    assert(Snapshots.versions(spark, dir) == Seq(1))
    assert(Snapshots.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L), "torn v2 must not be readable as latest")
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir, Some(2))
    }
  }

  test("a torn log rewrite (crash before rename) never loses committed versions") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "v"), dir)
    // simulate a commit that crashed mid-log-write: a partial temp
    // file exists, the rename never happened — the committed log must
    // be byte-for-byte intact and the next commit must just work
    val torn = java.nio.file.Paths.get(dir, "_versions.json.tmp")
    java.nio.file.Files.writeString(torn, "{\"version\":3,\"n_fi")
    assert(Snapshots.versions(spark, dir) == Seq(1, 2),
      "a torn temp file must not affect the committed log")
    assert(Snapshots.read(spark, dir).count() == 1)
    val v3 = Snapshots.commit(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(v3 == 3 && Snapshots.versions(spark, dir) == Seq(1, 2, 3),
      "the next commit must overwrite the abandoned temp and land v3")
    assert(Snapshots.read(spark, dir, Some(1)).count() == 1,
      "pre-crash versions stay readable after recovery")
  }

  test("single-writer contract: sequential commits from one writer never drop entries") {
    // the executable form of the documented contract: N sequential
    // commits (the supported concurrency level) all appear in the
    // log, each readable at its pinned version
    val dir = freshDir()
    (1 to 5).foreach { i =>
      Snapshots.commit(Seq((i.toLong, s"r$i")).toDF("id", "v"), dir)
    }
    assert(Snapshots.versions(spark, dir) == (1 to 5),
      "every sequential commit must have a log entry")
    (1 to 5).foreach { i =>
      assert(Snapshots.read(spark, dir, Some(i)).select("v").as[String].collect()
        .toSeq == Seq(s"r$i"))
    }
  }

  test("partitioned commit: hive layout round-trips, listing counts files per dir") {
    val dir = freshDir()
    val df = Seq((1L, "a", 0), (2L, "a", 0), (3L, "b", 1))
      .toDF("id", "grp", "bin")
    Snapshots.commit(df.repartition(col("grp"), col("bin")), dir,
      partitionBy = Seq("grp", "bin"))
    // partition columns restored on read, content identical
    val back = Snapshots.read(spark, dir)
      .select(col("id"), col("grp"), col("bin").cast("int"))
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a", 0), (2L, "a", 0), (3L, "b", 1)))
    // repartition-by-partition-cols colocates each value into ONE file
    val perDir = Snapshots.filesPerDir(spark, dir, 1)
    assert(perDir.size == 2 && perDir.values.forall(_ == 1),
      s"expected one data file per partition dir, got $perDir")
  }

  test("deletion vector: merge-on-read anti-join, base files untouched") {
    val dir = freshDir()
    Snapshots.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)).toDF("id", "grp", "n"), dir)
    val sig = Snapshots.fileSignature(spark, dir, 1)
    assert(sig.nonEmpty)
    Snapshots.commitDeletes(Seq(2L).toDF("id"), dir, base = 1)
    // the DV commit wrote only keys; the base's files are byte-identical
    assert(Snapshots.fileSignature(spark, dir, 1) == sig,
      "a deletion-vector commit must never touch the base's data files")
    assert(Snapshots.readResolved(spark, dir).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the pinned base still reads the FULL pre-delete state
    assert(Snapshots.readResolved(spark, dir, Some(1)).count() == 3)
  }

  test("partition overwrite: only the replaced partition changes, others ride the base") {
    val dir = freshDir()
    Snapshots.commit(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)).toDF("id", "grp", "n"), dir)
    val sig = Snapshots.fileSignature(spark, dir, 1)
    Snapshots.commitReplace(
      Seq((1L, "a", 100L), (3L, "a", 300L), (4L, "a", 400L)).toDF("id", "grp", "n"),
      dir, base = 1, pcol = "grp", pval = "a")
    assert(Snapshots.fileSignature(spark, dir, 1) == sig,
      "a partition overwrite must never touch the base's data files")
    // v2's directory holds exactly the replaced hive partition
    assert(Snapshots.filesPerDir(spark, dir, 2).keys.forall(_.contains("grp=a")))
    val got = Snapshots.readResolved(spark, dir)
      .select(col("id"), col("grp"), col("n")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 100L), (2L, "b", 20L), (3L, "a", 300L), (4L, "a", 400L)))
  }

  test("logical commits chain: a delete on top of a replace resolves recursively") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "n"), dir)
    Snapshots.commitReplace(Seq((1L, "a", 100L)).toDF("id", "grp", "n"),
      dir, base = 1, pcol = "grp", pval = "a")
    Snapshots.commitDeletes(Seq(2L).toDF("id"), dir, base = 2)
    assert(Snapshots.readResolved(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, 100L)))
    // every intermediate state stays pinned-readable
    assert(Snapshots.readResolved(spark, dir, Some(1)).count() == 2)
    assert(Snapshots.readResolved(spark, dir, Some(2))
      .filter(col("n") === 100L).count() == 1)
  }

  test("logical commits validate their base version") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] {
      Snapshots.commitDeletes(Seq(1L).toDF("id"), dir, base = 9)
    }
    intercept[IllegalArgumentException] {
      Snapshots.commitReplace(Seq((1L, "a")).toDF("id", "v"), dir,
        base = 9, pcol = "v", pval = "a")
    }
  }

  test("vacuum removes expired versions, keeps survivors readable, fails vacuumed reads loudly") {
    val dir = freshDir()
    (1 to 3).foreach { i =>
      Snapshots.commit(Seq((i.toLong, s"r$i")).toDF("id", "v"), dir)
    }
    val dropped = Snapshots.vacuum(spark, dir, keepLast = 2)
    assert(dropped == Seq(1))
    assert(Snapshots.versions(spark, dir) == Seq(2, 3))
    assert(!Snapshots.versionDirExists(spark, dir, 1),
      "the expired version's directory must be physically gone")
    assert(Snapshots.read(spark, dir, Some(2)).count() == 1)
    assert(Snapshots.read(spark, dir).select("v").as[String].collect().toSeq == Seq("r3"))
    intercept[IllegalArgumentException] { Snapshots.read(spark, dir, Some(1)) }
    // idempotent when nothing is expired
    assert(Snapshots.vacuum(spark, dir, keepLast = 2).isEmpty)
  }

  test("vacuum protects a kept logical version's base chain") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Snapshots.commitDeletes(Seq(2L).toDF("id"), dir, base = 1)
    // keepLast = 1 keeps only the DV — but its base must survive too,
    // or the DV's read path would dangle
    assert(Snapshots.vacuum(spark, dir, keepLast = 1).isEmpty)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
    assert(Snapshots.readResolved(spark, dir).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a data version on top releases the chain: vacuum now drops both
    Snapshots.commit(Seq((9L, "z")).toDF("id", "v"), dir)
    assert(Snapshots.vacuum(spark, dir, keepLast = 1).sorted == Seq(1, 2))
    assert(Snapshots.versions(spark, dir) == Seq(3))
    assert(!Snapshots.versionDirExists(spark, dir, 1) &&
      !Snapshots.versionDirExists(spark, dir, 2))
  }

  test("aligned reads serve old versions through the latest schema; drops/type-changes fail loudly") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "grp"), dir)
    Snapshots.commit(Seq((2L, "b", 5L)).toDF("id", "grp", "score"), dir)
    val v1 = Snapshots.readAligned(spark, dir, Some(1))
    assert(v1.columns.toSeq == Seq("id", "grp", "score"),
      "aligned read must carry the latest column set and order")
    val row = v1.collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(2),
      "the missing column must come back as a typed null")
    // latest aligned to itself is identity
    assert(Snapshots.readAligned(spark, dir).collect().head.getLong(2) == 5L)
    // a dropped column has no safe answer — loud failure
    Snapshots.commit(Seq((3L, "c")).toDF("id", "grp"), dir)
    intercept[IllegalArgumentException] {
      Snapshots.readAligned(spark, dir, Some(2)).collect()
    }
    // a type change is not additive evolution — loud failure
    val dir2 = freshDir()
    Snapshots.commit(Seq((1L, 5L)).toDF("id", "score"), dir2)
    Snapshots.commit(Seq((1L, "five")).toDF("id", "score"), dir2)
    intercept[IllegalArgumentException] {
      Snapshots.readAligned(spark, dir2, Some(1)).collect()
    }
  }

  test("write-audit-publish: staged versions are invisible until published, publication is metadata-only") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    val staged = Snapshots.commitStaged(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(staged == 2)
    // readers: latest and the published version list don't know v2
    assert(Snapshots.versions(spark, dir) == Seq(1))
    assert(Snapshots.read(spark, dir).select("v").as[String].collect().toSeq == Seq("a"))
    assert(Snapshots.readResolved(spark, dir).count() == 1)
    // the auditor: an explicit pinned read reaches the staged data
    assert(Snapshots.read(spark, dir, Some(2)).select("v").as[String]
      .collect().toSeq == Seq("b"))
    // a commit while v2 is staged must NOT reuse its number
    assert(Snapshots.commit(Seq((3L, "c")).toDF("id", "v"), dir) == 3)
    // publish flips visibility without touching a data file
    val sig = Snapshots.fileSignature(spark, dir, 2)
    Snapshots.publish(spark, dir, 2)
    assert(Snapshots.fileSignature(spark, dir, 2) == sig,
      "publication must be a metadata-only log rewrite")
    assert(Snapshots.versions(spark, dir) == Seq(1, 2, 3))
    // publishing a non-staged or unknown version fails loudly
    intercept[IllegalArgumentException] { Snapshots.publish(spark, dir, 1) }
    intercept[IllegalArgumentException] { Snapshots.publish(spark, dir, 9) }
  }

  test("epoch commits are idempotent: a replayed micro-batch never double-commits") {
    val dir = freshDir()
    assert(Snapshots.commitEpoch(Seq((1L, "a")).toDF("id", "v"), dir, epochId = 0) == Some(1))
    assert(Snapshots.commitEpoch(Seq((2L, "b")).toDF("id", "v"), dir, epochId = 1) == Some(2))
    // failure recovery replays epoch 1 — the log already carries it
    assert(Snapshots.commitEpoch(Seq((2L, "b")).toDF("id", "v"), dir, epochId = 1).isEmpty)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
    assert(Snapshots.read(spark, dir, Some(1)).count() +
      Snapshots.read(spark, dir, Some(2)).count() == 2)
  }

  test("stepChanges derives each commit kind's change rows from the log") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "grp", "n"), dir)
    Snapshots.commitDeletes(Seq(2L).toDF("id"), dir, base = 1)
    // replace grp=a on v2-state {1}: drop 1, add 4, so the step
    // carries one D and one I (and no U)
    Snapshots.commitReplace(Seq((4L, "a", 400L)).toDF("id", "grp", "n"),
      dir, base = 2, pcol = "grp", pval = "a")
    Snapshots.commit(Seq((3L, "b", 31L), (4L, "a", 400L)).toDF("id", "grp", "n"), dir)
    def ops(v: Int) = Snapshots.stepChanges(spark, dir, v, Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(ops(1) == Seq(("I", 1L), ("I", 2L), ("I", 3L)), "first data commit is all-inserts")
    assert(ops(2) == Seq(("D", 2L)), "a DV step is its keys as deletes")
    assert(ops(3) == Seq(("D", 1L), ("I", 4L)), "a replace step diffs only its partition")
    assert(ops(4) == Seq(("U", 3L)), "a data-over-history step is the honest full diff")
  }

  test("reading an empty or unknown table fails loudly") {
    val dir = freshDir()
    intercept[IllegalArgumentException] { Snapshots.read(spark, dir) }
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] { Snapshots.read(spark, dir, Some(7)) }
    Snapshots.drop(spark, dir)
    assert(Snapshots.versions(spark, dir).isEmpty)
  }
}
