package graft

import org.apache.spark.sql.functions._
import graft.ops.{Purge, ResultCache}
import graft.plans.{MatView, MvCatalog}
import graft.sources.Snapshots

/** x50's erasure contract AND x76's propagation layer: after
  * purgeKeys no version — pinned, resolved, or the deletes-version's
  * own key set — can produce the purged keys; after Purge.purge the
  * same holds for every registered DERIVED artifact, each class
  * erased the class-appropriate way and proven by the value-level
  * exposure scan over the artifact's full version history. */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("purge").toString + "/t"

  test("purge erases the key from every version including the DV's key set") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "a"), (97L, "b"), (3L, "c")).toDF("k", "v"), dir)
    Snapshots.commitDeletes(Seq(Tuple1(1L), Tuple1(97L)).toDF("k"), dir, base = 1)
    Snapshots.commit(Seq((97L, "b2"), (4L, "d")).toDF("k", "v"), dir)
    val purged = Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k"))
    assert(purged == Seq(1, 2, 3), "all three versions contain the key column")
    // v1 pinned: 97 gone, others intact
    assert(Snapshots.read(spark, dir, Some(1)).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
    // the DV's raw key set no longer NAMES the purged user
    assert(Snapshots.read(spark, dir, Some(2)).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    // resolved v2: base minus DV = {3}
    assert(Snapshots.readResolved(spark, dir, Some(2)).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    assert(Snapshots.read(spark, dir, Some(3)).collect().map(_.getLong(0))
      .toSeq == Seq(4L))
  }

  test("purge reaches append versions AND staged DV key sets (the x58 chain)") {
    val dir = freshDir()
    // the merge-on-read shape: data v1, STAGED mask DV v2, append v3
    Snapshots.commit(Seq((1L, "a"), (97L, "b")).toDF("k", "v"), dir)
    val dv = Snapshots.commitDeletes(Seq(Tuple1(97L)).toDF("k"), dir,
      base = 1, staged = true)
    Snapshots.commitAppend(Seq((97L, "b2"), (4L, "d")).toDF("k", "v"),
      dir, base = dv)
    val purged = Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k"))
    assert(purged == Seq(1, 2, 3),
      "the staged DV and the append hold the key column too")
    // the appended rows no longer carry the purged user …
    assert(Snapshots.read(spark, dir, Some(3)).collect().map(_.getLong(0))
      .toSeq == Seq(4L))
    // … the STAGED DV no longer names them (erasure covers staged
    // ghosts — they are invisible, not gone) …
    assert(Snapshots.read(spark, dir, Some(2)).count() == 0)
    // … and the resolved merge state is the survivors only
    assert(Snapshots.readResolved(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 4L))
  }

  test("partitioned versions are rewritten in their own layout") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "x"), (2L, "x"), (97L, "y")).toDF("k", "pv"),
      dir, partitionBy = Seq("pv"))
    Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k"))
    val dirs = Snapshots.filesPerDir(spark, dir, 1).keys
    assert(dirs.nonEmpty && dirs.forall(_.contains("pv=")),
      s"rewrite must keep the hive layout, got $dirs")
    assert(Snapshots.read(spark, dir, Some(1)).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
  }

  test("versions without the key column and clones are skipped untouched") {
    val (dir, cloneDir) = (freshDir(), freshDir())
    Snapshots.commit(Seq((97L, "gone")).toDF("k", "v"), dir)
    Snapshots.commit(Seq(("statsrow", 5L)).toDF("name", "n"), dir) // no k column
    Snapshots.commitClone(spark, cloneDir, dir, 1)
    val sigBefore = Snapshots.fileSignature(spark, dir, 2)
    assert(Snapshots.purgeKeys(spark, dir, Seq(Tuple1(97L)).toDF("k")) == Seq(1))
    assert(Snapshots.fileSignature(spark, dir, 2) == sigBefore,
      "a version that cannot contain the key must not be rewritten")
    assert(Snapshots.read(spark, dir, Some(1)).count() == 0)
    // the clone's own table was untouched by the source purge run
    assert(Snapshots.purgeKeys(spark, cloneDir,
      Seq(Tuple1(97L)).toDF("k")).isEmpty, "clone versions carry no files")
    // and it now serves the purged source state (documented contract)
    assert(Snapshots.readResolved(spark, cloneDir, Some(1)).count() == 0)
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"purge$tag").toString

  private def commitSource(root: String): String = {
    val dir = s"$root/src"
    Snapshots.commit(
      (0 until 60).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 10L))
        .toDF("uid", "grp", "amount"),
      dir)
    Snapshots.commit(
      (0 until 80).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 10L))
        .toDF("uid", "grp", "amount"),
      dir)
    dir
  }

  private def targets = Seq(0L, 7L, 14L).toDF("uid")

  test("MvPartials keyed by the purged column: partials purged history-wide, view de-registered") {
    val root = freshRoot("mv")
    val src = commitSource(root)
    val mvDir = s"$root/mv"
    MatView.create(spark, "purge_spec_mv", Snapshots.read(spark, src), mvDir,
      groupCols = Seq("uid"), sumCols = Seq("amount" -> col("amount")))
    Purge.register(src, Purge.MvPartials("purge_spec_mv"))
    assert(Purge.exposureCount(spark, mvDir, targets, Seq("uid")) > 0L)
    val actions = Purge.purge(spark, src, targets)
    assert(actions.exists(a => a.artifact == "mv" && a.action == "partials_purged"))
    assert(MvCatalog.get("purge_spec_mv").isEmpty,
      "the definition must stop serving — its coverage names pre-purge files")
    assert(Purge.exposureCount(spark, mvDir, targets, Seq("uid")) == 0L,
      "no committed MV file may still name a purged uid")
    // surgical: the other groups' partials survive untouched
    assert(Snapshots.read(spark, mvDir).count() == 80 - 3)
    Purge.deregister(src)
  }

  test("MvPartials with the key aggregated INTO the partials: table dropped, not served") {
    val root = freshRoot("mvagg")
    val src = commitSource(root)
    val mvDir = s"$root/mv"
    // uid is a MIN/MAX value column here — the stored partials embed
    // uid values under a non-key column, surgical removal impossible
    MatView.create(spark, "purge_spec_mvagg", Snapshots.read(spark, src), mvDir,
      groupCols = Seq("grp"), minMaxCols = Seq("uid" -> col("uid")))
    Purge.register(src, Purge.MvPartials("purge_spec_mvagg"))
    assert(Purge.exposureCount(spark, mvDir, targets, Seq("min_uid")) > 0L,
      "min_uid of group 'a' is 0 — a purged value, the scan must see it")
    val actions = Purge.purge(spark, src, targets)
    assert(actions.exists(a => a.artifact == "mv" && a.action == "dropped"))
    assert(MvCatalog.get("purge_spec_mvagg").isEmpty)
    assert(Snapshots.allVersions(spark, mvDir).isEmpty, "the view table is gone")
    Purge.deregister(src)
  }

  test("CacheEntries: entries pinned to the purged source drop; other inputs' entries survive") {
    val root = freshRoot("cache")
    val src = commitSource(root)
    val other = s"$root/other"
    Snapshots.commit(Seq((1L, "x")).toDF("k", "v"), other)
    val cacheDir = s"$root/cache"
    ResultCache.getOrComputeLatest(spark, cacheDir, "q_src", Seq(src))(fs =>
      fs.head.select(col("uid"), col("amount")))
    ResultCache.getOrComputeLatest(spark, cacheDir, "q_other", Seq(other))(fs =>
      fs.head)
    Purge.register(src, Purge.CacheEntries(cacheDir))
    assert(Purge.exposureCount(spark, cacheDir, targets, Seq("uid")) > 0L)
    Purge.purge(spark, src, targets)
    // the unrelated entry still serves as a hit
    val (_, hitOther, _) =
      ResultCache.getOrComputeLatest(spark, cacheDir, "q_other", Seq(other))(fs =>
        fs.head)
    assert(hitOther, "an entry keyed to a different input must survive")
    // the purged source's entry is gone — next lookup recomputes
    val (refill, hitSrc, _) =
      ResultCache.getOrComputeLatest(spark, cacheDir, "q_src", Seq(src))(fs =>
        fs.head.select(col("uid"), col("amount")))
    assert(!hitSrc, "the dropped entry must miss")
    assert(refill.filter(col("uid").isin(0L, 7L, 14L)).count() == 0L)
    // erasure witness over the refilled state (the purge dropped the
    // only uid-carrying version whole; the refilled entry carries the
    // column again, so the scan is non-vacuous)
    assert(Purge.exposureCount(spark, cacheDir, targets, Seq("uid")) == 0L)
    Purge.deregister(src)
  }

  test("KeyedTable: the derived table is purged history-wide under its renamed column") {
    val root = freshRoot("keyed")
    val src = commitSource(root)
    val asgDir = s"$root/asg"
    val s1 = Snapshots.read(spark, src, Some(1))
    Snapshots.commit(s1.select(col("uid").as("member_id"), col("grp")), asgDir)
    Snapshots.commit(Snapshots.read(spark, src)
      .select(col("uid").as("member_id"), col("grp")), asgDir)
    Purge.register(src, Purge.KeyedTable(asgDir, Map("uid" -> "member_id")))
    assert(Purge.exposureCount(spark, asgDir, targets, Seq("member_id")) > 0L)
    val actions = Purge.purge(spark, src, targets)
    assert(actions.exists(a =>
      a.artifact == "keyed_table" && a.action == "history_rewritten"))
    assert(Purge.exposureCount(spark, asgDir, targets, Seq("member_id")) == 0L,
      "both versions of the assignment table must be rewritten")
    assert(Snapshots.read(spark, asgDir, Some(1)).count() == 60 - 3)
    Purge.deregister(src)
  }

  test("Reland: stats re-landed from the purged source, prior versions vacuumed away") {
    val root = freshRoot("stats")
    val src = commitSource(root)
    val statsDir = s"$root/stats"
    def profile(sp: org.apache.spark.sql.SparkSession): Unit = {
      Snapshots.commit(graft.ops.Analyze.numLeg(
        Snapshots.read(sp, src), "uid", col("uid")), statsDir)
      ()
    }
    profile(spark)
    Purge.register(src, Purge.Reland(statsDir, profile))
    // min_num(uid) = 0.0 — a purged value; the scan must match the
    // LONG key 0 against the DOUBLE stats column
    assert(Purge.exposureCount(spark, statsDir, targets, Seq("min_num")) > 0L)
    val actions = Purge.purge(spark, src, targets)
    assert(actions.exists(a => a.artifact == "stats" && a.action == "relanded"))
    assert(Snapshots.allVersions(spark, statsDir) == Seq(2),
      "the pre-purge stats version must be physically vacuumed")
    assert(Purge.exposureCount(spark, statsDir, targets,
      Seq("min_num", "max_num")) == 0L)
    // the re-landed profile reflects the purged table: min uid is now 1
    assert(Snapshots.read(spark, statsDir).select(col("min_num"))
      .as[Double].head() == 1.0)
    Purge.deregister(src)
  }

  test("dropKeyedVersions rewrites a checkpoint so dropped entries cannot resurrect") {
    val root = freshRoot("ckpt")
    val dir = s"$root/cache"
    Snapshots.commitKeyed(Seq((1L, "a")).toDF("k", "v"), dir, "keep|t@v1")
    Snapshots.commitKeyed(Seq((2L, "b")).toDF("k", "v"), dir, "drop|s@v1")
    Snapshots.checkpointLog(spark, dir)
    Snapshots.pruneLogEntries(spark, dir)
    val dropped = Snapshots.dropKeyedVersions(spark, dir, _.contains("s@"))
    assert(dropped == Seq(2))
    assert(Snapshots.versions(spark, dir) == Seq(1),
      "the checkpoint must be rewritten from survivors — v2 may not resurrect")
    assert(Snapshots.findKeyed(spark, dir, "drop|s@v1").isEmpty)
    assert(Snapshots.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("exposureCount cannot lie by omission: a never-scanned named column raises") {
    val root = freshRoot("vac")
    val dir = s"$root/t"
    Snapshots.commit(Seq((1L, "x")).toDF("uid", "v"), dir)
    // misspelled / absent column: 0 would be a vacuous witness
    val e = intercept[IllegalArgumentException] {
      Purge.exposureCount(spark, dir, targets, Seq("uid_misspelled"))
    }
    assert(e.getMessage.contains("never scanned"))
    // a named column whose type has no scannable leaf raises too
    Snapshots.commit(
      Seq((1L, Array(Array(1L)))).toDF("uid2", "nested"), s"$root/t2")
    val e2 = intercept[IllegalArgumentException] {
      Purge.exposureCount(spark, s"$root/t2", targets, Seq("nested"))
    }
    assert(e2.getMessage.contains("never scanned"))
  }

  test("exposureCount reaches struct fields, map values, and every key column") {
    val root = freshRoot("deep")
    val dir = s"$root/t"
    import org.apache.spark.sql.functions.{map => smap}
    Snapshots.commit(
      Seq((1L, "ok"), (7L, "hit")).toDF("id", "tag")
        .select(struct(col("id").as("inner_id"), col("tag")).as("s"),
          smap(lit("owner"), col("id").cast("string")).as("m")),
      dir)
    // the identifier tucked inside a struct is found
    assert(Purge.exposureCount(spark, dir, targets, Seq("s")) == 1L)
    // ...and inside map values (string-typed: the cast matches)
    assert(Purge.exposureCount(spark, dir, targets, Seq("m")) == 1L)
    // a MULTI-column key set contributes every column's values: 99
    // appears only via the second key column
    val multi = Seq((0L, 99L)).toDF("uid", "alt_uid")
    val dir2 = s"$root/t3"
    Snapshots.commit(Seq((99L, "z")).toDF("ref", "v"), dir2)
    assert(Purge.exposureCount(spark, dir2, multi, Seq("ref")) == 1L,
      "the second key column's values must be scanned too")
  }

  test("CacheEntries fingerprint match is exact-dir, not substring") {
    val root = freshRoot("fpx")
    val src = commitSource(root)
    // an UNRELATED table whose path ends with the source's relative
    // suffix — a substring test would drop its entries
    val decoy = s"$root/decoy/${src.split('/').last}"
    Snapshots.commit(Seq((1L, "d")).toDF("k", "v"), decoy)
    val cacheDir = s"$root/cache"
    ResultCache.getOrComputeLatest(spark, cacheDir, "q_decoy", Seq(decoy))(fs =>
      fs.head)
    Purge.register(src, Purge.CacheEntries(cacheDir))
    Purge.purge(spark, src, targets)
    val (_, hitDecoy, _) =
      ResultCache.getOrComputeLatest(spark, cacheDir, "q_decoy", Seq(decoy))(fs =>
        fs.head)
    assert(hitDecoy,
      "an entry keyed to a path that merely ends with the source dir must survive")
    Purge.deregister(src)
  }

  test("GraphIndex: erasure reaches adjacency endpoints and entry nodes; head serves the repaired graph") {
    val root = freshRoot("gindex")
    // a deterministic 2-shell corpus (NswSpec's fixture)
    val vecs = (0 until 60).map { i =>
      val base = if (i % 2 == 0) 1.0 else 10.0
      val ang = 2 * math.Pi * i / 60
      (i.toLong, Array(base * math.cos(ang), base * math.sin(ang),
        base * 0.5, base * 0.25))
    }.toDF("vec_id", "embedding")
    val idx = graft.ops.Ivf.buildExact(vecs, "vec_id", "embedding",
      k = 4, assignPasses = 2)
    val edges = graft.ops.Nsw.build(vecs, "vec_id", "embedding",
      idx.centroids, blocks = 2, m = 3, rounds = 1)
    val (src, cent, asg, adj, ent) = (s"$root/src", s"$root/cent",
      s"$root/asg", s"$root/adj", s"$root/ent")
    Snapshots.commit(vecs, src)
    Snapshots.commit(idx.centroids, cent)
    Snapshots.commit(idx.assigned, asg)
    Snapshots.commit(edges, adj)
    Snapshots.commit(graft.ops.Nsw.entries(idx.assigned, "vec_id"), ent)
    val keys = Seq(0L).toDF("vec_id") // the global min id IS an entry node
    assert(Purge.exposureCount(spark, adj, keys, Seq("a", "b")) > 0L)
    assert(Purge.exposureCount(spark, ent, keys, Seq("node")) > 0L,
      "node 0 must be an elected entry before the purge")
    Purge.register(src, Purge.KeyedTable(asg))
    Purge.register(src, Purge.GraphIndex(adj, ent, src, cent, asg,
      "vec_id", "embedding", blocks = 2, m = 3))
    val actions = Purge.purge(spark, src, keys)
    assert(actions.exists(a =>
      a.artifact == "graph_index" && a.action == "locally_repaired"))
    // the witness over the FULL history of every index dir
    for ((dir, cs) <- Seq(src -> Seq("vec_id"), asg -> Seq("vec_id"),
        adj -> Seq("a", "b"), ent -> Seq("node")))
      assert(Purge.exposureCount(spark, dir, keys, cs) == 0L,
        s"purged id still exposed under $dir")
    // the resolved head is exactly purgeRepair's adjacency
    val expect = graft.ops.Nsw.purgeRepair(edges,
        vecs.filter(col("vec_id") =!= 0L), "vec_id", "embedding",
        idx.centroids, blocks = 2, m = 3, keys)
      .adjacency.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val served = Snapshots.readResolved(spark, adj)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(served == expect, "DV+append+scrub must serve the repaired graph")
    // entries re-elected: a surviving node now fronts node 0's cluster
    val newEntries = Snapshots.read(spark, ent)
      .collect().map(_.getLong(0)).toSet
    assert(!newEntries.contains(0L) && newEntries.nonEmpty)
    Purge.deregister(src)
  }
}
