package graft.queries

import org.apache.spark.sql.SparkSession
import graft.sources.Snapshots

/** Cross-run cache of committed snapshot FIXTURES.
  *
  * Many lakehouse queries pay a multi-second prologue: commit a
  * deterministic derived frame as a stored table, then exercise an
  * engine operation (compaction, merge, stats fold, purge) against
  * it. The fixture content is a pure function of (sf dir, build
  * code), so re-committing it every sweep times the committer, not
  * the operator under test — the same amortization the k-family gets
  * from [[Derived]]'s shared graph frames, extended across JVMs.
  *
  * [[ensure]] builds once and reuses the stored table on later runs:
  * a `_fixture.json` sidecar records the caller's fingerprint and the
  * as-built version ceiling, and every reuse truncates the table back
  * to that ceiling ([[Snapshots.dropVersionsAbove]]) so the query's
  * own mutation commits from a previous run never leak into this one.
  * Version numbers and content are thus identical to a fresh build —
  * what keeps the pinned-version oracles (`n_versions`, v1/v2 reads)
  * hash-stable.
  *
  * STALENESS GUARD: the fingerprint must encode every knob that
  * shapes the content. A code change without a fingerprint bump
  * leaves a stale fixture — which the DuckDB oracle sweep fails
  * LOUDLY, because the oracle recomputes from the source parquet.
  * Fail-visible, never silent.
  *
  * NEVER use [[ensure]] for a table the query mutates IN PLACE below
  * the ceiling (purge/vacuum/restore rewrite history without adding
  * versions): truncation cannot undo those. Such queries [[checkout]]
  * a private filesystem copy of a pristine template instead.
  *
  * Concurrency: per-dir locks serialize ensure() WITHIN a JVM (test
  * suites run in parallel). Across processes the driver runs Verify
  * and Bench sequentially, so cross-JVM builds never race; two
  * concurrent processes sweeping the same repo checkout would — like
  * every freshSnapDir query before this cache — and are not a
  * supported mode.
  */
object Fixtures {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // the shared escaper handles control characters too — a newline in a
  // caller-composed fingerprint must not produce a sidecar Jackson
  // rejects (which would silently rebuild the fixture every run)
  private def jstr(s: String): String = graft.util.Jsons.quote(s)

  /** Signature of the sf dir's parquet inputs (name:size per file,
    * hashed): folded into every fixture fingerprint so a REGENERATED
    * test corpus — same path, different content — rebuilds instead of
    * serving a stale fixture the oracle would fail en masse. One
    * directory listing, no data read. */
  def dirSig(d: String): String = {
    val p = java.nio.file.Paths.get(d)
    if (!java.nio.file.Files.isDirectory(p)) return "nodir"
    val stream = java.nio.file.Files.list(p)
    try {
      val it = stream.iterator()
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        val n = f.getFileName.toString
        if (n.endsWith(".parquet"))
          parts += s"$n:${java.nio.file.Files.size(f)}"
      }
      parts.sorted.mkString(",").hashCode.toString
    } finally stream.close()
  }

  /** The canonical fingerprint for a (sf dir, build code) fixture:
    * the caller's knob string + the dir path + its content
    * signature. */
  def fp(d: String, base: String): String = s"$base|$d|${dirSig(d)}"

  /** Build-once committed fixture. Returns the table dir (the same
    * deterministic `target/<tag>_<hash(d)>` path [[freshSnapDir]]
    * yields). `build` receives the dir and must leave a committed
    * table; its version ceiling is recorded for reuse-time reset. */
  def ensure(s: SparkSession, d: String, tag: String, fingerprint: String)
            (build: String => Unit): String =
    ensureAt(s, s"target/${tag}_${math.abs(d.hashCode)}",
      fp(d, fingerprint))(build)

  /** [[ensure]] with an explicit dir (shared-helper callers that
    * already own their dir naming). The fingerprint must still
    * encode the sf dir if the content depends on it. */
  def ensureAt(s: SparkSession, dir: String, fingerprint: String)
              (build: String => Unit): String = {
    val lock = locks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val side = java.nio.file.Paths.get(dir, "_fixture.json")
      val fp = fingerprint
      val storedMax: Option[Int] =
        if (!java.nio.file.Files.exists(side)) None
        else try {
          val n = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readString(side))
          Option(n).filter(_.get("fp").asText() == fp)
            .map(_.get("maxVersion").asInt())
        } catch { case _: Exception => None } // torn sidecar → rebuild
      storedMax.foreach { maxV =>
        Snapshots.dropVersionsAbove(s, dir, maxV)
        // reuse only if the as-built version set survived intact (a
        // vacuumed/purged ceiling fails this and rebuilds)
        if (Snapshots.versions(s, dir) == (1 to maxV)) return dir
      }
      Snapshots.drop(s, dir)
      build(dir)
      val maxV = Snapshots.versions(s, dir).lastOption.getOrElse(0)
      require(maxV > 0, s"fixture build for $dir committed nothing")
      val tmp = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(dir), "_fixture", ".tmp")
      java.nio.file.Files.writeString(tmp,
        s"""{"fp":${jstr(fp)},"maxVersion":$maxV}""")
      java.nio.file.Files.move(tmp, side,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dir
    }
  }

  /** Multi-store template for a prologue whose artifacts must
    * reference each other's WORK paths (e.g. a result cache whose
    * fingerprint embeds its input dir): the first run executes
    * `build` against the work dirs themselves, then snapshots each
    * into `templateDir/<i>`; later runs check the pristine copies
    * back out. Used by queries that mutate the stores in place
    * (purge), where [[ensure]]'s ceiling truncation cannot reset. */
  def ensureVia(s: SparkSession, templateDir: String, fingerprint: String,
                workDirs: Seq[String])(build: => Unit): Unit = {
    val lock = locks.computeIfAbsent(templateDir, _ => new Object)
    lock.synchronized {
      val side = java.nio.file.Paths.get(templateDir, "_fixture.json")
      val hit = java.nio.file.Files.exists(side) && (try {
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(side))
          .get("fp").asText() == fingerprint
      } catch { case _: Exception => false })
      if (hit) {
        workDirs.zipWithIndex.foreach { case (w, i) =>
          checkout(s, s"$templateDir/$i", w)
        }
        return
      }
      workDirs.foreach(Snapshots.drop(s, _))
      build
      Snapshots.drop(s, templateDir)
      workDirs.zipWithIndex.foreach { case (w, i) =>
        checkout(s, w, s"$templateDir/$i")
      }
      val tmp = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(templateDir), "_fixture", ".tmp")
      java.nio.file.Files.writeString(tmp,
        s"""{"fp":${jstr(fingerprint)}}""")
      java.nio.file.Files.move(tmp, side,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Clone a pristine template fixture into a private working dir by
    * FILESYSTEM copy — no Spark job. For queries that mutate history
    * in place (purge, vacuum, restore) and so can never share a
    * stored table: the copy costs file IO proportional to the
    * fixture's size, cents next to the Spark recommit it replaces. */
  def checkout(s: SparkSession, templateDir: String, workDir: String): String = {
    Snapshots.drop(s, workDir)
    val src = java.nio.file.Paths.get(templateDir)
    val dst = java.nio.file.Paths.get(workDir)
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    // the clone is a working table, not a cached fixture
    java.nio.file.Files.deleteIfExists(dst.resolve("_fixture.json"))
    workDir
  }
}
