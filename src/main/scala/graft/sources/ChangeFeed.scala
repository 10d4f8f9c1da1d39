package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** CHANGE-DATA-FEED SUBSCRIPTION (x103) — the streaming SOURCE over
  * the snapshot log that closes the lakehouse loop: x33/x56 serve
  * changes as batch pulls, and every streaming twin hand-wires its
  * input; production pipelines instead SUBSCRIBE to a table (Delta's
  * CDF `readStream`) so ingest → dedup admit → index append chain
  * with no bespoke plumbing.
  *
  * Micro-batch = ONE VERSION STEP off the log, epoch = the version
  * number, per-batch cost = that version's O(Δ) change feed
  * ([[Snapshots.stepChanges]] — a DV step reads only the key-sized DV
  * file, an append step its own delta, a replace step one pruned
  * partition; never a table rescan). The consumer CURSOR — the last
  * PROCESSED version — persists in its own directory as
  * create-exclusive `_cursor_v<N>.json` files (the log's own claim
  * primitive: a crashed half-write can never corrupt it, racing
  * consumer instances collapse to idempotent advances), so a restart
  * resumes exactly where processing stopped. Offsets-in-own-files is
  * Structured Streaming's checkpoint contract expressed with the
  * same machinery as the table log itself.
  *
  * Delivery is AT-LEAST-ONCE between `poll` and `commitCursor` —
  * exactly the foreachBatch contract — so exactly-once downstream
  * composes the usual way: land each batch with
  * [[Snapshots.commitEpoch]] keyed by the batch's version, and a
  * replayed step folds nothing (StreamingSpec pins restart parity;
  * the x103 oracle pins drained ≡ batch `table_changes` replay).
  *
  * At 100 TB: a poll is one manifest-sized log listing + one cursor
  * listing; the data cost follows the CHURN each version recorded,
  * and a subscriber that falls behind pays exactly the feed it
  * missed, never a snapshot rescan.
  */
object ChangeFeed {

  private val CursorName = """^_cursor_v(\d+)\.json$""".r

  /** Page-cursor file (x120): `_cursor_v<V>_o<K>.json` — the first K
    * feed rows of version V are processed. Valid only while V is the
    * next unprocessed version; the version's final page commits the
    * FULL `_cursor_v<V>.json`, which supersedes and cleans these. */
  private val PageCursorName = """^_cursor_v(\d+)_o(\d+)\.json$""".r

  /** Numbered-feed sidecar dir (x120): `_feed_v<V>` under the cursor
    * dir holds version V's change feed numbered ONCE — cleaned with
    * the page cursors when the version's full cursor lands. */
  private val FeedDirName = """^_feed_v(\d+)$""".r

  final class Subscription private[sources] (
      spark: SparkSession, dir: String, keys: Seq[String],
      cursorDir: String) {

    private def fsOf() = {
      val p = new org.apache.hadoop.fs.Path(cursorDir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }

    /** The last PROCESSED version (0 before the first commit) — read
      * from the cursor directory, so a fresh instance over the same
      * directory resumes exactly here. */
    def position(): Int = {
      val (fs, p) = fsOf()
      if (!fs.exists(p)) 0
      else fs.listStatus(p).toSeq.flatMap(f =>
        CursorName.findFirstMatchIn(f.getPath.getName).map(_.group(1).toInt))
        .maxOption.getOrElse(0)
    }

    /** The next unprocessed PUBLISHED version's change rows, or None
      * when the subscription is drained. Does NOT advance the cursor
      * — process, then [[commitCursor]] (at-least-once in between).
      * WAP shadowing (the log's documented contract): a STAGED
      * version that publishes only after the cursor passed its number
      * is not redelivered — the feed describes what readers could see
      * at consumption time, exactly [[Snapshots.stepChanges]]'s
      * re-basing rule; audit such flips from `table_history`, not the
      * feed. */
    def poll(): Option[(Int, DataFrame)] = {
      val pos = position()
      Snapshots.versions(spark, dir).filter(_ > pos).minOption.map { v =>
        requireNoTruncation(pos, v)
        (v, Snapshots.stepChanges(spark, dir, v, keys))
      }
    }

    /** TRUNCATION DETECTION: version numbers are dense by
      * construction (each commit's create-exclusive claim takes
      * max+1), so a number between the cursor and a served version
      * that is absent from the WHOLE log (staged entries included)
      * can only mean a retention vacuum physically removed it while
      * this subscriber lagged. Serving past it would silently drop
      * change rows from the feed — raise instead, exactly Delta
      * CDF's behavior when a requested version range was vacuumed.
      * (A number held by a still-staged entry is NOT a gap: WAP
      * shadowing skips it by contract. A FRESH subscription —
      * cursor 0 — starts at the earliest AVAILABLE version: it never
      * observed a feed to lose.) */
    private def requireNoTruncation(pos: Int, upTo: Int): Unit = {
      if (pos == 0) return
      val known = Snapshots.allVersions(spark, dir).toSet
      val missing = ((pos + 1) until upTo).filterNot(known)
      if (missing.nonEmpty) throw new IllegalStateException(
        s"change feed truncated under $dir: version(s) " +
          s"${missing.mkString(", ")} between cursor $pos and served " +
          s"version $upTo were removed by retention while this " +
          "subscriber lagged; re-seed the subscriber from a snapshot " +
          "or widen the table's retention window")
    }

    /** RANGE POLL (x112 — `maxVersionsPerTrigger` catch-up): up to
      * `maxVersions` unprocessed published versions folded into ONE
      * micro-batch, each change row tagged `to_version` (a folded
      * batch spans versions, so the tag rides the rows — the
      * changesSince shape). Returns (from, to, changes); the epoch
      * for exactly-once landing is `to`, and [[commitCursor]]`(to)`
      * advances past the whole span — a crash in between redelivers
      * the SAME range on restart (at-least-once, mid-range). A
      * subscriber N versions behind pays ⌈N/maxVersions⌉ epochs
      * instead of N; each version's feed still costs its own O(Δ). */
    def pollRange(maxVersions: Int): Option[(Int, Int, DataFrame)] = {
      require(maxVersions >= 1, s"maxVersions must be >= 1, got $maxVersions")
      val pos = position()
      val avail = Snapshots.versions(spark, dir).filter(_ > pos).sorted
      avail.headOption.map { _ =>
        val span = avail.take(maxVersions)
        requireNoTruncation(pos, span.last)
        val changes = span.map(v =>
          Snapshots.stepChanges(spark, dir, v, keys)
            .select(lit(v).as("to_version") +:
              (col("op") +: keys.map(col)): _*))
          .reduce(_ unionByName _)
        (span.head, span.last, changes)
      }
    }

    /** Range-poll-process-commit until drained; `f` receives
      * (fromVersion, toVersion, tagged change rows). Returns the
      * number of BATCHES processed (≤ versions consumed). */
    def drainRange(maxVersions: Int)(
        f: (Int, Int, DataFrame) => Unit): Int = {
      var n = 0
      var next = pollRange(maxVersions)
      while (next.isDefined) {
        val (lo, hi, changes) = next.get
        f(lo, hi, changes)
        commitCursor(hi)
        n += 1
        next = pollRange(maxVersions)
      }
      n
    }

    /** The row offset already processed within `nextVersion`'s feed
      * (0 if none) — x120's sub-version cursor component. */
    def pageOffset(nextVersion: Int): Int = {
      val (fs, p) = fsOf()
      if (!fs.exists(p)) 0
      else fs.listStatus(p).toSeq.flatMap(f =>
        PageCursorName.findFirstMatchIn(f.getPath.getName)
          .filter(_.group(1).toInt == nextVersion)
          .map(_.group(2).toInt)).maxOption.getOrElse(0)
    }

    /** ROW-AXIS PAGE POLL (x120 — `maxRowsPerTrigger`, the throughput
      * knob x112's version axis cannot give: one GIANT version — a
      * bulk restatement, a backfill — still lands as one epoch of
      * unbounded rows). Serves the next unprocessed page of the next
      * unprocessed version: up to `maxRows` of its change feed, under
      * a (version, offset) cursor. Returns (version, fromOffset,
      * page); land the page epoch-keyed, then [[commitPage]] — a
      * crash in between REDELIVERS the identical page (at-least-once
      * at page granularity).
      *
      * Pagination requires a DETERMINISTIC TOTAL ORDER over the
      * version's feed — pages must mean the same rows on redelivery
      * and across restarts — so the feed is numbered ONCE per version
      * by [[graft.ops.GlobalIndex]] (range exchange + per-partition
      * offsets — fully parallel, never the single-reducer
      * `row_number().over(Window.orderBy(...))` its scaladoc names as
      * the anti-pattern) over every column (op first, then the keys)
      * and COMMITTED as a numbered-feed sidecar snapshot under the
      * cursor dir ([[numberedFeed]]). Every page is then a rank-range
      * filter over that one materialization: draining N pages costs
      * one parallel numbering of the churn plus N pushed-down range
      * reads, not N single-task re-sorts of the whole churn. The
      * freeze also upgrades redelivery: a redelivered page is the
      * IDENTICAL rows, not merely a multiset-deterministic re-sort.
      * The numbering spans the version's CHURN, never the table —
      * the honest cost of exact pages; production systems that split
      * by file get approximate pages and a weaker redelivery story. */
    def pollPage(maxRows: Int): Option[(Int, Int, DataFrame)] = {
      require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
      val pos = position()
      Snapshots.versions(spark, dir).filter(_ > pos).minOption.map { v =>
        requireNoTruncation(pos, v)
        val off = pageOffset(v)
        // _rn is 0-based: rows [off, off + maxRows) — a min/max-
        // prunable range predicate on the sidecar's parquet scan
        val page = numberedFeed(v)
          .filter(col("_rn") >= off && col("_rn") < off + maxRows)
          .drop("_rn")
        (v, off, page)
      }
    }

    /** Version `v`'s change feed with a dense 0-based `_rn` rank in
      * the total order of all feed columns, materialized ONCE as a
      * snapshot sidecar (`_feed_v<v>` under the cursor dir) on first
      * poll and range-served to every page after. The commit is the
      * log's own create-exclusive claim (expectedVersion = 0), so
      * racing subscriber twins collapse to exactly one sidecar — the
      * loser reads the winner's numbering. Ties (bit-identical rows)
      * may land in either order inside the numbering, but the freeze
      * makes whatever landed THE order for every page and restart.
      * Cleaned by [[commitCursor]] once the version completes. */
    private def numberedFeed(v: Int): DataFrame = {
      val fdir = s"$cursorDir/_feed_v$v"
      if (Snapshots.versions(spark, fdir).isEmpty) {
        val feed = Snapshots.stepChanges(spark, dir, v, keys)
        val order = feed.columns.map(col).toSeq
        try Snapshots.commit(
          graft.ops.GlobalIndex.withGlobalIndex(feed, order, "_rn"),
          fdir, expectedVersion = 0)
        catch { case _: ConcurrentCommitException => () }
      }
      Snapshots.read(spark, fdir, Some(1))
    }

    /** Commit a processed page: the version's LAST page (fewer than
      * `maxRows` rows) advances the FULL cursor past the version and
      * cleans its page files; a full page lands a page cursor at the
      * new offset (create-exclusive — racing twins collapse, and the
      * offset is the max so stale lower files never move it). */
    def commitPage(version: Int, fromOffset: Int, nRows: Long,
                   maxRows: Int): Unit = {
      if (nRows < maxRows) commitCursor(version)
      else {
        val (fs, p) = fsOf()
        fs.mkdirs(p)
        val newOff = fromOffset + nRows
        Snapshots.tryCreateExclusive(fs, p,
          s"_cursor_v${version}_o$newOff.json",
          s"""{"version":$version,"offset":$newOff}""")
        fs.listStatus(p).foreach { f =>
          PageCursorName.findFirstMatchIn(f.getPath.getName)
            .filter(m => m.group(1).toInt == version &&
              m.group(2).toInt < newOff)
            .foreach(_ => fs.delete(f.getPath, false))
        }
      }
    }

    /** Page-poll-process-commit until drained; `f` receives (version,
      * fromOffset, page rows). Returns the number of NON-EMPTY pages
      * processed (an exact-multiple version costs one trailing empty
      * poll to learn it ended — not delivered to `f`). */
    def drainPages(maxRows: Int)(f: (Int, Int, DataFrame) => Unit): Int = {
      var n = 0
      var next = pollPage(maxRows)
      while (next.isDefined) {
        val (v, off, page0) = next.get
        // cache the page for the loop's own two consumers (the count
        // that decides last-page vs full-page, and the sink's action)
        // — without it each page evaluated twice per drain step
        val page = page0.cache()
        try {
          val cnt = page.count()
          if (cnt > 0) { f(v, off, page); n += 1 }
          commitPage(v, off, cnt, maxRows)
        } finally page.unpersist()
        next = pollPage(maxRows)
      }
      n
    }

    /** Advance the cursor past `version` — a create-exclusive claim;
      * a racing twin instance's duplicate advance is an idempotent
      * no-op (both recorded the same fact). Older cursor files are
      * compacted away afterwards (the position is the MAX, so
      * deleting lower files never moves it and a crash mid-cleanup
      * leaves harmless extras) — a year-long subscription's cursor
      * listing stays O(1), not O(versions consumed). */
    def commitCursor(version: Int): Unit = {
      val (fs, p) = fsOf()
      fs.mkdirs(p)
      Snapshots.tryCreateExclusive(fs, p, s"_cursor_v$version.json",
        s"""{"version":$version}""")
      fs.listStatus(p).foreach { f =>
        CursorName.findFirstMatchIn(f.getPath.getName)
          .filter(_.group(1).toInt < version)
          .foreach(_ => fs.delete(f.getPath, false))
        // x120: a completed version's page cursors are superseded
        PageCursorName.findFirstMatchIn(f.getPath.getName)
          .filter(_.group(1).toInt <= version)
          .foreach(_ => fs.delete(f.getPath, false))
        // ... and so is its numbered-feed sidecar (recursive: a
        // snapshot dir) — the cursor listing stays O(1), not
        // O(versions paged)
        FeedDirName.findFirstMatchIn(f.getPath.getName)
          .filter(_.group(1).toInt <= version)
          .foreach(_ => fs.delete(f.getPath, true))
      }
    }

    /** Poll-process-commit until drained; `f` receives (version,
      * change rows). Returns the number of batches processed. */
    def drain(f: (Int, DataFrame) => Unit): Int = {
      var n = 0
      var next = poll()
      while (next.isDefined) {
        val (v, changes) = next.get
        f(v, changes)
        commitCursor(v)
        n += 1
        next = poll()
      }
      n
    }
  }

  def subscribe(spark: SparkSession, dir: String, keys: Seq[String],
                cursorDir: String): Subscription =
    new Subscription(spark, dir, keys, cursorDir)

  /** The batch replay a drained subscription must equal: every
    * published version's O(Δ) feed, tagged with its version — the
    * `table_changes` union the x103 oracle compares against. */
  def changesSince(spark: SparkSession, dir: String, keys: Seq[String],
                   fromVersion: Int = 0): DataFrame = {
    val vs = Snapshots.versions(spark, dir).filter(_ > fromVersion)
    require(vs.nonEmpty,
      s"changesSince($fromVersion): no published versions above it under $dir")
    vs.map(v => Snapshots.stepChanges(spark, dir, v, keys)
        .select(lit(v).as("to_version") +: (col("op") +: keys.map(col)): _*))
      .reduce(_ unionByName _)
  }
}
