package graft.ops

import org.apache.spark.sql.SparkSession
import graft.sources.Snapshots

/** AUTO-OPTIMIZE ON COMMIT (x93) — x79's self-maintenance pattern
  * applied to LAYOUT. The stats catalog maintains itself on commit
  * ([[AutoAnalyze]]); layout did not: append-heavy tables (INSERT
  * INTO, streaming epoch sinks) accumulate a file per commit until a
  * human remembers to OPTIMIZE, and at 100 TB the task-per-file
  * scheduling + listing pressure of ten thousand tiny files dominate
  * scan cost long before anyone notices.
  *
  * `enable(dir, maxFiles, targetFiles)` opts a table in; after every
  * commit verb the hook counts the RESOLVED chain's data files from
  * the LOG ENTRIES alone (each entry records its `n_files` — one
  * manifest-sized log read, no filesystem listing, no data job) and,
  * past the threshold, lands [[Optimize.compact]]'s bin-pack as a
  * dataChange=false layout version:
  *
  *  - OCC-GUARDED: the compaction commits against the version the
  *    hook read; a concurrent append landing in between makes the
  *    claim fail ([[graft.sources.ConcurrentCommitException]]) and
  *    the hook simply stands down — the NEXT commit re-triggers it,
  *    so compaction converges without ever clobbering a writer. A
  *    commuting append ([[Snapshots.commitAppendCommuting]]) passing
  *    the other way rebases straight through the layout version.
  *  - CDC-QUIET: a layout commit feeds nothing ([[Snapshots
  *    .stepChanges]] skips dataChange=false) — downstream consumers
  *    never see maintenance as data.
  *  - STATS-FRESH: commitLayout's own hook path re-stamps an enabled
  *    auto-stats catalog instead of re-profiling.
  *  - ISOLATED like [[AutoAnalyze.afterCommit]]: maintenance failure
  *    must never fail the already-durable triggering commit.
  *
  * Reentrancy: the compaction's own commit dispatches hooks again —
  * the per-dir in-progress guard makes that a no-op (and the
  * re-landed chain is below threshold anyway).
  */
object AutoOptimize {

  private final case class Conf(maxFiles: Int, targetFiles: Int)
  private val registry = new scala.collection.concurrent.TrieMap[String, Conf]
  private val inProgress =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def norm(dir: String): String =
    java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString

  /** Opt a table in: compact to `targetFiles` whenever the resolved
    * chain's file count exceeds `maxFiles`. */
  def enable(dir: String, maxFiles: Int, targetFiles: Int): Unit = {
    require(maxFiles > targetFiles && targetFiles > 0,
      s"auto-optimize needs maxFiles > targetFiles > 0, got ($maxFiles, $targetFiles)")
    registry.put(norm(dir), Conf(maxFiles, targetFiles)); ()
  }

  def disable(dir: String): Unit = { registry.remove(norm(dir)); () }

  /** Whether a policy is registered (x107's drop-cleanup witness). */
  def isEnabled(dir: String): Boolean = registry.contains(norm(dir))

  /** Data files of the resolved latest chain, counted from log entry
    * metadata alone (manifest-sized — no listing, no job). Walks base
    * pointers of logical kinds; a full version ends the chain. */
  def chainFileCount(spark: SparkSession, dir: String): Long =
    Snapshots.chainEntries(spark, dir).map(_._2).sum

  /** The commit hook (dispatched by Snapshots' commit verbs). */
  def afterCommit(spark: SparkSession, dir: String): Unit = {
    val key = norm(dir)
    val conf = registry.getOrElse(key, return)
    if (!inProgress.add(key)) return // maintenance's own commit: no-op
    try {
      if (chainFileCount(spark, dir) > conf.maxFiles) {
        try Optimize.compact(spark, dir, conf.targetFiles)
        catch {
          // a concurrent writer advanced the log between the hook's
          // read and the layout claim: stand down — the next commit
          // re-triggers, so compaction converges without clobbering
          case _: graft.sources.ConcurrentCommitException => ()
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        // isolated: maintenance must never fail the durable commit
        System.err.println(
          s"[graft] auto-optimize hook failed for $dir (layout left " +
            s"fragmented): ${e.getMessage}")
    } finally inProgress.remove(key)
  }
}
