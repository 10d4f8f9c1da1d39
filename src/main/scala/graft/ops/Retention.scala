package graft.ops

import org.apache.spark.sql.SparkSession
import graft.sources.Snapshots

/** AUTO-VACUUM RETENTION POLICY (x100) — [[AutoOptimize]]'s
  * self-maintenance pattern applied to HISTORY. Every commit grows
  * the log and leaves the previous versions' data files on disk;
  * without a policy a 100 TB table's storage is its churn history,
  * and someone has to remember to VACUUM. `enable(dir, keepLast)`
  * opts a table in; after every reader-visible commit verb (full/OCC
  * commits, appends, deletion vectors, partition replaces, restores,
  * timed commits, layout re-lands, epoch commits, and WAP/branch
  * publishes — invisible stages never dispatch) the hook counts
  * PUBLISHED versions from the log (manifest-sized) and, past the
  * window, lands [[Snapshots.vacuum]] — which keeps the last
  * `keepLast` heads' transitive CHAIN CLOSURE (an old version a
  * kept append/DV/restore still resolves through is never dropped,
  * so latest reads can never break) and physically deletes the
  * rest.
  *
  * The honest retention trade stays the operator's, stated at
  * enable time: time travel below the window fails loudly after the
  * hook fires (that is what retention MEANS), and the x44
  * shallow-clone caveat applies — vacuuming a clone SOURCE below a
  * clone's pin breaks the clone, exactly Delta's documented
  * interplay. Failure is isolated like every maintenance hook:
  * a vacuum error never fails the durable triggering commit.
  */
object Retention {

  /** A table's registered policy: keep the last N published heads, or
    * (x106) keep everything timed within `maxAgeMillis` of the
    * table's own latest recorded instant — the time axis operators
    * actually reason in, derived from x63 commit timestamps so the
    * hook never reads a wall clock (reproducible in tests and
    * oracles). */
  private sealed trait Policy
  private final case class KeepLast(n: Int) extends Policy
  private final case class MaxAge(millis: Long) extends Policy

  private val registry = new scala.collection.concurrent.TrieMap[String, Policy]
  private val inProgress =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def norm(dir: String): String =
    java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString

  /** Opt a table in: vacuum to the last `keepLast` published heads
    * whenever the published count exceeds the window. */
  def enable(dir: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"retention needs keepLast >= 1, got $keepLast")
    registry.put(norm(dir), KeepLast(keepLast)); ()
  }

  /** Opt a table in BY AGE (x106): after every commit the hook drops
    * versions whose x63 instant predates (latest recorded instant −
    * `maxAgeMillis`) — Delta's `RETAIN n HOURS` as a standing policy.
    * Untimed versions and chain-closure pins always survive
    * ([[graft.sources.Snapshots.vacuumOlderThan]]'s contract). */
  def enableAge(dir: String, maxAgeMillis: Long): Unit = {
    require(maxAgeMillis >= 0, s"retention needs maxAge >= 0, got $maxAgeMillis")
    registry.put(norm(dir), MaxAge(maxAgeMillis)); ()
  }

  def disable(dir: String): Unit = { registry.remove(norm(dir)); () }

  /** Whether a policy is registered (x107's drop-cleanup witness). */
  def isEnabled(dir: String): Boolean = registry.contains(norm(dir))

  /** The commit hook (dispatched by Snapshots' commit verbs). */
  def afterCommit(spark: SparkSession, dir: String): Unit = {
    val key = norm(dir)
    val policy = registry.getOrElse(key, return)
    if (!inProgress.add(key)) return // re-entrancy: vacuum commits nothing,
    // but the guard keeps the hook idempotent under nested dispatch
    try {
      // Steady-state cost note: when chain closure pins more than
      // the window (append-heavy tables), this runs a no-op vacuum
      // per commit — one log read + one closure walk, both
      // manifest-sized, the same class of cost AutoAnalyze and
      // AutoOptimize pay per commit. The walk never touches data and
      // an empty droppable set attempts no filesystem deletes.
      policy match {
        case KeepLast(keep) =>
          if (Snapshots.versions(spark, dir).size > keep)
            Snapshots.vacuum(spark, dir, keep)
        case MaxAge(age) =>
          Snapshots.latestPublishedTs(spark, dir).foreach(ts =>
            Snapshots.vacuumOlderThan(spark, dir, ts - age))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        // isolated: maintenance must never fail the durable commit
        System.err.println(
          s"[graft] retention hook failed for $dir (history left " +
            s"unpruned): ${e.getMessage}")
    } finally inProgress.remove(key)
  }
}
