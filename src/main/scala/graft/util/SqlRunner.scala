package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — SQL script runner (reference scripts/run_sql_file.py:19-54):
  * split a script on `;`, execute statements sequentially, return the
  * last result per statement. Comment lines (`--`) are stripped the
  * same way the reference strips them.
  */
object SqlRunner {

  def splitStatements(script: String): Seq[String] =
    script.linesIterator
      .map(l => if (l.trim.startsWith("--")) "" else l)
      .mkString("\n")
      .split(";")
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq

  def runScript(spark: SparkSession, script: String): Seq[DataFrame] =
    splitStatements(script).map(spark.sql)

  private val SnapshotAt =
    """(?i)snapshot_at\(\s*'([^']+)'\s*,\s*(\d+)\s*\)""".r

  private val SnapshotAtTime =
    """(?i)snapshot_at_time\(\s*'([^']+)'\s*,\s*(\d+)\s*\)""".r

  /** Time travel on the SQL surface (x24's warehouse contract made
    * reachable from pure SQL text): every occurrence of the
    * TVF-style table reference `snapshot_at('<table dir>', <v>)` is
    * bound to a temp view backed by the pinned snapshot read
    * ([[graft.sources.Snapshots.read]] with `asOf`) before the
    * script runs — `VERSION AS OF` for the Snapshots log, so one SQL
    * script can hold two versions of one table side by side. The
    * binding is textual because Spark exposes no user table-function
    * extension point on the pure-SQL surface; the view name is
    * deterministic in (dir, version), so repeated references
    * collapse to one view over one pinned plan, and an unknown
    * version fails loudly at bind time, before any SQL runs. */
  def runScriptWithSnapshots(spark: SparkSession, script: String): Seq[DataFrame] = {
    val bound = SnapshotAt.replaceAllIn(script, m => {
      val (dir, v) = (m.group(1), m.group(2).toInt)
      val view = s"snapshot_${Integer.toHexString(dir.hashCode)}_v$v"
      graft.sources.Snapshots.read(spark, dir, Some(v))
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // TIMESTAMP AS OF twin (x63/x65): `snapshot_at_time('<dir>',
    // <epoch millis>)` binds to the version the instant resolves to
    // — same textual mechanism, resolution via versionAsOf so the
    // timed-throughout and predates-first-commit guards fire at bind
    // time, before any SQL runs.
    val boundT = SnapshotAtTime.replaceAllIn(bound, m => {
      val (dir, ts) = (m.group(1), m.group(2).toLong)
      val v = graft.sources.Snapshots.versionAsOf(spark, dir, ts)
      val view = s"snapshot_${Integer.toHexString(dir.hashCode)}_t${ts}_v$v"
      graft.sources.Snapshots.read(spark, dir, Some(v))
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val bound2 = TableChanges.replaceAllIn(boundT, m => {
      val (dir, v) = (m.group(1), m.group(2).toInt)
      val keys = m.group(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val view = s"changes_${Integer.toHexString((dir + keys.mkString(",")).hashCode)}_v$v"
      graft.sources.Snapshots.stepChanges(spark, dir, v, keys)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // hidden-partitioned tables (x69/x71): the view hides the layout,
    // registration installs the translation rule, so a raw-column
    // WHERE in the pure-SQL script still prunes directories
    val bound3 = HiddenTable.replaceAllIn(bound2, m => {
      val dir = m.group(1)
      val view = s"hidden_${Integer.toHexString(dir.hashCode)}"
      graft.plans.HiddenPartitioning.table(spark, dir)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // DESCRIBE HISTORY (x74): the commit log as a queryable view
    val bound4a = TableHistory.replaceAllIn(bound3, m => {
      val dir = m.group(1)
      val view = s"history_${Integer.toHexString(dir.hashCode)}"
      graft.sources.Snapshots.history(spark, dir)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // auto-maintained stats catalog (x80): the commit hook's served
    // summary + freshness verdict as a queryable view — pure-SQL
    // audits and planners read what the hook maintains, zero
    // data-sized jobs at bind time
    val bound4 = AutoStats.replaceAllIn(bound4a, m => {
      val dir = m.group(1)
      val view = s"autostats_${Integer.toHexString(dir.hashCode)}"
      graft.ops.AutoAnalyze.frame(spark, dir).createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // MV DDL (x78): CREATE/REFRESH MATERIALIZED VIEW are whole
    // STATEMENTS (not table references), dispatched to MatView's SQL
    // entry points — a pure-SQL script can declare a view, and a
    // later script's plain GROUP BY over the fact gets rewritten by
    // the injected rule with no Scala in sight. Table-reference
    // bindings above run FIRST, so the defining/delta SQL may itself
    // use snapshot_at(...) etc.
    splitStatements(bound4).map {
      case CreateMv(name, dir, sql) =>
        graft.plans.MatView.createFromSql(spark, name, dir, sql)
      case RefreshMv(name, sql) =>
        val v = graft.plans.MatView.refreshFromSql(spark, name, sql)
        spark.sql(s"SELECT $v AS mv_version")
      case DropMv(name) =>
        val existed = graft.plans.MatView.drop(spark, name)
        spark.sql(s"SELECT $existed AS mv_dropped")
      case RestoreTable(dir, v) =>
        val nv = graft.sources.Snapshots.commitRestore(spark, dir, v.toInt)
        spark.sql(s"SELECT $nv AS restored_as_version")
      case VacuumTable(dir, n) =>
        val dropped = graft.sources.Snapshots.vacuum(spark, dir, n.toInt)
        spark.sql(s"SELECT ${dropped.size} AS n_vacuumed")
      case st => spark.sql(st)
    }
  }

  /** `CREATE MATERIALIZED VIEW <name> AT '<dir>' AS <select…>` —
    * the defining aggregate runs to the end of the statement. */
  private val CreateMv =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AT\s+'([^']+)'\s+AS\s+(.+)$""".r

  /** `REFRESH MATERIALIZED VIEW <name> AS <delta select…>`. */
  private val RefreshMv =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+(.+)$""".r

  /** `DROP MATERIALIZED VIEW <name>` — de-register + drop storage. */
  private val DropMv =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$""".r

  /** `auto_stats('<dir>')` binds the commit hook's served summary
    * (one row per profiled column + the freshness verdict). */
  private val AutoStats =
    """(?i)auto_stats\(\s*'([^']+)'\s*\)""".r

  /** `RESTORE TABLE '<dir>' TO VERSION <v>` — x61's metadata-only
    * rollback as a statement (a new latest that serves version v). */
  private val RestoreTable =
    """(?is)^\s*RESTORE\s+TABLE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*$""".r

  /** `VACUUM '<dir>' KEEP <n>` — physically drop versions outside
    * the last n heads' chain closure (x29's retention verb). */
  private val VacuumTable =
    """(?is)^\s*VACUUM\s+'([^']+)'\s+KEEP\s+(\d+)\s*$""".r

  /** `table_history('<dir>')` binds the manifest-sized commit log
    * (version, kind, ts, base, published) for pure-SQL audits. */
  private val TableHistory =
    """(?i)table_history\(\s*'([^']+)'\s*\)""".r

  /** Hidden-partitioning twin: `hidden_table('<dir>')` binds the
    * layout-hiding read ([[graft.plans.HiddenPartitioning.table]] —
    * spec recovered from the table's own sidecar metadata), so SQL
    * scripts filter on raw columns and still get directory pruning
    * through the injected translation rule. */
  private val HiddenTable =
    """(?i)hidden_table\(\s*'([^']+)'\s*\)""".r

  /** Change-feed twin of [[SnapshotAt]] (Delta's `table_changes`
    * TVF): `table_changes('<dir>', <v>, '<key[,key…]>')` binds the
    * O(Δ) per-version feed ([[graft.sources.Snapshots.stepChanges]]
    * — op + key columns) as a temp view, so downstream CDC consumers
    * can be written in pure SQL. */
  private val TableChanges =
    """(?i)table_changes\(\s*'([^']+)'\s*,\s*(\d+)\s*,\s*'([^']+)'\s*\)""".r
}
