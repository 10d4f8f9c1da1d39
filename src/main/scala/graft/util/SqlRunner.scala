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
    val boundT0 = SnapshotAtTime.replaceAllIn(bound, m => {
      val (dir, ts) = (m.group(1), m.group(2).toLong)
      val v = graft.sources.Snapshots.versionAsOf(spark, dir, ts)
      val view = s"snapshot_${Integer.toHexString(dir.hashCode)}_t${ts}_v$v"
      graft.sources.Snapshots.read(spark, dir, Some(v))
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // RESOLVED reads (x83/x84's read-back): `snapshot_resolved('<dir>',
    // <v>)` binds [[graft.sources.Snapshots.readResolved]] — logical
    // versions (deletion vectors, appends, replaces) served as the
    // STATE they denote, so a pure-SQL consumer of a merge-on-read
    // table never has to know the version's physics. `snapshot_at`
    // stays the pinned own-rows read (a DV version's own rows are the
    // deleted keys — the audit view; this is the state view).
    val boundT = SnapshotResolved.replaceAllIn(boundT0, m => {
      val (dir, v) = (m.group(1), m.group(2).toInt)
      val view = s"resolved_${Integer.toHexString(dir.hashCode)}_v$v"
      graft.sources.Snapshots.readResolved(spark, dir, Some(v))
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
    // x123: the POSITION-AWARE feed (x118's stepChangesPos) on the
    // pure-SQL surface — keyless tables' change rows with their
    // (_file, _pos) addresses, staged D halves included
    val bound2p = TableChangesPos.replaceAllIn(bound2, m => {
      val (dir, v) = (m.group(1), m.group(2).toInt)
      val view = s"poschanges_${Integer.toHexString(dir.hashCode)}_v$v"
      graft.sources.Snapshots.stepChangesPos(spark, dir, v)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // x122: the active retention holds as a queryable view
    val bound2h = TableHolds.replaceAllIn(bound2p, m => {
      val dir = m.group(1)
      val view = s"holds_${Integer.toHexString(dir.hashCode)}"
      import spark.implicits._
      graft.sources.Snapshots.holds(spark, dir).toSeq.sorted
        .toDF("tag", "version").createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // hidden-partitioned tables (x69/x71): the view hides the layout,
    // registration installs the translation rule, so a raw-column
    // WHERE in the pure-SQL script still prunes directories
    val bound3 = HiddenTable.replaceAllIn(bound2h, m => {
      val dir = m.group(1)
      val view = s"hidden_${Integer.toHexString(dir.hashCode)}"
      graft.plans.HiddenPartitioning.table(spark, dir)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // layout audit (x88): a version's FILE LISTING as a queryable
    // view — (dir, n_files, bytes) per partition directory, built
    // from the same manifest-sized listing the Scala witnesses
    // (filesPerDir / fileSignature) read, zero data-sized jobs
    val bound3f = TableFiles.replaceAllIn(bound3, m => {
      val (dir, v) = (m.group(1), m.group(2).toInt)
      val view = s"files_${Integer.toHexString(dir.hashCode)}_v$v"
      val rows = graft.sources.Snapshots.fileSignature(spark, dir, v)
        .groupBy { case (rel, _) =>
          rel.lastIndexOf('/') match {
            case -1 => ""; case i => rel.substring(0, i)
          }
        }
        .map { case (d0, fs) => (d0, fs.size.toLong, fs.map(_._2).sum) }
        .toSeq.sortBy(_._1)
      import spark.implicits._
      rows.toDF("dir", "n_files", "bytes").createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // masking policies (x95): `policy_table('<data dir>', '<policy
    // dir>')` binds the data table's resolved latest WITH the policy
    // applied — column masks rewrite in the scan's projection, row
    // filters sit on the scan (pushdown-eligible). The policy is
    // itself a Snapshots table: versioned, auditable, atomically
    // switchable.
    val bound3p = PolicyTable.replaceAllIn(bound3f, m => {
      val (dataDir, polDir) = (m.group(1), m.group(2))
      val view = s"policy_${Integer.toHexString((dataDir + "|" + polDir).hashCode)}"
      graft.ops.Policy.bind(spark, dataDir, polDir)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // named refs (x98): `branch_at('<dir>', '<name>')` serves a
    // ref's resolved state (branch head or tag pin — time travel by
    // NAME); `table_refs('<dir>')` serves the refs catalog. Both are
    // metadata-bound at script start, like every other binding.
    val bound3b = BranchAt.replaceAllIn(bound3p, m => {
      val (dir, name) = (m.group(1), m.group(2))
      // ref names legally carry '.'/'-' (Branches.NamePat) — illegal
      // in a view identifier, so the view name is sanitized and the
      // RAW name rides in the hash for uniqueness ('rel-1.0' and
      // 'rel_1_0' must not collide)
      val view = s"branch_${Integer.toHexString((dir + "|" + name).hashCode)}_" +
        name.replaceAll("[^A-Za-z0-9_]", "_")
      graft.sources.Branches.read(spark, dir, name)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val bound3r0 = TableRefs.replaceAllIn(bound3b, m => {
      val dir = m.group(1)
      val view = s"refs_${Integer.toHexString(dir.hashCode)}"
      import spark.implicits._
      graft.sources.Branches.list(spark, dir)
        .toDF("name", "version", "is_tag").createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // catalog listing (x101): SHOW TABLES for a path-addressed root
    val bound3r = TablesUnder.replaceAllIn(bound3r0, m => {
      val root = m.group(1)
      val view = s"tables_${Integer.toHexString(root.hashCode)}"
      import spark.implicits._
      graft.sources.Snapshots.tablesUnder(spark, root)
        .toDF("name", "head_version", "n_published")
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // DESCRIBE HISTORY (x74): the commit log as a queryable view
    val bound4a0 = TableHistory.replaceAllIn(bound3r, m => {
      val dir = m.group(1)
      val view = s"history_${Integer.toHexString(dir.hashCode)}"
      graft.sources.Snapshots.history(spark, dir)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    // DESCRIBE TABLE (x107): current schema + layout spec + head +
    // constraints as a queryable view — metadata-only at bind time
    val bound4a = DescribeTable.replaceAllIn(bound4a0, m => {
      val dir = m.group(1)
      val view = s"describe_${Integer.toHexString(dir.hashCode)}"
      graft.sources.Snapshots.describeTable(spark, dir)
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
    // script-scoped transaction context (x90): statements run in
    // order, so a mutable Option is the honest representation
    var txn: Option[(String, String,
      scala.collection.mutable.ListBuffer[String])] = None
    splitStatements(bound4).map {
      case BeginTxn(txnDir, id) =>
        require(txn.isEmpty, s"BEGIN TRANSACTION '$id': one already open")
        txn = Some((txnDir, id, scala.collection.mutable.ListBuffer[String]()))
        spark.sql("SELECT true AS txn_begun")
      case CommitTxnCtx() =>
        val (td, id, parts) = txn.getOrElse(
          sys.error("COMMIT TRANSACTION outside BEGIN TRANSACTION"))
        graft.sources.Snapshots.txnCommit(spark, td, id, parts.toSeq)
        txn = None
        spark.sql(s"SELECT ${parts.size} AS n_tables_committed")
      case CommitTxnExplicit(td, id, tables) =>
        val dirs = """'([^']+)'""".r.findAllMatchIn(tables).map(_.group(1)).toSeq
        require(dirs.nonEmpty, s"COMMIT TRANSACTION '$id': no TABLES listed")
        graft.sources.Snapshots.txnCommit(spark, td, id, dirs)
        // deciding the OPEN transaction closes the script context too —
        // a later stage into a decided txn would be instantly visible
        // (committed) or a permanent ghost (aborted)
        if (txn.exists(t => t._1 == td && t._2 == id)) txn = None
        spark.sql(s"SELECT ${dirs.size} AS n_tables_committed")
      case RollbackTxn(td, id) =>
        graft.sources.Snapshots.txnAbort(spark, td, id)
        if (txn.exists(t => t._1 == td && t._2 == id)) txn = None
        spark.sql("SELECT true AS txn_aborted")
      // transactional DDL: inside an open transaction the replacement
      // version STAGES (durable, invisible) — visible only when the
      // decision marker commits; an abort leaves it inert for vacuum
      // MUST precede both CreateTableAs arms: `AS [SHALLOW] CLONE`
      // also matches the generic CTAS pattern, whose spark.sql(select)
      // would choke on the CLONE keyword
      case CreateTableClone(dst, shallow, src, ver) =>
        require(txn.isEmpty, "only CREATE [OR REPLACE] TABLE AS stages " +
          "inside BEGIN TRANSACTION — not transactional: CREATE TABLE AS CLONE")
        require(graft.sources.Snapshots.versions(spark, dst).isEmpty,
          s"CREATE TABLE '$dst': table exists")
        val v = Option(ver).map(_.toInt).getOrElse(
          graft.sources.Snapshots.versions(spark, src).last)
        val nv =
          if (shallow != null)
            graft.sources.Snapshots.commitClone(spark, dst, src, v)
          else graft.sources.Snapshots.commit(
            graft.sources.Snapshots.readResolved(spark, src, Some(v)), dst)
        spark.sql(s"SELECT $nv AS cloned_version")
      case CreateTableAs(orReplace, dir, select) if txn.isDefined =>
        if (orReplace == null)
          require(graft.sources.Snapshots.versions(spark, dir).isEmpty,
            s"CREATE TABLE '$dir': table exists (use CREATE OR REPLACE)")
        val (td, id, parts) = txn.get
        val v = graft.sources.Snapshots.txnStage(spark.sql(select), dir, td, id)
        parts += dir
        spark.sql(s"SELECT $v AS staged_version")
      // inside an open transaction every OTHER mutating statement
      // refuses loudly: these verbs commit immediately, so letting
      // one run would silently break the atomicity the BEGIN promised
      case st if txn.isDefined &&
          Seq(InsertInto, MergeStmt, DeleteStmt, UpdateStmt, OptimizeStmt,
            PurgeStmt, RestoreTable, VacuumTable, VacuumOlder, CreateMv,
            RefreshMv,
            DropMv, DropTable, AlterAddColumn, AlterAddColumnDefault,
            AlterRenameColumn,
            AlterDropColumn, AlterColumnType, AddConstraint, CreateBranch,
            InsertIntoBranch, FastForward, CreateTableClone, HoldTable,
            ReleaseHoldStmt)
            .exists(_.findFirstIn(st).isDefined) =>
        sys.error("only CREATE [OR REPLACE] TABLE AS stages inside " +
          s"BEGIN TRANSACTION — not transactional: ${st.trim.take(60)}")
      case CreateMv(name, dir, sql) =>
        graft.plans.MatView.createFromSql(spark, name, dir, sql)
      case RefreshMv(name, sql) =>
        val v = graft.plans.MatView.refreshFromSql(spark, name, sql)
        spark.sql(s"SELECT $v AS mv_version")
      case DropMv(name) =>
        val existed = graft.plans.MatView.drop(spark, name)
        spark.sql(s"SELECT $existed AS mv_dropped")
      case RestoreTable(dir, v) =>
        // x102: a rollback republishes HISTORIC rows — they too must
        // satisfy the constraints registered since (one restore-sized
        // scan; restores are rare and explicit)
        graft.sources.Snapshots.enforceConstraints(spark, dir,
          graft.sources.Snapshots.readResolved(spark, dir, Some(v.toInt)))
        val nv = graft.sources.Snapshots.commitRestore(spark, dir, v.toInt)
        spark.sql(s"SELECT $nv AS restored_as_version")
      case HoldTable(dir, v, tag) =>
        graft.sources.Snapshots.holdVersion(spark, dir, v.toInt, tag)
        spark.sql("SELECT true AS held")
      case ReleaseHoldStmt(dir, tag) =>
        graft.sources.Snapshots.releaseHold(spark, dir, tag)
        spark.sql("SELECT true AS released")
      case VacuumTable(dir, n) =>
        val dropped = graft.sources.Snapshots.vacuum(spark, dir, n.toInt)
        spark.sql(s"SELECT ${dropped.size} AS n_vacuumed")
      case VacuumOlder(dir, ts) =>
        val dropped = graft.sources.Snapshots.vacuumOlderThan(
          spark, dir, ts.toLong)
        spark.sql(s"SELECT ${dropped.size} AS n_vacuumed")
      case MergeStmt(dir, src, key, arms) =>
        val v = runMerge(spark, dir, src, key, arms)
        spark.sql(s"SELECT $v AS merged_version")
      case PurgeStmt(dir, select) =>
        val rewritten = graft.sources.Snapshots.purgeKeys(
          spark, dir, spark.sql(select))
        spark.sql(s"SELECT ${rewritten.size} AS n_versions_rewritten")
      case CreateTableAs(orReplace, dir, select) =>
        // OR REPLACE is HISTORY-PRESERVING: the replacement lands as a
        // full version ON TOP of the existing log (the same shape the
        // txn path stages, minus staging), so time travel /
        // table_history / table_changes keep serving prior states and
        // a crash can never lose the table — drop-first was both
        // destructive and non-atomic. Destroying history is an
        // explicit DROP TABLE, never a side effect of REPLACE.
        require(orReplace != null ||
          graft.sources.Snapshots.versions(spark, dir).isEmpty,
          s"CREATE TABLE '$dir': table exists (use CREATE OR REPLACE)")
        val frame = spark.sql(select)
        // x102: constraints survive a history-preserving REPLACE, so
        // the replacement state is checked like any other new image
        if (orReplace != null)
          graft.sources.Snapshots.enforceConstraints(spark, dir, frame)
        val v = graft.sources.Snapshots.commit(frame, dir)
        spark.sql(s"SELECT $v AS created_version")
      case DropTable(dir) =>
        // x107: the one verb that ends a table's life also ends it in
        // every per-table registry (retention/auto-OPTIMIZE/ANALYZE
        // policies, hidden-partition spec, MVs storing or reading it)
        graft.sources.Snapshots.dropTable(spark, dir)
        spark.sql("SELECT true AS table_dropped")
      case AddConstraint(dir, cname, cexpr) =>
        val v = graft.sources.Snapshots.addCheckConstraint(
          spark, dir, cname, cexpr)
        spark.sql(s"SELECT $v AS constraint_version")
      case AlterAddColumnDefault(dir, cname, ctype, dexpr) =>
        val v = graft.sources.Snapshots.alterAddColumnDefault(spark, dir,
          cname, org.apache.spark.sql.types.DataType.fromDDL(ctype), dexpr)
        spark.sql(s"SELECT $v AS altered_version")
      case AlterAddColumn(dir, cname, ctype) =>
        val v = graft.sources.Snapshots.alterAddColumn(spark, dir, cname,
          org.apache.spark.sql.types.DataType.fromDDL(ctype))
        spark.sql(s"SELECT $v AS altered_version")
      case AlterRenameColumn(dir, from, to) =>
        val v = graft.sources.Snapshots.alterRenameColumn(spark, dir, from, to)
        spark.sql(s"SELECT $v AS altered_version")
      case AlterDropColumn(dir, cname) =>
        val v = graft.sources.Snapshots.alterDropColumn(spark, dir, cname)
        spark.sql(s"SELECT $v AS altered_version")
      case AlterColumnType(dir, cname, ctype) =>
        val v = graft.sources.Snapshots.alterWidenColumn(spark, dir, cname,
          org.apache.spark.sql.types.DataType.fromDDL(ctype))
        spark.sql(s"SELECT $v AS altered_version")
      case CreateBranch(kind, dir, name, v) =>
        if (kind.equalsIgnoreCase("TAG"))
          graft.sources.Branches.createTag(spark, dir, name, v.toInt)
        else graft.sources.Branches.create(spark, dir, name, v.toInt)
        spark.sql("SELECT true AS ref_created")
      case InsertIntoBranch(dir, name, select) =>
        val delta = spark.sql(select)
        // x102: branch writes are gated like main writes — else FAST
        // FORWARD would publish rows the CHECK never saw
        graft.sources.Snapshots.enforceConstraints(spark, dir, delta)
        val v = graft.sources.Branches.commitTo(delta, dir, name)
        spark.sql(s"SELECT $v AS staged_version")
      case FastForward(dir, name) =>
        val pub = graft.sources.Branches.fastForward(spark, dir, name)
        spark.sql(s"SELECT ${pub.size} AS n_published")
      case InsertInto(dir, select) =>
        val delta = spark.sql(select)
        // x102 under OCC: the CHECK set is re-read against the head
        // the commit actually claims — an expectedVersion commit
        // raises if ANYTHING (including a new constraint) interleaves
        // between the check and the entry claim, and the loop then
        // re-checks at the new head instead of landing unchecked.
        var v = -1
        var attempts = 0
        while (v < 0) {
          attempts += 1
          require(attempts <= 50, s"INSERT INTO '$dir': retry budget exhausted")
          val base = graft.sources.Snapshots.versions(spark, dir).last
          // x119: omitted DEFAULTED columns fill from the recorded
          // expressions (re-resolved per attempt — a concurrent alter
          // may have changed the schema the CAS will then see)
          val filled = graft.sources.Snapshots.applyWriteDefaults(
            spark, dir, delta)
          graft.sources.Snapshots.enforceConstraints(spark, dir, filled)
          try v = graft.sources.Snapshots.commitAppend(filled, dir, base,
            expected = Some(base))
          catch { case _: graft.sources.ConcurrentCommitException => }
        }
        spark.sql(s"SELECT $v AS inserted_version")
      case OptimizeStmt(dir, zcols, n) =>
        val v = Option(zcols) match {
          case Some(cs) => graft.ops.Optimize.zorder(spark, dir,
            cs.split(",").map(_.trim).toSeq, n.toInt)
          case None => graft.ops.Optimize.compact(spark, dir, n.toInt)
        }
        spark.sql(s"SELECT $v AS optimized_version")
      case DeleteStmt(dir, cond) =>
        val v = runDelete(spark, dir, cond)
        spark.sql(s"SELECT $v AS delete_version")
      case UpdateStmt(dir, sets, cond) =>
        val v = runUpdate(spark, dir, sets, cond)
        spark.sql(s"SELECT $v AS update_version")
      case st => spark.sql(st)
    }
  }

  // ---------------------------------------------------------------
  // DML statements (x82/x83/x84) — the lakehouse's daily write verbs
  // on the pure-SQL surface, routed through the SAME operators the
  // Scala API uses (ops.Merge four-arm evaluation; Snapshots deletion
  // vectors / staged-DV + append publish), so a SQL-only consumer
  // mutates tables with identical semantics and identical physics.
  // ---------------------------------------------------------------

  /** Arm/WHERE conditions reference the two sides as `t.<col>` /
    * `s.<col>` (SQL MERGE's conventional aliases); ops.Merge exposes
    * the matched rows as struct columns `_t`/`_s`, so the rewrite is
    * a prefix substitution. Contract — ENFORCED, not prose: no
    * single-quoted string literal in a condition may contain a
    * `t.`/`s.` token (the substitution is textual and would corrupt
    * it into `_t.`/`_s.` silently otherwise; a violating condition
    * fails loudly here instead of producing wrong merge results). */
  private def armColumn(cond: String): org.apache.spark.sql.Column = {
    val violating = "'[^']*'".r.findAllIn(cond)
      .filter(l => "(?i)\\b[ts]\\.".r.findFirstIn(l).isDefined).toSeq
    require(violating.isEmpty,
      s"MERGE arm condition contains a quoted literal with a 't.'/'s.' " +
        s"token (${violating.mkString(", ")}) — the alias rewrite would " +
        s"corrupt it; restate the predicate without such literals: $cond")
    org.apache.spark.sql.functions.expr(
      cond.replaceAll("(?i)\\bt\\.", "_t.").replaceAll("(?i)\\bs\\.", "_s."))
  }

  /** `MERGE INTO '<dir>' USING <view> ON <key> WHEN …` — parse the
    * WHEN clauses into [[graft.ops.Merge.mergeInto]]'s four arms
    * (absent arm = never fires, matching SQL MERGE: unstated rows
    * keep/skip), run the merge against the latest RESOLVED state,
    * land it as ONE optimistic-concurrency commit planned against
    * that state's version. Clause precedence is mergeInto's (delete
    * outranks update within MATCHED — SQL's first-matching-clause
    * rule when delete is stated first, the conventional order). */
  private def runMerge(spark: SparkSession, dir: String, srcView: String,
                       key: String, arms: String): Int = {
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions.lit
    type Arm2 = (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column
    type Arm1 = org.apache.spark.sql.Column => org.apache.spark.sql.Column
    var matchedDelete: Arm2 = (_, _) => lit(false)
    var matchedUpdate: Arm2 = (_, _) => lit(false)
    var notMatchedInsert: Arm1 = _ => lit(false)
    var bySourceDelete: Arm1 = _ => lit(false)
    val found = WhenClause.findAllMatchIn(arms).toSeq
    require(found.nonEmpty, s"MERGE INTO '$dir': no parseable WHEN clause in: $arms")
    found.foreach { m =>
      val kind = m.group(1).toUpperCase.replaceAll("\\s+", " ")
      val cond = Option(m.group(2))
      val action = m.group(3).toUpperCase.replaceAll("\\s+", " ")
      def c2: Arm2 = cond match {
        case Some(x) => (_, _) => armColumn(x); case None => (_, _) => lit(true)
      }
      def c1: Arm1 = cond match {
        case Some(x) => _ => armColumn(x); case None => _ => lit(true)
      }
      (kind, action) match {
        case ("MATCHED", "DELETE") => matchedDelete = c2
        case ("MATCHED", "UPDATE SET *") => matchedUpdate = c2
        case ("NOT MATCHED", "INSERT *") => notMatchedInsert = c1
        case ("NOT MATCHED BY SOURCE", "DELETE") => bySourceDelete = c1
        case other => sys.error(s"unsupported MERGE clause: $other")
      }
    }
    val expected = Snapshots.versions(spark, dir).last
    val merged = graft.ops.Merge.mergeInto(
      Snapshots.readResolved(spark, dir), spark.table(srcView), key,
      matchedDelete = matchedDelete, matchedUpdate = matchedUpdate,
      notMatchedInsert = notMatchedInsert, bySourceDelete = bySourceDelete)
    // x102: only rows the MERGE could have changed need checking —
    // matched updates and inserts all carry a source key, and base
    // rows were validated at their own write time. The semi join
    // keeps the check delta-sized (never a table scan on a clean
    // merge); deletions cannot violate a CHECK.
    Snapshots.enforceConstraints(spark, dir,
      merged.join(spark.table(srcView).select(key), Seq(key), "left_semi"))
    Snapshots.commit(merged, dir, expectedVersion = expected)
  }

  /** `DELETE FROM '<dir>' WHERE <cond>` — merge-on-read: the matching
    * rows of the latest resolved state commit as a DELETION VECTOR
    * against it (x27's physics — the base's files are never touched;
    * at 100 TB a delete costs a churn-sized write + a broadcast-able
    * anti-join at read, not a rewrite). Reads resolve through
    * `snapshot_resolved` / [[graft.sources.Snapshots.readResolved]].
    *
    * OCC like INSERT INTO's loop: the DV commits with
    * `expected = Some(base)` — a writer that lands anything between
    * this verb's base read and its publish raises instead of being
    * silently orphaned from `latest` (the DV would otherwise chain
    * past the interleaved commit to the OLD base — a lost update
    * reachable from plain SQL text), and the loop re-reads + re-plans
    * the hit set at the new head. */
  private def runDelete(spark: SparkSession, dir: String, cond: String): Int = {
    import graft.sources.Snapshots
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 50, s"DELETE FROM '$dir': retry budget exhausted")
      val base = Snapshots.versions(spark, dir).last
      val hit = Snapshots.readResolved(spark, dir, asOf = Some(base))
        .filter(org.apache.spark.sql.functions.expr(cond))
      try return Snapshots.commitDeletes(hit, dir, base = base,
        expected = Some(base))
      catch { case _: graft.sources.ConcurrentCommitException => }
    }
    -1 // unreachable
  }

  /** `UPDATE '<dir>' SET col = expr[, …] WHERE <cond>` — merge-on-read
    * UPDATE as x58's two-step: the old images commit as a STAGED
    * deletion vector (invisible to latest), the new images as ONE
    * append whose base chain runs through it — the append's log entry
    * is the atomic commit point, so no reader ever sees rows vanish
    * without their replacements. SET expressions are plain Spark SQL
    * over the row's own columns; top-level commas separate
    * assignments (parenthesized/function-call commas are fine). */
  private def runUpdate(spark: SparkSession, dir: String, sets: String,
                        cond: String): Int = {
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions.expr
    // OCC like INSERT INTO's loop: the publish append (the one entry
    // readers can see) carries `expected = Some(base)` — if anything
    // interleaved between the base read and the publish, the append
    // raises instead of chaining `latest` through the staged DV to
    // the OLD base (which would silently orphan the interleaved
    // commit's rows), and the loop re-plans hit set + images at the
    // new head. A lost round's staged DV stays an invisible ghost
    // with the exact crash shape vacuum already collects.
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 50, s"UPDATE '$dir': retry budget exhausted")
      val base = Snapshots.versions(spark, dir).last
      val hit = Snapshots.readResolved(spark, dir, asOf = Some(base))
        .filter(expr(cond))
      val images = splitTopLevel(sets).foldLeft(hit) { (df, a) =>
        val Array(c, e) = a.split("=", 2).map(_.trim)
        df.withColumn(c, expr(e))
      }
      // x102: new images checked before anything stages (re-checked
      // per round — a constraint may have landed during the lost race)
      Snapshots.enforceConstraints(spark, dir, images)
      val dv = Snapshots.commitDeletes(hit, dir, base = base, staged = true)
      try return Snapshots.commitAppend(images, dir, base = dv,
        expected = Some(base))
      catch { case _: graft.sources.ConcurrentCommitException => }
    }
    -1 // unreachable
  }

  /** Split on commas at paren depth 0 (SET-list separator). */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i).trim; start = i + 1
      case _ =>
    }
    out += s.substring(start).trim
    out.result().filter(_.nonEmpty)
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

  /** `CREATE TABLE '<dst>' AS [SHALLOW] CLONE '<src>' [VERSION <n>]`
    * (x99): SHALLOW routes through x44's zero-copy metadata clone
    * (one JSON entry, reads resolve through the source — retention-
    * coupled); the default DEEP clone materializes the resolved
    * source state as the new table's own v1 (full write cost,
    * retention-independent — Delta's deep CLONE). */
  private val CreateTableClone =
    """(?is)^\s*CREATE\s+TABLE\s+'([^']+)'\s+AS\s+(SHALLOW\s+)?CLONE\s+'([^']+)'(?:\s+VERSION\s+(\d+))?\s*$""".r

  /** Branch/tag DDL over named refs (x98 — [[graft.sources
    * .Branches]]): `CREATE BRANCH|TAG '<dir>' <name> AT VERSION <n>`,
    * `INSERT INTO BRANCH '<dir>' <name> <select>` (staged append +
    * CAS ref advance, invisible to `latest` readers), and
    * `FAST FORWARD '<dir>' <name>` (publish the branch chain iff
    * main never moved). */
  private val CreateBranch =
    """(?is)^\s*CREATE\s+(BRANCH|TAG)\s+'([^']+)'\s+([A-Za-z0-9._-]+)\s+AT\s+VERSION\s+(\d+)\s*$""".r
  private val InsertIntoBranch =
    """(?is)^\s*INSERT\s+INTO\s+BRANCH\s+'([^']+)'\s+([A-Za-z0-9._-]+)\s+(.+)$""".r
  private val FastForward =
    """(?is)^\s*FAST\s+FORWARD\s+'([^']+)'\s+([A-Za-z0-9._-]+)\s*$""".r

  /** `branch_at('<dir>', '<name>')` binds a ref's resolved state
    * (branch head or tag pin — time travel by NAME); `table_refs(
    * '<dir>')` binds the refs catalog (name, version, is_tag). */
  private val BranchAt =
    """(?i)branch_at\(\s*'([^']+)'\s*,\s*'([A-Za-z0-9._-]+)'\s*\)""".r
  private val TableRefs =
    """(?i)table_refs\(\s*'([^']+)'\s*\)""".r

  /** `ALTER TABLE '<dir>' ADD CONSTRAINT <name> CHECK (<expr>)` —
    * x102: the CHECK persists as a metadata-only log entry and every
    * later SQL mutation's new images are checked against it. */
  private val AddConstraint =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*$""".r

  /** `tables_under('<root>')` binds the catalog listing — every
    * snapshot table directly under the root as (name, head_version,
    * n_published), metadata-only (x101's SHOW TABLES). */
  private val TablesUnder =
    """(?i)tables_under\(\s*'([^']+)'\s*\)""".r

  /** x122 — retention holds on the SQL surface: `HOLD TABLE '<dir>'
    * VERSION <n> AS <tag>` pins a version (and, transitively, its
    * base chain) against VACUUM and age retention;
    * `RELEASE HOLD '<dir>' <tag>` frees it; `table_holds('<dir>')`
    * binds the active holds as a (tag, version) view. */
  private val HoldTable =
    """(?is)^\s*HOLD\s+TABLE\s+'([^']+)'\s+VERSION\s+(\d+)\s+AS\s+([A-Za-z0-9_-]+)\s*$""".r
  private val ReleaseHoldStmt =
    """(?is)^\s*RELEASE\s+HOLD\s+'([^']+)'\s+([A-Za-z0-9_-]+)\s*$""".r
  private val TableHolds =
    """(?i)table_holds\(\s*'([^']+)'\s*\)""".r

  /** x123 — `table_changes_pos('<dir>', <v>)` binds the
    * position-aware feed ([[graft.sources.Snapshots.stepChangesPos]]). */
  private val TableChangesPos =
    """(?i)table_changes_pos\(\s*'([^']+)'\s*,\s*(\d+)\s*\)""".r

  /** `VACUUM '<dir>' KEEP <n>` — physically drop versions outside
    * the last n heads' chain closure (x29's retention verb). */
  private val VacuumTable =
    """(?is)^\s*VACUUM\s+'([^']+)'\s+KEEP\s+(\d+)\s*$""".r

  /** `VACUUM '<dir>' OLDER THAN <epoch millis>` — x106's age axis:
    * drop versions whose x63 commit instant predates the horizon
    * (untimed versions and chain-closure pins survive). */
  private val VacuumOlder =
    """(?is)^\s*VACUUM\s+'([^']+)'\s+OLDER\s+THAN\s+(\d+)\s*$""".r

  /** `table_files('<dir>', <v>)` binds a version's file listing
    * grouped per partition directory — the layout-audit view
    * (compaction/z-order witnesses in pure SQL). */
  private val TableFiles =
    """(?i)table_files\(\s*'([^']+)'\s*,\s*(\d+)\s*\)""".r

  /** `table_history('<dir>')` binds the manifest-sized commit log
    * (version, kind, ts, base, published) for pure-SQL audits. */
  private val TableHistory =
    """(?i)table_history\(\s*'([^']+)'\s*\)""".r

  /** `describe_table('<dir>')` binds the table's current schema +
    * layout spec (kind, name, detail, pos): columns with SQL types
    * and positions, hive partition columns of the head layout,
    * registered CHECK constraints, the head published version —
    * x107's DESCRIBE, metadata-only. */
  private val DescribeTable =
    """(?i)describe_table\(\s*'([^']+)'\s*\)""".r

  /** `policy_table('<data dir>', '<policy dir>')` binds the data
    * table's resolved latest with the policy table's masks + row
    * filters applied ([[graft.ops.Policy.bind]]). */
  private val PolicyTable =
    """(?i)policy_table\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)""".r

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

  /** `snapshot_resolved('<dir>', <v>)` — [[SnapshotAt]]'s resolved
    * twin: logical versions (DVs, appends, replaces) served as the
    * state they denote ([[graft.sources.Snapshots.readResolved]]). */
  private val SnapshotResolved =
    """(?i)snapshot_resolved\(\s*'([^']+)'\s*,\s*(\d+)\s*\)""".r

  /** `MERGE INTO '<dir>' USING <view> ON <key> WHEN …` — the source
    * is a (temp) view name; register it with a preceding
    * `CREATE OR REPLACE TEMPORARY VIEW … AS …;` statement in the same
    * script (statements run in order). */
  private val MergeStmt =
    """(?is)^\s*MERGE\s+INTO\s+'([^']+)'\s+USING\s+(\w+)\s+ON\s+(\w+)\s+(WHEN\s+.+)$""".r

  /** One MERGE WHEN clause: kind + optional AND-condition + action.
    * Alternation order matters (`NOT MATCHED BY SOURCE` before
    * `NOT MATCHED`); conditions never contain the token ` THEN `. */
  private val WhenClause =
    ("""(?is)WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)""" +
      """(?:\s+AND\s+(.+?))?\s+THEN\s+(DELETE|UPDATE\s+SET\s+\*|INSERT\s+\*)""").r

  /** Multi-table transactions (x90, x45's Percolator-style machinery
    * as statements): `BEGIN TRANSACTION '<txnDir>' AS '<id>'` opens a
    * script-scoped transaction — subsequent CREATE [OR REPLACE]
    * TABLE AS statements in the SAME script STAGE their versions
    * (durable, invisible) instead of committing; `COMMIT TRANSACTION`
    * publishes every participant atomically via the decision marker.
    * The explicit forms (`COMMIT TRANSACTION '<txnDir>' AS '<id>'
    * TABLES '<d1>'[, …]`, `ROLLBACK TRANSACTION '<txnDir>' AS
    * '<id>'`) work from ANY script/process — the crash-recovery and
    * fencing verbs. A transaction left open at script end stays
    * pending: its stages are invisible until someone decides it. */
  private val BeginTxn =
    """(?is)^\s*BEGIN\s+TRANSACTION\s+'([^']+)'\s+AS\s+'([^']+)'\s*$""".r
  private val CommitTxnCtx = """(?is)^\s*COMMIT\s+TRANSACTION\s*$""".r
  private val CommitTxnExplicit =
    """(?is)^\s*COMMIT\s+TRANSACTION\s+'([^']+)'\s+AS\s+'([^']+)'\s+TABLES\s+(.+)$""".r
  private val RollbackTxn =
    """(?is)^\s*ROLLBACK\s+TRANSACTION\s+'([^']+)'\s+AS\s+'([^']+)'\s*$""".r

  /** `PURGE '<dir>' KEYS <select>` — RTBF physical erasure
    * ([[graft.sources.Snapshots.purgeKeys]]): every version of the
    * table's HISTORY is rewritten without the selected keys, versions
    * and schema preserved. This is the statement DELETE cannot be:
    * DELETE adds a version (the old rows remain time-travelable);
    * PURGE is the GDPR verb that erases them from the past too. */
  private val PurgeStmt =
    """(?is)^\s*PURGE\s+'([^']+)'\s+KEYS\s+(SELECT\s+.+|WITH\s+.+)$""".r

  /** `CREATE [OR REPLACE] TABLE '<dir>' AS <select>` — CTAS onto the
    * snapshot log: the select's rows land as version 1. Plain CREATE
    * of an existing table fails loudly (SQL's rule); OR REPLACE lands
    * the replacement as a FULL version over the intact log (history-
    * preserving — prior states stay time-travelable). */
  private val CreateTableAs =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+'([^']+)'\s+AS\s+(.+)$""".r

  /** `DROP TABLE '<dir>'` — the one verb that destroys history (all
    * versions + log). REPLACE never does this implicitly. */
  private val DropTable =
    """(?is)^\s*DROP\s+TABLE\s+'([^']+)'\s*$""".r

  /** `ALTER TABLE '<dir>' ADD COLUMN <name> <type>` — x31's schema
    * evolution as a METADATA-ONLY statement
    * ([[graft.sources.Snapshots.alterAddColumn]]): one small log
    * entry, zero files rewritten; historic rows serve the new column
    * as typed nulls. Drops/type changes fail loudly (no such verb). */
  private val AlterAddColumn =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>, ]+?)\s*$""".r

  /** `ALTER TABLE '<dir>' ADD COLUMN <name> <type> DEFAULT (<expr>)` —
    * x119's defaulted evolution: pre-alter rows serve the expression
    * (a constant, or a generated column over the base's columns) and
    * INSERT INTO may omit the column. Metadata-only, like every alter. */
  private val AlterAddColumnDefault =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>, ]+?)\s+DEFAULT\s+\((.+)\)\s*$""".r

  /** x104 — column mapping as metadata-only statements: `ALTER TABLE
    * '<dir>' RENAME COLUMN <a> TO <b>` (the log records new → old;
    * resolution serves the base's column under the new name) and
    * `ALTER TABLE '<dir>' DROP COLUMN <a>` (excluded from resolution
    * at-or-above the entry, still time-travelable below it). Zero
    * files rewritten by either; a CHECK referencing the column
    * refuses. */
  private val AlterRenameColumn =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$""".r
  private val AlterDropColumn =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+COLUMN\s+(\w+)\s*$""".r

  /** `ALTER TABLE '<dir>' ALTER COLUMN <name> TYPE <type>` — x109's
    * lossless type widening as metadata (Delta 3.2's contract):
    * historic values upcast at resolution, lossy changes refuse. */
  private val AlterColumnType =
    """(?is)^\s*ALTER\s+TABLE\s+'([^']+)'\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([\w()<>, ]+?)\s*$""".r

  /** `INSERT INTO '<dir>' <select>` — an APPEND version against the
    * latest (O(Δ) write, base files untouched; readers resolve
    * base ∪ delta). */
  private val InsertInto =
    """(?is)^\s*INSERT\s+INTO\s+'([^']+)'\s+(SELECT\s+.+|WITH\s+.+)$""".r

  /** `OPTIMIZE '<dir>' [ZORDER BY (c1[, …])] INTO <n> FILES` —
    * whole-table layout rewrite ([[graft.ops.Optimize]]): bin-pack
    * without ZORDER, Morton-order clustering with it. Lands as a
    * dataChange=false layout version the change feed skips. */
  private val OptimizeStmt =
    """(?is)^\s*OPTIMIZE\s+'([^']+)'\s*(?:ZORDER\s+BY\s+\(([^)]+)\)\s*)?INTO\s+(\d+)\s+FILES\s*$""".r

  /** `DELETE FROM '<dir>' WHERE <cond>` — deletion-vector route. */
  private val DeleteStmt =
    """(?is)^\s*DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+)$""".r

  /** `UPDATE '<dir>' SET <assignments> WHERE <cond>` — staged-DV +
    * append publish (merge-on-read). */
  private val UpdateStmt =
    """(?is)^\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+)$""".r
}
