package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Snapshots

/** LINEAGE-WIDE RIGHT-TO-BE-FORGOTTEN PURGE (x76) — the propagation
  * layer over [[Snapshots.purgeKeys]]. A table-local purge rewrites
  * one table's history, but the purged key survives in everything
  * DERIVED from it: materialized-view partials whose group key is the
  * purged column, result-cache entries computed from pre-purge
  * versions, persisted index assignment tables keyed by the purged
  * id, and committed statistics whose min/max/histogram boundaries
  * were order statistics of the purged rows. GDPR erasure is
  * lineage-wide or it is not erasure.
  *
  * The registry names each source table's derived artifacts by CLASS,
  * and `purge` applies the class-appropriate erasure:
  *  - [[MvPartials]]: if the purge key is a subset of the view's
  *    group columns, the stored partials are purged history-wide with
  *    the same [[Snapshots.purgeKeys]] machinery (dropping the purged
  *    groups IS the rebuilt view — the other groups' monoid partials
  *    are untouched by removing a group's rows from the fact);
  *    otherwise the key was aggregated INTO the partials (e.g. a
  *    min/max over it) and surgical removal is impossible — the view
  *    table is dropped. Either way the definition is DE-REGISTERED:
  *    its coverage names pre-purge files that no longer exist, so
  *    auto-rewrite must stop until the caller re-creates the view
  *    over the purged fact.
  *  - [[CacheEntries]]: every cache version whose fingerprint pins
  *    ANY version of the purged source is physically dropped
  *    ([[Snapshots.dropKeyedVersions]]) — version-exact keying only
  *    ages stale results out of SERVING; the bytes stay until
  *    something deletes them. Entries keyed to other inputs survive.
  *  - [[KeyedTable]]: a derived table that carries the key under a
  *    (possibly renamed) column — IVF assignment tables, projections,
  *    CDC mirrors — purged history-wide after the rename.
  *  - [[Reland]]: artifacts DERIVED FROM but not KEYED BY the rows —
  *    statistics profiles — cannot be filtered; the rebuild thunk
  *    re-lands a fresh version from the post-purge source, then
  *    `vacuum(keepLast = 1)` physically erases every prior version
  *    (whose boundaries could still name the purged values).
  *  - [[GraphIndex]] (v36): a persisted graph-ANN index, where the
  *    purged id also survives as a NEIGHBOR on other rows' edge
  *    lists and possibly as an elected entry node — erased by
  *    [[graft.ops.Nsw.purgeRepair]]'s local repair + both-endpoint
  *    history scrub + entry re-election.
  *
  * `exposureCount` is the PROOF obligation: a value-level scan of a
  * table's FULL version history (staged included) counting rows in
  * which any atomic or array column equals a purged key value (each
  * key cast to the column's own type, so `97` matches a DOUBLE 97.0
  * histogram boundary). x76 pins exposure = 0 across the source and
  * every registered derived dir after the purge; PurgeSpec drives
  * each artifact class through a positive BEFORE-scan too.
  *
  * 100 TB: propagation cost is each artifact's own size — MV partials
  * are group-cardinality, cache entries result-sized, the assignment
  * table is the one honest data-sized rewrite (it has one row per
  * vector), stats re-land at catalog size. Like purgeKeys itself this
  * runs per retention cycle with a batched key set, single-admin by
  * contract. Reference anchor: the reference app's ingestion derives
  * chunk/entity tables from documents (CS_5542_Lab_6
  * data/ingestion.py) — deleting a paper there would have to cascade
  * the same way.
  */
object Purge {

  sealed trait Artifact
  /** A registered materialized view ([[graft.plans.MvCatalog]]). */
  final case class MvPartials(name: String) extends Artifact
  /** A [[ResultCache]] table — entries are keyed versions. */
  final case class CacheEntries(cacheDir: String) extends Artifact
  /** A derived Snapshots table carrying the key, columns renamed via
    * `keyRename` (source key column → derived column). */
  final case class KeyedTable(dir: String,
                              keyRename: Map[String, String] = Map.empty)
    extends Artifact
  /** A derived table that must be REBUILT from the purged source
    * (stats profiles): `rebuild` re-lands the fresh version; prior
    * versions are then vacuumed away. */
  final case class Reland(dir: String, rebuild: SparkSession => Unit)
    extends Artifact
  /** A persisted GRAPH ANN index (v31's adjacency + entry pair) —
    * the artifact class where row-keyed purging is NOT enough: a
    * purged document's id survives as a NEIGHBOR on other rows'
    * edge lists, and possibly as an elected entry node. Erasure is
    * [[graft.ops.Nsw.purgeRepair]]'s LOCAL REPAIR (drop the purged
    * rows, splice the purged ids out of surviving neighbor lists,
    * re-link the touched nodes from post-purge block-mates at the
    * frozen centroids), landed as v31's merge-on-read pair, then a
    * full-history [[Snapshots.purgeKeys]] scrub over BOTH edge
    * endpoints, and entry re-election from the (already purged)
    * assignment table — so register the assignment's [[KeyedTable]]
    * BEFORE this artifact; the registry applies artifacts in
    * registration order. Purge keys must be the single id column. */
  final case class GraphIndex(adjDir: String, entDir: String,
                              corpusDir: String, centroidsDir: String,
                              assignDir: String, idCol: String,
                              vecCol: String, blocks: Int, m: Int)
    extends Artifact

  /** One propagation step's receipt. */
  final case class Action(artifact: String, dir: String, action: String,
                          detail: String)

  private val registry =
    new scala.collection.concurrent.TrieMap[String, Vector[Artifact]]

  def register(sourceDir: String, a: Artifact): Unit =
    registry.updateWith(sourceDir)(v => Some(v.getOrElse(Vector.empty) :+ a))

  /** Targeted de-registration (the registry is process-wide and test
    * suites run in parallel — remove your own, never clear()). */
  def deregister(sourceDir: String): Unit = { registry.remove(sourceDir); () }

  def artifactsOf(sourceDir: String): Seq[Artifact] =
    registry.getOrElse(sourceDir, Vector.empty)

  /** Purge `keys` from the source table's full history AND from every
    * registered derived artifact. Returns one receipt per step. */
  def purge(spark: SparkSession, sourceDir: String, keys: DataFrame): Seq[Action] = {
    val srcVersions = Snapshots.purgeKeys(spark, sourceDir, keys)
    val head = Action("source", sourceDir, "history_rewritten",
      srcVersions.mkString(","))
    head +: artifactsOf(sourceDir).map {
      case MvPartials(name) =>
        graft.plans.MvCatalog.get(name) match {
          case None => Action("mv", "", "absent", name)
          case Some(d) =>
            val canPurge = keys.columns.forall(c =>
              d.groupCols.contains(c.toLowerCase))
            val act =
              if (canPurge) {
                // the MV table keeps the fact's original column case;
                // groupCols were lowercased at registration
                val byLower = Snapshots.read(spark, d.mvDir).columns
                  .map(c => c.toLowerCase -> c).toMap
                val renamed = keys.columns.foldLeft(keys)((k, c) =>
                  k.withColumnRenamed(c, byLower(c.toLowerCase)))
                val vs = Snapshots.purgeKeys(spark, d.mvDir, renamed)
                Action("mv", d.mvDir, "partials_purged",
                  s"$name:${vs.mkString(",")}")
              } else {
                // the key was aggregated INTO the partials — surgical
                // removal impossible, drop the view table
                Snapshots.drop(spark, d.mvDir)
                Action("mv", d.mvDir, "dropped", name)
              }
            graft.plans.MvCatalog.remove(name)
            act
        }
      case CacheEntries(cacheDir) =>
        // parse the fingerprint's `qid|dir@vN,dir@vN` inputs
        // (ResultCache.fingerprint's format) and compare NORMALIZED
        // dirs for exact equality — a substring test would drop an
        // unrelated table whose path merely ends with sourceDir, and
        // a relative-vs-absolute registration mismatch would MISS
        // entries (an erasure hole, not just a perf loss)
        val want = normDir(sourceDir)
        // split on the FIRST '|' only (ResultCache.fingerprint's
        // separator — its format guard forbids '|' in queryId and
        // '|'/',' in dirs, but an entry written by anything else must
        // not silently survive an erasure): an unparseable
        // fingerprint is dropped CONSERVATIVELY — cache entries are
        // recomputable by definition, a kept entry could be a GDPR
        // exposure hole.
        val vs = Snapshots.dropKeyedVersions(spark, cacheDir, fp =>
          fp.split("\\|", 2) match {
            case Array(_, inputs) => inputs.split(',').exists { tok =>
              val i = tok.lastIndexOf("@v")
              i > 0 && normDir(tok.substring(0, i)) == want
            }
            case _ => true // no separator at all: not ours — drop, don't keep
          })
        Action("result_cache", cacheDir, "entries_dropped", vs.mkString(","))
      case KeyedTable(dir, ren) =>
        val renamed = ren.foldLeft(keys) { case (k, (from, to)) =>
          k.withColumnRenamed(from, to) }
        val vs = Snapshots.purgeKeys(spark, dir, renamed)
        Action("keyed_table", dir, "history_rewritten", vs.mkString(","))
      case Reland(dir, rebuild) =>
        rebuild(spark)
        val dropped = Snapshots.vacuum(spark, dir, keepLast = 1)
        Action("stats", dir, "relanded", s"vacuumed:${dropped.mkString(",")}")
      case gi: GraphIndex =>
        require(keys.columns.length == 1,
          s"GraphIndex purge needs a single-column id key set, " +
            s"got ${keys.columns.mkString(",")}")
        val kid = keys.select(col(s"`${keys.columns.head}`").as(gi.idCol))
        val corpus = Snapshots.readResolved(spark, gi.corpusDir)
        val cents = Snapshots.readResolved(spark, gi.centroidsDir)
        val edges = Snapshots.readResolved(spark, gi.adjDir)
        val rep = graft.ops.Nsw.purgeRepair(edges, corpus, gi.idCol,
          gi.vecCol, cents, gi.blocks, gi.m, kid)
        // the repaired HEAD lands as v31's merge-on-read pair first …
        val head = Snapshots.versions(spark, gi.adjDir).last
        val dv = Snapshots.commitDeletes(rep.touched, gi.adjDir,
          base = head, staged = true)
        Snapshots.commitAppend(rep.delta, gi.adjDir, base = dv)
        // … then the purged ids leave EVERY version's bytes — both as
        // edge sources (a) and as neighbor-list entries (b); the "a"
        // pass also scrubs them from the just-landed DV's key file
        val asA = Snapshots.purgeKeys(spark, gi.adjDir,
          kid.select(col(gi.idCol).as("a")))
        val asB = Snapshots.purgeKeys(spark, gi.adjDir,
          kid.select(col(gi.idCol).as("b")))
        // entry re-election from the already-purged assignment (the
        // registry applies artifacts in registration order); the old
        // entry version — which may NAME a purged node — is then
        // physically vacuumed, not merely superseded
        val ent2 = graft.ops.Nsw.entries(
          Snapshots.readResolved(spark, gi.assignDir), gi.idCol)
        // ordering guard: if the assignment table was not purged
        // first (its KeyedTable registered BEFORE this artifact), a
        // purged id can win re-election and the erasure silently
        // fails — refuse loudly instead (entries are model-sized, so
        // this check is one broadcast semi-join)
        require(ent2.join(kid.select(col(gi.idCol).as("node")),
            Seq("node"), "left_semi").isEmpty,
          s"GraphIndex purge: a purged id is still elected in " +
            s"${gi.entDir} — register the assignment table's " +
            "KeyedTable BEFORE the GraphIndex artifact")
        Snapshots.commit(ent2, gi.entDir)
        Snapshots.vacuum(spark, gi.entDir, keepLast = 1)
        Action("graph_index", gi.adjDir, "locally_repaired",
          s"adj_scrubbed:${(asA ++ asB).distinct.sorted.mkString(",")};" +
            s"entries_reelected:${gi.entDir}")
    }
  }

  /** Rows across a table's FULL version history (staged included) in
    * which a scanned column — or any element of a scanned array, any
    * field of a scanned struct (recursively), or any key/value of a
    * scanned map — equals one of the purged key values, each value
    * cast to the leaf's own type. Every column of a MULTI-column key
    * set contributes its values. `cols` names the IDENTIFIER-BEARING
    * columns to scan (empty = every column): a cardinality column
    * (`n_rows`) or an unrelated measure coincidentally equal to a key
    * NUMBER is not the purged identifier, and scanning it would make
    * the witness flap — the caller names where the identifier can
    * live; value-derived stats (min/max/histogram boundaries) count,
    * row counts don't. The erasure witness: 0 after a correct purge —
    * and it CANNOT lie by omission: a named column that never matches
    * any version's schema, or whose type has no scannable leaf,
    * raises instead of vacuously reporting 0. */
  def exposureCount(spark: SparkSession, dir: String, keys: DataFrame,
                    cols: Seq[String] = Nil): Long = {
    // The key set rides as DATA (one broadcast row carrying the
    // string-normalized values, cast per leaf at compare time), never
    // as plan literals — the earlier isin form embedded every key as
    // an expression, so a million-key purge batch would blow the plan
    // before the first scan. Compare semantics are unchanged: each
    // value casts to the leaf's own type (`97` matches a DOUBLE 97.0
    // boundary; an uncastable value becomes a null element, which —
    // like a null isin literal — can never assert a match).
    val asStr = keys.columns.map(c => col(s"`$c`").cast("string"))
    val keyValsDf = keys
      .select(explode(array(asStr: _*)).as("_v"))
      .filter(col("_v").isNotNull).distinct()
    if (keyValsDf.isEmpty) return 0L
    val kvRow = broadcast(
      keyValsDf.agg(sort_array(collect_set(col("_v"))).as("_kva")))
    // every scannable-leaf condition under one top-level column
    def leafConds(path: org.apache.spark.sql.Column,
                  dt: DataType): Seq[org.apache.spark.sql.Column] = dt match {
      case _: NumericType | StringType =>
        Seq(coalesce(
          array_contains(col("_kva").cast(ArrayType(dt)), path), lit(false)))
      case ArrayType(et, _) if et.isInstanceOf[NumericType] || et == StringType =>
        Seq(coalesce(
          arrays_overlap(path, col("_kva").cast(ArrayType(et))), lit(false)))
      case st: StructType =>
        st.fields.toSeq.flatMap(f => leafConds(path.getField(f.name), f.dataType))
      case MapType(kt, vt, _) =>
        leafConds(map_keys(path), ArrayType(kt)) ++
          leafConds(map_values(path), ArrayType(vt))
      case _ => Nil
    }
    val matchedNames = scala.collection.mutable.Set[String]()
    val wanted = cols.map(_.toLowerCase).toSet
    val total = Snapshots.allVersions(spark, dir).map { v =>
      val df = Snapshots.read(spark, dir, Some(v))
      val conds = df.schema.fields.toSeq
        .filter(f => wanted.isEmpty || wanted(f.name.toLowerCase))
        .flatMap { f =>
          val cs = leafConds(col(s"`${f.name}`"), f.dataType)
          if (cs.nonEmpty) matchedNames += f.name.toLowerCase
          cs
        }
      if (conds.isEmpty) 0L
      else df.crossJoin(kvRow).filter(conds.reduce(_ || _)).count()
    }.sum
    val unscanned = wanted -- matchedNames
    require(unscanned.isEmpty,
      s"exposureCount: named column(s) ${unscanned.toSeq.sorted.mkString(", ")} " +
        s"were never scanned under $dir (absent from every version's schema " +
        "or no scannable leaf) — the witness would be vacuous")
    total
  }

  private def normDir(d: String): String =
    java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
}
