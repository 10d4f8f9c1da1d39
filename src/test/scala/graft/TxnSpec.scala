package graft

import org.apache.spark.sql.functions._
import graft.sources.{Snapshots, TxnDecidedException}

/** Multi-table atomic transactions (x45): the decision marker is the
  * single commit point across tables — before it exists nothing is
  * visible, the instant it exists everything is (even with zero log
  * repair), and the marker's create-exclusive creation makes
  * commit/abort a one-winner race. */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("txn").toString + "/t"

  private def id(): String = java.util.UUID.randomUUID().toString

  test("staged participants are invisible; the marker alone flips both visible") {
    val (a, b, txnDir) = (freshDir(), freshDir(), freshDir())
    Snapshots.commit(Seq((1L, "old")).toDF("k", "v"), a)
    Snapshots.commit(Seq((1L, 10L)).toDF("k", "n"), b)
    val t = id()
    Snapshots.txnStage(Seq((1L, "new"), (2L, "new")).toDF("k", "v"), a, txnDir, t)
    Snapshots.txnStage(Seq((1L, 20L), (2L, 20L)).toDF("k", "n"), b, txnDir, t)
    // no marker: both tables still resolve their v1 state
    assert(Snapshots.versions(spark, a) == Seq(1))
    assert(Snapshots.versions(spark, b) == Seq(1))
    assert(Snapshots.read(spark, a).count() == 1)
    assert(Snapshots.txnStatus(spark, txnDir, t) == "pending")
    // marker only — repair deliberately skipped (the crash-after-
    // commit-point window): BOTH tables must already serve v2
    Snapshots.txnCommit(spark, txnDir, t, repair = false)
    assert(Snapshots.versions(spark, a) == Seq(1, 2))
    assert(Snapshots.versions(spark, b) == Seq(1, 2))
    assert(Snapshots.read(spark, a).count() == 2)
    assert(Snapshots.read(spark, b).count() == 2)
    // lazy repair changes nothing observable and is idempotent
    Snapshots.txnRepair(spark, txnDir, t, Seq(a, b))
    Snapshots.txnRepair(spark, txnDir, t, Seq(a, b))
    assert(Snapshots.versions(spark, a) == Seq(1, 2))
    assert(Snapshots.read(spark, b).count() == 2)
  }

  test("partial repair (crash mid-repair) leaves every participant visible") {
    val (a, b, txnDir) = (freshDir(), freshDir(), freshDir())
    val t = id()
    Snapshots.txnStage(Seq((1L, "x")).toDF("k", "v"), a, txnDir, t)
    Snapshots.txnStage(Seq((1L, "y")).toDF("k", "v"), b, txnDir, t)
    Snapshots.txnCommit(spark, txnDir, t, repair = false)
    Snapshots.txnRepair(spark, txnDir, t, Seq(a)) // crash before b's flip
    assert(Snapshots.versions(spark, a) == Seq(1), "repaired entry")
    assert(Snapshots.versions(spark, b) == Seq(1), "marker-resolved entry")
    assert(Snapshots.read(spark, b).count() == 1)
  }

  test("abort makes participants permanent ghosts; the decision is final") {
    val (a, b, txnDir) = (freshDir(), freshDir(), freshDir())
    Snapshots.commit(Seq((1L, "keep")).toDF("k", "v"), a)
    val t = id()
    Snapshots.txnStage(Seq((9L, "bad")).toDF("k", "v"), a, txnDir, t)
    Snapshots.txnStage(Seq((9L, "bad")).toDF("k", "v"), b, txnDir, t)
    Snapshots.txnAbort(spark, txnDir, t)
    Snapshots.txnAbort(spark, txnDir, t) // idempotent
    assert(Snapshots.versions(spark, a) == Seq(1))
    assert(Snapshots.versions(spark, b) == Seq.empty)
    assert(Snapshots.read(spark, a).collect().map(_.getString(1)).toSeq == Seq("keep"))
    intercept[TxnDecidedException] {
      Snapshots.txnCommit(spark, txnDir, t)
    }
    // the staged data remains audit-readable by explicit version pin
    assert(Snapshots.read(spark, a, Some(2)).count() == 1)
  }

  test("commit vs abort is a one-winner race; every observer agrees") {
    val txnDir = freshDir()
    val results = (1 to 20).map { _ =>
      val t = id()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val commit = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            try { Snapshots.txnCommit(spark, txnDir, t); "committed" }
            catch { case _: TxnDecidedException => "lost" }
        })
        val abort = pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            try { Snapshots.txnAbort(spark, txnDir, t); "aborted" }
            catch { case _: TxnDecidedException => "lost" }
        })
        val outcomes = Seq(commit.get(), abort.get())
        val status = Snapshots.txnStatus(spark, txnDir, t)
        // exactly one side's verb matches the decided status, and the
        // winner is whichever created the marker
        assert(outcomes.count(_ != "lost") >= 1)
        assert(outcomes.contains(status) || outcomes.count(_ == "lost") == 0,
          s"status $status vs outcomes $outcomes")
        status
      } finally pool.shutdown()
    }
    assert(results.forall(s => s == "committed" || s == "aborted"))
  }

  test("vacuum: aborted-txn ghosts age out; committed-unrepaired hold slots") {
    val (a, txnDir) = (freshDir(), freshDir())
    Snapshots.commit(Seq((1L, "v1")).toDF("k", "v"), a)
    val dead = id()
    Snapshots.txnStage(Seq((2L, "dead")).toDF("k", "v"), a, txnDir, dead)
    Snapshots.txnAbort(spark, txnDir, dead)
    val live = id()
    Snapshots.txnStage(Seq((3L, "live")).toDF("k", "v"), a, txnDir, live)
    Snapshots.txnCommit(spark, txnDir, live, repair = false)
    Snapshots.commit(Seq((4L, "v4")).toDF("k", "v"), a)
    // keep 2 published: v3 (txn-committed, unrepaired) and v4 stay;
    // v1 leaves the window; v2 is an aborted ghost older than the
    // oldest kept published version -> collected
    val dropped = Snapshots.vacuum(spark, a, keepLast = 2)
    assert(dropped.toSet == Set(1, 2), s"dropped $dropped")
    assert(Snapshots.versions(spark, a) == Seq(3, 4))
    assert(Snapshots.read(spark, a, Some(3)).collect()
      .map(_.getString(1)).toSeq == Seq("live"))
  }

  test("plain WAP staging is untouched by txn machinery") {
    val dir = freshDir()
    Snapshots.commit(Seq((1L, "pub")).toDF("k", "v"), dir)
    val staged = Snapshots.commitStaged(Seq((2L, "wap")).toDF("k", "v"), dir)
    assert(Snapshots.versions(spark, dir) == Seq(1))
    Snapshots.publish(spark, dir, staged)
    assert(Snapshots.versions(spark, dir) == Seq(1, 2))
  }

  test("x113: a snapshot reader racing committing txns never observes a torn pair") {
    val (a, b, txnDir) = (freshDir(), freshDir(), freshDir())
    // every generation g commits a+b ATOMICALLY with g rows each —
    // the cross-table invariant a torn read breaks: |a| == |b|
    def gen(g: Int): Unit = {
      val t = id()
      Snapshots.txnStage((1 to g).map(i => (i.toLong, s"a$g"))
        .toDF("k", "v"), a, txnDir, t)
      Snapshots.txnStage((1 to g).map(i => (i.toLong, s"b$g"))
        .toDF("k", "v"), b, txnDir, t)
      Snapshots.txnCommit(spark, txnDir, t, Seq(a, b))
    }
    gen(1)
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val pins = Snapshots.snapshotAll(spark, Seq(a, b))
        val na = Snapshots.readResolved(spark, a, Some(pins(a))).count()
        val nb = Snapshots.readResolved(spark, b, Some(pins(b))).count()
        reads.incrementAndGet()
        if (na != nb) torn.incrementAndGet()
      }
    })
    reader.start()
    (2 to 12).foreach(gen)
    stop.set(true)
    reader.join()
    assert(torn.get() == 0,
      s"torn cross-table reads observed: ${torn.get()} of ${reads.get()}")
    assert(reads.get() > 0, "the reader must actually have raced the writers")
    // and the independent-latest read CAN tear conceptually — the
    // snapshot's pins are what rule it out; final state sanity:
    val fin = Snapshots.snapshotAll(spark, Seq(a, b))
    assert(Snapshots.readResolved(spark, a, Some(fin(a))).count() == 12)
    assert(Snapshots.readResolved(spark, b, Some(fin(b))).count() == 12)
  }
}
