package graft.meta

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** The JDBC (embedded Derby) orchestration repository: interface parity
  * with the file backend, atomic HWM commit under same-table contention,
  * and database-allocated audit ids that cannot cross-wire two
  * concurrent commands sharing one store. */
class JdbcMetaRepoSpec extends AnyFunSuite {

  private def derbyUrl(): String =
    "jdbc:derby:" +
      Files.createTempDirectory("graft_repo").resolve("db").toString

  private def sampleMeta(table: String, hwm: String) = OffloadMetadata(
    sourceTable = table,
    backendTable = s"backend.$table",
    offloadType = "INCREMENTAL",
    incrementalKey = Seq("k1", "k2"),
    incrementalHighValue = Seq(hwm, hwm + "b"),
    incrementalPredicateType = Some("PREDICATE"),
    incrementalPredicateValue = Seq("(column(c) < numeric(9))"),
    bucketColumns = Seq("k1"),
    sortColumns = Seq("k2", "k1"),
    snapshotId = Some(42L),
    pendingChunkKeys = Seq("k1"),
    pendingChunkHwm = Seq("17"),
    writerTimeZone = Some("UTC"))

  test("save/load round-trips every field and upserts in place") {
    val url = derbyUrl()
    val m = sampleMeta("orders", "100")
    MetadataStore.save(url, m)
    assert(MetadataStore.load(url, "orders").contains(m))
    // in-place update: same key, new HWM, cleared pending marker
    val m2 = m.copy(incrementalHighValue = Seq("200", "200b"),
      pendingChunkKeys = Nil, pendingChunkHwm = Nil, snapshotId = None,
      writerTimeZone = None)
    MetadataStore.save(url, m2)
    assert(MetadataStore.load(url, "orders").contains(m2))
    assert(MetadataStore.load(url, "absent").isEmpty)
  }

  test("file and jdbc backends serve identical metadata semantics") {
    val url = derbyUrl()
    val dir = Files.createTempDirectory("graft_meta_file").toString
    val m = sampleMeta("nation", "7")
    MetadataStore.save(url, m)
    MetadataStore.save(dir, m)
    assert(MetadataStore.load(url, "nation") ===
      MetadataStore.load(dir, "nation"))
  }

  test("concurrent same-table saves commit atomically — the surviving " +
      "row is one writer's complete document, never a splice") {
    val url = derbyUrl()
    val docs = (0 until 24).map(i => sampleMeta("lineitem",
      s"hwm$i").copy(snapshotId = Some(i.toLong)))
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    docs.foreach { d =>
      pool.execute { () =>
        start.await(); MetadataStore.save(url, d)
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    val got = MetadataStore.load(url, "lineitem").get
    // whichever save won, its fields must be mutually consistent: the
    // snapshot id and the HWM tuple were written by the same save
    assert(got.incrementalHighValue ===
      Seq(s"hwm${got.snapshotId.get}", s"hwm${got.snapshotId.get}b"))
  }

  test("two concurrent audited commands share the store without " +
      "cross-wired ids; a reopened handle sees committed history") {
    val url = derbyUrl()
    val audit = CommandAudit.open(url)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def run(table: String): java.util.concurrent.Future[String] =
      pool.submit { () =>
        start.await()
        val exec = CommandAudit.newExecutionId()
        val cid = audit.startCommand(exec, "OFFLOAD", s"offload $table")
        (1 to 5).foreach { i =>
          val sid = audit.startStep(exec, "OFFLOAD", s"step_${table}_$i")
          val kid = audit.startChunk(exec, i, Seq(s"p=$i"))
          audit.endChunk(kid, CommandAudit.Success, Some(i * 10L))
          audit.endStep(sid, CommandAudit.Success, s"done $i")
        }
        audit.endCommand(cid, CommandAudit.Success)
        exec
      }
    val (fa, fb) = (run("orders"), run("lineitem"))
    start.countDown()
    val (ea, eb) = (fa.get(60, TimeUnit.SECONDS),
      fb.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    val runs = audit.runs()
    assert(runs.size === 2 && runs.forall(_.status ==
      CommandAudit.Success))
    val Seq(ra, rb) = Seq(ea, eb).map(e =>
      runs.find(_.executionId == e).get)
    // each command sees exactly its OWN five steps and five chunks
    Seq(ra -> "orders", rb -> "lineitem").foreach { case (r, table) =>
      assert(r.steps.map(_.step).toSet ===
        (1 to 5).map(i => s"step_${table}_$i").toSet)
      assert(r.chunks.map(_.chunkNumber).sorted === (1 to 5))
      assert(r.steps.forall(_.status == CommandAudit.Success))
      assert(r.chunks.forall(_.rowCount.isDefined))
    }
    // database identity: every id unique across both writers
    val stepIds = runs.flatMap(_.steps.map(_.stepId))
    val chunkIds = runs.flatMap(_.chunks.map(_.chunkId))
    assert(stepIds.distinct.size === stepIds.size)
    assert(chunkIds.distinct.size === chunkIds.size)
    assert(runs.map(_.commandId).distinct.size === 2)
    // run() resolves by execution id, same as the file backend
    assert(audit.run(ea).map(_.commandInput)
      .contains("offload orders"))
  }

  test("engine version registers once in goe_version and stamps every " +
      "command row") {
    val url = derbyUrl()
    val audit = CommandAudit.open(url)
    val c1 = audit.startCommand(CommandAudit.newExecutionId(), "OFFLOAD",
      "a")
    audit.endCommand(c1, CommandAudit.Success)
    audit.startCommand(CommandAudit.newExecutionId(), "OFFLOAD", "b")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val rv = st.executeQuery(
        "SELECT COUNT(*) FROM goe_version WHERE version = '" +
          JdbcMetaRepo.EngineVersion + "'")
      rv.next(); assert(rv.getLong(1) === 1L); rv.close()
      val rc = st.executeQuery(
        "SELECT COUNT(*) FROM command_execution WHERE goe_version = '" +
          JdbcMetaRepo.EngineVersion + "'")
      rc.next(); assert(rc.getLong(1) === 2L); rc.close()
      st.close()
    } finally conn.close()
  }

  test("listTables inventories the repo like the file backend's " +
      "directory listing") {
    val url = derbyUrl()
    val dir = Files.createTempDirectory("graft_meta_list").toString
    Seq("orders", "lineitem").foreach { t =>
      MetadataStore.save(url, sampleMeta(t, "1"))
      MetadataStore.save(dir, sampleMeta(t, "1"))
    }
    assert(MetadataStore.listTables(url) === Seq("lineitem", "orders"))
    assert(MetadataStore.listTables(url) === MetadataStore.listTables(dir))
  }

  test("fsScratch derives a filesystem home beside a derby db and is " +
      "the identity on plain dirs") {
    assert(JdbcMetaRepo.fsScratch("/tmp/x") === "/tmp/x")
    assert(JdbcMetaRepo.fsScratch("jdbc:derby:/tmp/db;create=true") ===
      "/tmp/db_aux")
    val mem = JdbcMetaRepo.fsScratch("jdbc:derby:memory:db1")
    assert(mem.contains("graft_repo_") && !mem.startsWith("jdbc:"))
  }

  test("EMBEDDED Derby refuses a second PROCESS (XJ040/XSDB6, pinned by " +
      "a forked JVM) — multi-process sharing needs a server-mode DB") {
    val url = derbyUrl()
    val dbPath = url.stripPrefix("jdbc:derby:")
    // boot the database in THIS process and hold it booted (db.lck)
    MetadataStore.save(url, sampleMeta("orders", "100"))
    // a genuinely separate JVM attempts the same embedded database
    val pb = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/java",
      "-cp", System.getProperty("java.class.path"),
      "graft.meta.XsdbProbe", dbPath)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor(60, TimeUnit.SECONDS), "probe JVM hung")
    assert(!out.contains("CONNECTED"),
      s"second process connected to an embedded Derby db: $out")
    assert(out.contains("XSDB6") || out.contains("XJ040"),
      s"expected XJ040/XSDB6 boot refusal, got: $out")
    // and this process's repo is unharmed by the refused boot
    MetadataStore.save(url, sampleMeta("orders", "200"))
    assert(MetadataStore.load(url, "orders")
      .exists(_.incrementalHighValue.head == "200"))
  }

  test("audit history reads run on their own connection: a reader loop " +
      "interleaved with live step writes never stalls and ids stay " +
      "monotone") {
    val url = derbyUrl()
    val audit = CommandAudit.open(url)
    val execId = CommandAudit.newExecutionId()
    val cmdId = audit.startCommand(execId, "OFFLOAD", "t1", Map.empty)
    val writerDone = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val writer = pool.submit(new Runnable {
      def run(): Unit = {
        (0 until 120).foreach { i =>
          val sid = audit.startStep(execId, "OFFLOAD", s"step_$i")
          audit.endStep(sid, CommandAudit.Success, s"d$i")
        }
        audit.endCommand(cmdId, CommandAudit.Success)
        writerDone.countDown()
      }
    })
    // full-history reads while the writer is live — on a shared
    // connection+lock these would serialize into one long convoy; on
    // the dedicated read connection both sides make steady progress
    var reads = 0
    while (writerDone.getCount > 0 && reads < 10000) {
      audit.runs(); reads += 1
    }
    writer.get(60, TimeUnit.SECONDS)
    pool.shutdown()
    assert(reads > 0)
    val run = audit.runs().find(_.executionId == execId).get
    assert(run.steps.length === 120)
    val ids = run.steps.map(_.stepId)
    assert(ids == ids.sorted && ids.distinct.length == ids.length,
      s"step ids not monotone/distinct: $ids")
    assert(run.status === CommandAudit.Success)
  }
}
