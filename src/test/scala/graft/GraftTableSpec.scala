package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** ACID-lite copy-on-write table (VERDICT r9 missing-item 3): the
  * manifest protocol must deliver the three file-level claims the
  * query-level q_merge_upsert simulation cannot — snapshot isolation
  * under concurrent mutation, rewrite-only-touched-files, and
  * optimistic conflict detection — while producing EXACTLY the
  * query's merge semantics. */
class GraftTableSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshRoot(): String = {
    val p = Files.createTempDirectory("graft_table_")
    p.toString
  }

  private def docs = Tables(spark, sf, "documents")
    .select(col("doc_id"), col("text"), col("lang"), col("source"))

  /** The q_merge_upsert change derivation (doc_id mod 7: 0 → update,
    * 1 → delete, 2 → insert-as-new-id) in GraftTable's change-batch
    * shape. */
  private def changeBatch = docs.where(col("doc_id") % 7 < 3)
    .select(
      when(col("doc_id") % 7 === 2, col("doc_id") + 10000000L)
        .otherwise(col("doc_id")).as("doc_id"),
      when(col("doc_id") % 7 === 0, concat(lit("updated: "), col("text")))
        .when(col("doc_id") % 7 === 2, concat(lit("inserted: "), col("text")))
        .otherwise(lit(null).cast("string")).as("new_text"),
      (col("doc_id") % 7 === 1).as("is_delete"),
      when(col("doc_id") % 7 === 2, col("lang"))
        .otherwise(lit(null).cast("string")).as("new_lang"),
      when(col("doc_id") % 7 === 2, col("source"))
        .otherwise(lit(null).cast("string")).as("new_source"))

  test("create + read roundtrip across range-clustered files") {
    val root = freshRoot()
    val snap = GraftTable.create(spark, root, docs, "doc_id", 4)
    assert(snap.version === 1)
    assert(snap.files.size === 4)
    // range layout: file key intervals must not overlap
    val sorted = snap.files.sortBy(_.minKey)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey < b.minKey,
        s"overlapping file ranges: $a / $b")
      case _ =>
    }
    val back = GraftTable.read(spark, root)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("merge applies q_merge_upsert semantics at file level") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 4)
    val (snap, stats) = GraftTable.merge(spark, root, changeBatch)
    assert(snap.version === 2)

    // expected snapshot: the query-level full-outer merge
    val chg = changeBatch
    val expected = docs.join(chg
        .withColumnRenamed("doc_id", "k"),
        col("doc_id") === col("k"), "full_outer")
      .where(!coalesce(col("is_delete"), lit(false)))
      .select(coalesce(col("doc_id"), col("k")).as("doc_id"),
        coalesce(col("new_text"), col("text")).as("text"),
        coalesce(col("new_lang"), col("lang")).as("lang"),
        coalesce(col("new_source"), col("source")).as("source"))
    val actual = GraftTable.read(spark, root)
      .select("doc_id", "text", "lang", "source")
    assert(actual.exceptAll(expected).isEmpty &&
      expected.exceptAll(actual).isEmpty,
      "file-level merge diverged from the query-level merge")

    // reported counts match the change derivation
    val nUpd = changeBatch.where(!col("is_delete") &&
      col("doc_id") < 10000000L).count()
    val nDel = changeBatch.where(col("is_delete")).count()
    val nIns = changeBatch.where(col("doc_id") >= 10000000L).count()
    assert(stats.rowsUpdated === nUpd)
    assert(stats.rowsDeleted === nDel)
    assert(stats.rowsInserted === nIns)
  }

  test("snapshot isolation: a resolved reader is immune to later commits") {
    val root = freshRoot()
    val v1 = GraftTable.create(spark, root, docs, "doc_id", 4)
    val pinned = GraftTable.read(spark, v1) // resolved BEFORE the merge
    val before = pinned.count()
    GraftTable.merge(spark, root, changeBatch)
    // the pinned frame still reads version 1's files — bit-identical
    assert(pinned.count() === before)
    assert(pinned.exceptAll(docs).isEmpty && docs.exceptAll(pinned).isEmpty,
      "v1 reader saw writes from v2")
    // and the explicit time-travel read agrees
    val v1again = GraftTable.read(spark, GraftTable.snapshot(root, 1))
    assert(v1again.exceptAll(docs).isEmpty)
    assert(GraftTable.latest(root).version === 2)
  }

  test("merge rewrites ONLY files whose key range is touched") {
    val root = freshRoot()
    val v1 = GraftTable.create(spark, root, docs, "doc_id", 4)
    // confine the change batch to the lowest file's key range
    val lowFile = v1.files.minBy(_.minKey)
    val narrow = changeBatch
      .where(col("doc_id") <= lowFile.maxKey && !col("is_delete") &&
        col("doc_id") < 10000000L)
    assert(narrow.count() > 0, "test premise: some update hits file 1")
    val (snap, stats) = GraftTable.merge(spark, root, narrow)
    assert(stats.filesRewritten === 1,
      s"expected 1 rewritten file, got ${stats.filesRewritten}")
    assert(stats.filesKept === 3)
    // untouched files are carried BY REFERENCE (same physical path)
    val keptPaths = snap.files.map(_.path).toSet
    val untouched = v1.files.filterNot(_ == lowFile).map(_.path)
    assert(untouched.forall(keptPaths), "untouched file was rewritten")
    assert(!keptPaths(lowFile.path), "touched file still referenced")
  }

  test("CDC log compaction applies last-writer-wins at file level") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 4)
    // per doc_id%5: 0 → U then D (delete wins), 1 → D then U (update
    // wins), 2 → two U's (later value wins); others untouched
    val touchedDocs = docs.where(col("doc_id") % 5 < 3)
    val log = touchedDocs.select(col("doc_id"),
        lit(1L).as("chg_seq"),
        when(col("doc_id") % 5 === 0, lit("U")).otherwise(
          when(col("doc_id") % 5 === 1, lit("D")).otherwise(lit("U")))
          .as("op"),
        concat(lit("first: "), col("text")).as("new_text"),
        lit(null).cast("string").as("new_lang"),
        lit(null).cast("string").as("new_source"))
      .unionByName(touchedDocs.select(col("doc_id"),
        lit(2L).as("chg_seq"),
        when(col("doc_id") % 5 === 0, lit("D")).otherwise(lit("U"))
          .as("op"),
        concat(lit("last: "), col("text")).as("new_text"),
        lit(null).cast("string").as("new_lang"),
        lit(null).cast("string").as("new_source")))
    val (_, stats) = GraftTable.applyCdc(spark, root, log, Seq("chg_seq"))
    val after = GraftTable.read(spark, root)
    // mod-0 docs deleted, mod-1 and mod-2 carry the LAST change's text
    assert(after.where(col("doc_id") % 5 === 0).count() === 0)
    val survivors = after.where(col("doc_id") % 5 === 1 ||
      col("doc_id") % 5 === 2)
    assert(survivors.count() ===
      docs.where(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2).count())
    assert(survivors.where(!col("text").startsWith("last: ")).count() === 0,
      "a survivor kept a non-final change")
    // untouched docs unchanged
    val untouched = after.where(col("doc_id") % 5 >= 3)
    val wantUntouched = docs.where(col("doc_id") % 5 >= 3)
    assert(untouched.exceptAll(wantUntouched).isEmpty &&
      wantUntouched.exceptAll(untouched).isEmpty)
    assert(stats.rowsDeleted ===
      docs.where(col("doc_id") % 5 === 0).count())
  }

  test("rewrites preserve range clustering; vacuum reclaims old files") {
    val root = freshRoot()
    val v1 = GraftTable.create(spark, root, docs, "doc_id", 4)
    // update-only batch confined to the lowest file
    val lowFile = v1.files.minBy(_.minKey)
    val narrow = changeBatch.where(col("doc_id") <= lowFile.maxKey &&
      !col("is_delete") && col("doc_id") < 10000000L)
    val (v2, _) = GraftTable.merge(spark, root, narrow)
    // the rewritten file's key range stays inside the original's —
    // merges don't blend ranges, so min/max pruning quality survives
    val rewritten = v2.files.filterNot(f =>
      v1.files.map(_.path).contains(f.path))
    assert(rewritten.size === 1)
    assert(rewritten.head.minKey >= lowFile.minKey &&
      rewritten.head.maxKey <= lowFile.maxKey,
      s"rewrite blended ranges: ${rewritten.head} vs $lowFile")

    // vacuum keep=1 (age guard 0: quiesced table, no concurrent
    // writer to protect): v1's superseded file + v1's manifest go
    // away; every file the latest snapshot references survives
    val (dataDeleted, manifestsDeleted) =
      GraftTable.vacuum(root, 1, minFileAgeMs = 0L)
    assert(dataDeleted === 1, s"expected 1 reclaimed file, got $dataDeleted")
    assert(manifestsDeleted >= 1)
    assert(!Files.exists(Paths.get(lowFile.path)), "superseded file kept")
    val after = GraftTable.read(spark, root)
    assert(after.count() === v2.totalRows, "latest snapshot lost rows")
    intercept[Exception] { GraftTable.snapshot(root, 1) } // time travel gone
  }

  test("streaming upsertSink applies micro-batches idempotently") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 2)
    val ids = docs.select("doc_id").as[Long].collect().sorted.take(6)

    val mem = MemoryStream[(Long, Long, String, String)]
    val sink = GraftTable.upsertSink(root, Seq("chg_seq"))
    val q = mem.toDS()
      .toDF("doc_id", "chg_seq", "op", "new_text")
      .withColumn("new_lang", lit(null).cast("string"))
      .withColumn("new_source", lit(null).cast("string"))
      .writeStream.foreachBatch(sink).outputMode("append").start()
    try {
      mem.addData((ids(0), 1L, "U", "b1 update"), (ids(1), 1L, "D", null))
      q.processAllAvailable()
      mem.addData((ids(1), 2L, "U", "b2 resurrect"), (ids(2), 2L, "D", null))
      q.processAllAvailable()
    } finally q.stop()

    val state = GraftTable.read(spark, root)
    assert(state.where(col("doc_id") === ids(0) &&
      col("text") === "b1 update").count() === 1)
    // deleted in batch 0, re-inserted in batch 1 — last writer wins
    // ACROSS micro-batches because each batch merges against the
    // previous batch's committed snapshot
    assert(state.where(col("doc_id") === ids(1) &&
      col("text") === "b2 resurrect").count() === 1)
    assert(state.where(col("doc_id") === ids(2)).count() === 0)

    // crash-replay idempotence: re-delivering an already-committed
    // batch id is a no-op (the manifest's batch marker gates it)
    val vBefore = GraftTable.currentVersion(root)
    val replay = Seq((ids(0), 9L, "U", "replayed — must not apply"))
      .toDF("doc_id", "chg_seq", "op", "new_text")
      .withColumn("new_lang", lit(null).cast("string"))
      .withColumn("new_source", lit(null).cast("string"))
    sink(replay, 1L) // batch id 1 already committed
    assert(GraftTable.currentVersion(root) === vBefore,
      "replayed batch was re-applied")
    assert(GraftTable.read(spark, root).where(
      col("text").startsWith("replayed")).count() === 0)
  }

  test("stale lock from a crashed writer is reclaimed after expiry") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 2)
    // a crashed writer's leftover: v2 claimed, never published, and
    // old enough that no live writer can still be inside its publish
    val lock = Paths.get(root, "manifest", "v2.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis - 3600L * 1000))
    // 1 h age > the 10 min default expiry → the next commit reclaims
    // the slot instead of throwing forever (ADVICE r10 #1)
    val (snap, _) = GraftTable.merge(spark, root, changeBatch)
    assert(snap.version === 2)
    assert(GraftTable.currentVersion(root) === 2)
  }

  test("vacuum retention: young unreferenced files survive the window") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 4)
    val v1files = GraftTable.latest(root).files.map(_.path)
    GraftTable.merge(spark, root, changeBatch)
    // default retention (7 d): every file just written is inside the
    // window — vacuum must delete NOTHING, because an unreferenced
    // young file is indistinguishable from a concurrent merge's
    // staged-but-uncommitted output (ADVICE r10 #2)
    val (dataDeleted, _) = GraftTable.vacuum(root, 1)
    assert(dataDeleted === 0,
      s"retention window violated: $dataDeleted young files deleted")
    assert(v1files.forall(p => Files.exists(Paths.get(p))))
    // quiesced override reclaims them
    val (reclaimed, _) = GraftTable.vacuum(root, 1, minFileAgeMs = 0L)
    assert(reclaimed > 0)
  }

  test("pinned version survives vacuum; time-travel read stays exact") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 4)
    GraftTable.pin(root, 1)
    GraftTable.merge(spark, root, changeBatch)
    GraftTable.merge(spark, root,
      changeBatch.where(!col("is_delete") && col("doc_id") < 10000000L))
    // keep=1 would normally drop v1+v2; the pin must hold v1's
    // manifest AND every file it references
    GraftTable.vacuum(root, 1, minFileAgeMs = 0L)
    val v1 = GraftTable.read(spark, root, 1)
    assert(v1.exceptAll(docs).isEmpty && docs.exceptAll(v1).isEmpty,
      "pinned version no longer reads back exactly")
    assert(GraftTable.pinnedVersions(root) === Set(1))
    // unpinned, the next vacuum reclaims it
    GraftTable.unpin(root, 1)
    GraftTable.vacuum(root, 1, minFileAgeMs = 0L)
    intercept[Exception] { GraftTable.snapshot(root, 1) }
  }

  test("compaction bounds file count under repeated merges") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 4)
    // K insert-bearing merges add one file each
    val K = 5
    (1 to K).foreach { i =>
      val inserts = docs.limit(20).select(
        (col("doc_id") + 10000000L * i).as("doc_id"),
        concat(lit(s"ins$i: "), col("text")).as("new_text"),
        lit(false).as("is_delete"),
        col("lang").as("new_lang"), col("source").as("new_source"))
      GraftTable.merge(spark, root, inserts)
    }
    val before = GraftTable.latest(root)
    assert(before.files.size === 4 + K, "premise: one new file per merge")
    val want = GraftTable.read(spark, root).cache()
    val wantRows = want.count()

    val (snap, stats) = GraftTable.compact(spark, root,
      targetRows = before.totalRows) // everything fits → minimal file set
    assert(stats.filesAfter < stats.filesBefore)
    assert(snap.totalRows === wantRows, "compaction changed row count")
    // data identical
    val after = GraftTable.read(spark, root)
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty,
      "compaction changed table contents")
    // range layout preserved: no overlapping key intervals
    snap.files.sortBy(_.minKey).sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey <= b.minKey,
        s"compaction blended ranges: $a / $b")
      case _ =>
    }
    want.unpersist()
  }

  test("batch marker survives interleaved batch-mode merges") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 2)
    val ids = docs.select("doc_id").orderBy("doc_id")
      .limit(3).collect().map(_.getLong(0))
    def cdc(id: Long, seq: Long, text: String) =
      spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(id, seq, "U", text, null, null)),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, chg_seq BIGINT, op STRING, new_text STRING, " +
            "new_lang STRING, new_source STRING"))
    val sink = GraftTable.upsertSink(root, Seq("chg_seq"))
    sink(cdc(ids(0), 1L, "streamed b5"), 5L)
    assert(GraftTable.latest(root).batch === 5L)
    // an interleaved BATCH merge (batchId −1) must not reset the
    // marker (ADVICE r10 #3) …
    GraftTable.merge(spark, root, docs.limit(1).select(col("doc_id"),
      lit(null).cast("string").as("new_text"), lit(false).as("is_delete"),
      lit(null).cast("string").as("new_lang"),
      lit(null).cast("string").as("new_source")))
    assert(GraftTable.latest(root).batch === 5L,
      "batch-mode merge reset the streaming idempotence marker")
    // … so a checkpoint-replayed micro-batch id ≤ 5 stays a no-op
    val vBefore = GraftTable.currentVersion(root)
    sink(cdc(ids(0), 9L, "replayed — must not apply"), 5L)
    assert(GraftTable.currentVersion(root) === vBefore,
      "replayed micro-batch was double-applied after a batch merge")
  }

  test("streaming time travel: stream from a pin == batch read of the pin, restart-safe") {
    // VERDICT r11 #7: a replayed training run streams FROM a pinned
    // version. Geometry mirrors ReplaySourceSpec: a long trigger
    // interval gives each commit a quiet gap, so the mid-stream stop
    // is deterministic; the restart must deliver the remaining files
    // exactly once (FileStreamSource offset log + idempotent staging).
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 6)
    GraftTable.pin(root, 1)
    val want = GraftTable.read(spark, root, 1).cache()
    val wantRows = want.count()
    // mutate past the pin — the stream must NOT see this
    GraftTable.merge(spark, root, changeBatch)

    val stage = Files.createTempDirectory("graft_tt_stage").toString
    val ckpt = Files.createTempDirectory("graft_tt_ckpt").toString
    val out = Files.createTempDirectory("graft_tt_out").toString
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      GraftTable.readStream(spark, root, 1, stage, filesPerTrigger = 1)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(trigger).start()

    val q1 = start(org.apache.spark.sql.streaming.Trigger
      .ProcessingTime("10 seconds"))
    val deadline = System.currentTimeMillis + 120000
    while (Option(q1.lastProgress).forall(_.batchId < 0) &&
        System.currentTimeMillis < deadline) Thread.sleep(25)
    q1.stop()
    val mid = spark.read.parquet(out).count()
    assert(mid > 0 && mid < wantRows,
      s"stop geometry broke: $mid of $wantRows rows committed")

    val q2 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() === wantRows,
      s"restart lost or duplicated rows: ${got.count()} != $wantRows")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-from-pin != batch read of the pin")

    // hardlink durability: even after the pin is dropped and vacuum
    // reclaims the original paths, the staged bytes stay exact
    GraftTable.unpin(root, 1)
    GraftTable.vacuum(root, 1, minFileAgeMs = 0L)
    val staged = spark.read.parquet(stage)
    assert(staged.exceptAll(want).isEmpty && want.exceptAll(staged).isEmpty,
      "staged snapshot drifted after vacuum of the originals")
    want.unpersist()

    // the contract demands a pin up front
    intercept[IllegalArgumentException] {
      GraftTable.readStream(spark, root,
        GraftTable.currentVersion(root), stage)
    }
  }

  test("stale-lock steal is atomic: racing stealers yield exactly one winner") {
    // ADVICE r12 high: the r11 reclaim (deleteIfExists + createFile)
    // let two stealers interleave — B's delete removed A's freshly
    // created lock, both "won", and the second ATOMIC_MOVE silently
    // replaced the first's committed manifest (a lost update). This
    // race drives N barrier-synchronized committers at a planted
    // expired lock, many rounds, and asserts (a) exactly one writer
    // per round returns, (b) the published manifest is the winner's —
    // never a loser's silent replacement. Committers carry their
    // thread id in the snapshot's batch marker so authorship is
    // checkable on disk. Historical note: steal-by-atomic-rename alone
    // still failed this race (3 winners in round 0 — fresh claimers
    // slip into the steal window; an age probe that finds the lock
    // momentarily absent adopts a LIVE claim); what makes it pass is
    // the first-wins-atomic createLink publish in commit().
    val root = freshRoot()
    val snap1 = GraftTable.create(spark, root, docs, "doc_id", 2)
    val N = 8
    for (round <- 0 until 20) {
      val v = 2 + round
      val lock = Paths.get(root, "manifest", s"v$v.lock")
      Files.createFile(lock)
      Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis - 3600L * 1000))
      val barrier = new java.util.concurrent.CyclicBarrier(N)
      val wins = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val threads = (0 until N).map { tid =>
        new Thread(() => {
          barrier.await()
          try {
            GraftTable.commit(root,
              GraftTable.Snapshot(v, "doc_id", snap1.files, batch = tid.toLong))
            wins.add(tid.toLong)
          } catch { case _: GraftTable.ConcurrentWriteException => () }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.size === 1,
        s"round $round: ${wins.size} writers both won the stolen slot v$v")
      val published = GraftTable.snapshot(root, v)
      assert(published.batch === wins.iterator().next(),
        s"round $round: v$v manifest is not the winner's — a losing " +
          "stealer silently replaced a committed manifest")
    }
  }

  test("vacuum reclaims age-expired crashed-publish staging files") {
    // ADVICE r12: a crash between writeString(.vN.<uuid>.tmp) and the
    // ATOMIC_MOVE strands the staging file — the manifest regex never
    // matches the dotted name, so only this path reclaims it.
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 2)
    val md = Paths.get(root, "manifest")
    val crashed = md.resolve(".v7.deadbeef.tmp")
    val inflight = md.resolve(".v8.cafebabe.tmp")
    Files.writeString(crashed, "{}")
    Files.writeString(inflight, "{}")
    Files.setLastModifiedTime(crashed, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis - 3600L * 1000))
    val (_, manifestSide) = GraftTable.vacuum(root, 1, minFileAgeMs = 60000L)
    assert(manifestSide >= 1, "expired staging file not reclaimed")
    assert(!Files.exists(crashed), "age-expired .tmp survived vacuum")
    assert(Files.exists(inflight),
      "young staging file deleted — could be a LIVE writer's publish")
    assert(GraftTable.currentVersion(root) === 1, "vacuum touched manifests")
  }

  test("optimistic concurrency: a raced commit throws, table intact") {
    val root = freshRoot()
    GraftTable.create(spark, root, docs, "doc_id", 2)
    // simulate a concurrent writer holding the v2 claim (the state a
    // racing merge is in between its claim and its publish)
    Files.createFile(Paths.get(root, "manifest", "v2.lock"))
    intercept[GraftTable.ConcurrentWriteException] {
      GraftTable.merge(spark, root, changeBatch)
    }
    // the loser's failure must not corrupt v1, and readers never see
    // the claimed-but-unpublished v2 (json names appear only via
    // atomic rename)
    assert(GraftTable.currentVersion(root) === 1)
    val v1 = GraftTable.read(spark, GraftTable.snapshot(root, 1))
    assert(v1.exceptAll(docs).isEmpty && docs.exceptAll(v1).isEmpty)
  }
}
