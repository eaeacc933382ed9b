package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.model.Schemas
import graft.streaming.{StreamingNswIndex, StreamingUpsert}

/** Crash-recovery proof for the stateful streaming writers (round-9
  * verdict #3): VersionedState's replay guard was batch-level tested, but
  * nothing killed a streaming query and resumed it from its checkpoint.
  *
  * The crash window that matters is BETWEEN the two commits: foreachBatch
  * has committed version batchId+1 to VersionedState, but the engine dies
  * before writing `checkpoint/commits/<batchId>` — on restart Structured
  * Streaming re-executes that batch from its offsets entry, and the
  * writer's `latest >= target` guard must turn the replay into a no-op
  * instead of double-applying (or corrupting the very dirs the merge
  * reads). The specs simulate exactly that window deterministically:
  * run to completion, DELETE the newest commit-log entry, drop more data,
  * restart from the same checkpoint, and require the final state to equal
  * an uninterrupted reference run — versions included, so a double-commit
  * cannot hide behind an idempotent merge policy.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gameRows(rows: Seq[(Long, Long, String)]) =
    rows.map { case (id, rp, n) =>
      (id, rp, n, Option.empty[String], Option.empty[String], Option.empty[Long])
    }.toDF("universeId", "rootPlaceId", "name", "description",
      "gameplayDescription", "playerCount")

  /** Start a query and drain it. A restart on a just-terminated query's
    * checkpoint can race Spark's ASYNC active-checkpoint cleanup (the
    * registry entry is removed when the listener bus delivers the
    * termination event, which awaitTermination does not wait for) — that
    * transient "concurrently using" failure is retried; anything else
    * propagates. */
  private def runToCompletion(mk: () => org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long): Unit = {
    var attempts = 0
    while (attempts >= 0) {
      try {
        assert(mk().awaitTermination(timeoutMs), "stream did not drain in time")
        return
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("concurrently using") && attempts < 40 =>
          attempts += 1
          Thread.sleep(250L)
      }
    }
  }

  private def crashWindow(ckptDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val commits = Paths.get(ckptDir, "commits")
    val entries = Files.list(commits).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.forall(_.isDigit))
    assert(entries.nonEmpty, s"no commit entries under $commits")
    val latest = entries.maxBy(_.getFileName.toString.toLong)
    assert(Files.deleteIfExists(latest), s"could not delete $latest")
  }

  test("StreamingUpsert resumes exactly-once from its checkpoint after a crash") {
    val initial = gameRows(Seq((1L, 10L, "one"), (2L, 20L, "two")))
    val dropA = gameRows(Seq((2L, 21L, "two v2")))
    val dropB = gameRows(Seq((4L, 40L, "four"), (5L, 50L, "five")))
    val dropC = gameRows(Seq((6L, 60L, "six")))

    def stream(dropDir: String) = spark.readStream.schema(Schemas.game)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")

    // reference: one uninterrupted run over all three drops
    val refDrop = Files.createTempDirectory("rec-ref-drops").toString
    val refSnap = Files.createTempDirectory("rec-ref-snap").toString
    val refCkpt = Files.createTempDirectory("rec-ref-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$refDrop/a")
    dropB.coalesce(1).write.parquet(s"$refDrop/b")
    dropC.coalesce(1).write.parquet(s"$refDrop/c")
    val ref = new StreamingUpsert(spark, refSnap, initial)
    runToCompletion(() => ref.start(stream(refDrop), refCkpt), 120000L)
    val want = ref.currentSnapshot().orderBy("universeId").collect()

    // crashed run: two drops, complete, then the crash window — newest
    // commit-log entry gone while VersionedState already holds v2
    val drop = Files.createTempDirectory("rec-drops").toString
    val snap = Files.createTempDirectory("rec-snap").toString
    val ckpt = Files.createTempDirectory("rec-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$drop/a")
    dropB.coalesce(1).write.parquet(s"$drop/b")
    val u1 = new StreamingUpsert(spark, snap, initial)
    runToCompletion(() => u1.start(stream(drop), ckpt), 120000L)
    crashWindow(ckpt)
    dropC.coalesce(1).write.parquet(s"$drop/c")

    // restart from the same checkpoint: the engine re-executes the batch
    // whose commit entry vanished, then processes drop C
    val u2 = new StreamingUpsert(spark, snap, initial)
    runToCompletion(() => u2.start(stream(drop), ckpt), 120000L)

    assert(u2.currentSnapshot().orderBy("universeId").collect() === want,
      "recovered snapshot diverges from the uninterrupted run")
    // versions prove the replay was a no-op: 3 data batches → v3 exactly;
    // a double-apply would have minted an extra version
    val versions = new java.io.File(snap).list().toSeq
      .filter(_.startsWith("snapshot-v")).sorted
    assert(versions === Seq("snapshot-v1", "snapshot-v2", "snapshot-v3"))
  }

  test("StreamingNswIndex resumes exactly-once from its checkpoint after a crash") {
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 400)
    val initial = e.filter(col("vec_id") < 300)
    val dropA = e.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    val dropB = e.filter(col("vec_id") >= 350)

    def stream(dropDir: String) = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    def edgeSet(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    // reference: both drops, uninterrupted
    val refDrop = Files.createTempDirectory("rec-nsw-ref-drops").toString
    val refIdx = Files.createTempDirectory("rec-nsw-ref-idx").toString
    val refCkpt = Files.createTempDirectory("rec-nsw-ref-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$refDrop/a")
    dropB.coalesce(1).write.parquet(s"$refDrop/b")
    val ref = new StreamingNswIndex(spark, refIdx, initial)
    runToCompletion(() => ref.start(stream(refDrop), refCkpt), 240000L)
    val wantKnn = edgeSet(ref.currentKnn())

    // crashed run: drop A, complete, crash window, then drop B arrives
    val drop = Files.createTempDirectory("rec-nsw-drops").toString
    val idx = Files.createTempDirectory("rec-nsw-idx").toString
    val ckpt = Files.createTempDirectory("rec-nsw-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$drop/a")
    val i1 = new StreamingNswIndex(spark, idx, initial)
    runToCompletion(() => i1.start(stream(drop), ckpt), 240000L)
    crashWindow(ckpt)
    dropB.coalesce(1).write.parquet(s"$drop/b")

    val i2 = new StreamingNswIndex(spark, idx, initial)
    runToCompletion(() => i2.start(stream(drop), ckpt), 240000L)

    // the graph growth is deterministic, so exactly-once resume means the
    // recovered k-NN state is EDGE-IDENTICAL to the uninterrupted run's —
    // a replayed insertion would have duplicated (or re-derived) edges
    assert(i2.currentVectors().count() === e.count())
    assert(edgeSet(i2.currentKnn()) === wantKnn,
      "recovered k-NN state diverges from the uninterrupted run")
  }

  test("StreamingWindowedQuantiles emits each window exactly once across a crash") {
    import graft.streaming.StreamingWindowedQuantiles
    val ev = graft.io.Tables.events(spark, SparkTestSession.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val mid = ev.agg(org.apache.spark.sql.functions.expr(
      "percentile(unix_timestamp(ts), 0.5)")).head().getDouble(0)
    val dropA = ev.filter(org.apache.spark.sql.functions.unix_timestamp(col("ts")) <= mid)
    val dropB = ev.filter(org.apache.spark.sql.functions.unix_timestamp(col("ts")) > mid)
    // far-future sentinel closes every real window after the restart
    val dropC = ev.orderBy(col("ts").desc).limit(1)
      .withColumn("ts", org.apache.spark.sql.functions.expr("ts + INTERVAL 30 DAYS"))
      .withColumn("event_id", org.apache.spark.sql.functions.lit(999999999L))

    def stream(dropDir: String) = spark.readStream
      .schema(graft.streaming.EventsStream.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    def rows(path: String) = spark.read.parquet(path)
      .collect().map(r => (SparkTestSession.tsAt(r, 0), r.getString(1),
        r.getSeq[Double](2))).sortBy(t => (t._1, t._2)).toSeq

    // reference: all three drops, uninterrupted
    val refDrop = Files.createTempDirectory("rec-wq-ref-drops").toString
    val refOut = Files.createTempDirectory("rec-wq-ref-out").toString
    val refCkpt = Files.createTempDirectory("rec-wq-ref-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$refDrop/a")
    dropB.coalesce(1).write.parquet(s"$refDrop/b")
    dropC.coalesce(1).write.parquet(s"$refDrop/c")
    runToCompletion(() => StreamingWindowedQuantiles.startAppendParquet(
      StreamingWindowedQuantiles.samplesAppend(stream(refDrop)), refOut, refCkpt),
      120000L)
    val want = rows(refOut)
    assert(want.nonEmpty)

    // crashed run: drops A+B, complete, commit-log crash window, then C
    val drop = Files.createTempDirectory("rec-wq-drops").toString
    val out = Files.createTempDirectory("rec-wq-out").toString
    val ckpt = Files.createTempDirectory("rec-wq-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$drop/a")
    dropB.coalesce(1).write.parquet(s"$drop/b")
    runToCompletion(() => StreamingWindowedQuantiles.startAppendParquet(
      StreamingWindowedQuantiles.samplesAppend(stream(drop)), out, ckpt), 120000L)
    crashWindow(ckpt)
    dropC.coalesce(1).write.parquet(s"$drop/c")

    // restart: the engine re-executes the batch whose commit entry
    // vanished; the parquet sink's _spark_metadata log must keep its
    // output exactly-once (no window row appears twice)
    runToCompletion(() => StreamingWindowedQuantiles.startAppendParquet(
      StreamingWindowedQuantiles.samplesAppend(stream(drop)), out, ckpt), 120000L)
    assert(rows(out) === want,
      "recovered append output diverges from the uninterrupted run")
  }

  test("StreamingIvfIndex survives a crash in the retrain commit window") {
    import graft.streaming.StreamingIvfIndex
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val initial = e.filter(col("vec_id") < 300)
    val dropA = e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    // drop B trips the drift trigger → its batch is the corpus-sized
    // RETRAIN, the one index mutation that had no kill/resume proof
    // (round-10 verdict #4)
    val dropB = e.filter(col("vec_id") >= 400)
      .select((col("vec_id") + 100000L).as("vec_id"),
        org.apache.spark.sql.functions.expr("transform(v, x -> x + 5.0D)").as("v"))
    val dropC = e.filter(col("vec_id") >= 400 && col("vec_id") < 450)

    def stream(dropDir: String) = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    def centroidMap(i: StreamingIvfIndex) =
      i.currentCentroids().toMap.map { case (c, v) => (c, v.toSeq) }
    def assignedSet(i: StreamingIvfIndex) =
      i.currentAssigned().select("vec_id", "cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

    // reference: A (assign), B (retrain), C (assign on retrained centroids),
    // uninterrupted
    val refDrop = Files.createTempDirectory("rec-ivf-ref-drops").toString
    val refIdx = Files.createTempDirectory("rec-ivf-ref-idx").toString
    val refCkpt = Files.createTempDirectory("rec-ivf-ref-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$refDrop/a")
    dropB.coalesce(1).write.parquet(s"$refDrop/b")
    val ref = new StreamingIvfIndex(spark, refIdx, initial)
    runToCompletion(() => ref.start(stream(refDrop), refCkpt), 240000L)
    assert(ref.retrains === 1, "drop B must trip the drift trigger")
    dropC.coalesce(1).write.parquet(s"$refDrop/c")
    runToCompletion(() => ref.start(stream(refDrop), refCkpt), 240000L)
    // whatever batch C does in the reference (expected: plain assignment on
    // the retrained centroids) is what the resumed run may do — and no more
    val refRetrainsFromC = ref.retrains - 1
    val wantCentroids = centroidMap(ref)
    val wantAssigned = assignedSet(ref)

    // crashed run: die exactly in the retrain's commit window — the
    // VersionedState version holding the retrained quantizer is committed,
    // the streaming commit-log entry for that batch is not
    val drop = Files.createTempDirectory("rec-ivf-drops").toString
    val idx = Files.createTempDirectory("rec-ivf-idx").toString
    val ckpt = Files.createTempDirectory("rec-ivf-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$drop/a")
    dropB.coalesce(1).write.parquet(s"$drop/b")
    val i1 = new StreamingIvfIndex(spark, idx, initial)
    runToCompletion(() => i1.start(stream(drop), ckpt), 240000L)
    assert(i1.retrains === 1)
    crashWindow(ckpt)
    dropC.coalesce(1).write.parquet(s"$drop/c")

    // restart: resume must reload the RETRAINED quantizer + baseline from
    // the pointer, replay batch B as a no-op (no second corpus-sized
    // retrain), then process C on the retrained centroids
    val i2 = new StreamingIvfIndex(spark, idx, initial)
    runToCompletion(() => i2.start(stream(drop), ckpt), 240000L)
    assert(i2.retrains === refRetrainsFromC,
      "the replayed retrain batch must be a no-op on resume (only batch C's own work may run)")
    assert(centroidMap(i2) === wantCentroids,
      "recovered centroids diverge from the uninterrupted run")
    assert(assignedSet(i2) === wantAssigned,
      "recovered assignment diverges from the uninterrupted run")
  }

  test("StreamingPostingsIndex resumes exactly-once after a crash in the commit window") {
    import graft.operators.Merge
    import graft.streaming.{StreamingChangeFeed, StreamingPostingsIndex}
    // the CDC-fed maintainer's exactly-once lives in its own manifest
    // commits (postings version = feed version), not the stream checkpoint
    // — so the crash windows that matter are around the manifest rename:
    // BEFORE it (state gens written, nothing committed — the retry must
    // clear and redo them) and AFTER it (committed, crash pre-ack — the
    // replay must be a pure no-op, not a double-applied delete).
    val initial = gameRows(Seq((1L, 10L, "one alpha"), (2L, 20L, "two beta")))
    val tableDir = Files.createTempDirectory("rec-pidx-table").toString + "/games"
    val feedDir = Files.createTempDirectory("rec-pidx-feed").toString
    def stateDir() = Files.createTempDirectory("rec-pidx-state").toString

    val cf = new StreamingChangeFeed(spark, tableDir, feedDir, initial,
      "universeId",
      overwriteCols = Seq("rootPlaceId", "name"), coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"),
      buckets = 4, retainVersions = 8, feedPreimages = true)

    // maintainers bootstrap at the table version they FIRST observe — pin
    // all three state dirs to v0 before any change batch lands
    val refState = stateDir(); val preState = stateDir(); val postState = stateDir()
    val ref = new StreamingPostingsIndex(spark, tableDir, feedDir, refState,
      buckets = 8, keepVersions = 8)
    val boom = new RuntimeException("injected commit-window crash")
    val crashPre = new StreamingPostingsIndex(spark, tableDir, feedDir, preState,
      buckets = 8, keepVersions = 8,
      hooks = Merge.IncHooks(beforeCommit = v => if (v == 2) throw boom))
    val crashPost = new StreamingPostingsIndex(spark, tableDir, feedDir, postState,
      buckets = 8, keepVersions = 8,
      hooks = Merge.IncHooks(afterCommit = v => if (v == 2) throw boom))

    cf.applyBatch(gameRows(Seq((2L, 21L, "two gamma"))), 0L) // v1: beta -> gamma
    cf.applyBatch(gameRows(Seq((4L, 40L, "four delta"))), 1L) // v2: insert
    cf.applyBatch(gameRows(Seq((5L, 50L, "five epsilon"))), 2L) // v3: insert

    def postingsSet(i: StreamingPostingsIndex): Set[(Long, String)] =
      i.currentPostings().select("universeId", "word").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

    // reference: all three versions, uninterrupted
    ref.catchUp()
    val wantPostings = postingsSet(ref)
    assert(ref.currentVersion === 3L)

    // crash BEFORE the v2 manifest rename: v2's gens are on disk but
    // uncommitted — the state still reads as v1
    assert(intercept[RuntimeException](crashPre.catchUp()) eq boom)
    assert(crashPre.currentVersion === 1L)
    val resumedPre = new StreamingPostingsIndex(spark, tableDir, feedDir, preState,
      buckets = 8, keepVersions = 8)
    resumedPre.catchUp()
    assert(postingsSet(resumedPre) === wantPostings,
      "pre-commit-crash recovery diverges from the uninterrupted run")
    assert(resumedPre.currentVersion === 3L)

    // crash AFTER the v2 manifest rename: v2 IS committed — the resumed
    // catch-up must skip it (a double-applied delete-insert would re-run
    // the anti-join against already-updated state) and apply only v3
    assert(intercept[RuntimeException](crashPost.catchUp()) eq boom)
    assert(crashPost.currentVersion === 2L)
    assert(crashPost.applyFeedVersion(2) === None,
      "replay of the committed version must be a no-op")
    val resumedPost = new StreamingPostingsIndex(spark, tableDir, feedDir, postState,
      buckets = 8, keepVersions = 8)
    resumedPost.catchUp()
    assert(postingsSet(resumedPost) === wantPostings,
      "post-commit-crash recovery diverges from the uninterrupted run")
    assert(resumedPost.currentVersion === 3L)
    assert(resumedPost.searchCurrent("gamma", 10).collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(resumedPost.searchCurrent("beta", 10).isEmpty)
  }

  test("StreamingIncrementalDedup resumes exactly-once from its checkpoint after a crash") {
    import graft.streaming.StreamingIncrementalDedup
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val base1 = "alpha beta gamma delta epsilon zeta eta theta"
    val fresh = "completely fresh crawl content with many unseen tokens"
    val initial = docs(Seq(
      1L -> base1, 2L -> "one two three four five six seven eight"))
    // A: a rejected re-crawl + an admitted doc; B: another admitted doc;
    // C (post-crash): a near-dup of A's ADMITTED doc — its verdict depends
    // on doc 102 being in the state exactly once
    val dropA = docs(Seq(101L -> base1, 102L -> fresh))
    val dropB = docs(Seq(201L -> "unrelated ninth tenth eleventh twelfth words here now"))
    val dropC = docs(Seq(301L -> (fresh + " plus tail")))

    def stream(dropDir: String) = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    def stateOf(i: StreamingIncrementalDedup) = (
      i.currentShingles().select("doc_id").as[Long].collect().sorted.toSeq,
      i.currentBands().select("doc_id", "band", "sig").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet,
      i.currentVerdicts().collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
          r.getString(3), r.getLong(4))).sorted.toSeq)

    // reference: all three drops, uninterrupted
    val refDrop = Files.createTempDirectory("rec-sinc-ref-drops").toString
    val refIdx = Files.createTempDirectory("rec-sinc-ref-idx").toString
    val refCkpt = Files.createTempDirectory("rec-sinc-ref-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$refDrop/a")
    dropB.coalesce(1).write.parquet(s"$refDrop/b")
    dropC.coalesce(1).write.parquet(s"$refDrop/c")
    val ref = new StreamingIncrementalDedup(spark, refIdx, initial)
    runToCompletion(() => ref.start(stream(refDrop), refCkpt), 120000L)
    val want = stateOf(ref)

    // crashed run: A+B, complete, commit-log crash window, then C. The
    // replay danger: a double-applied admission would re-judge batch A
    // against a state that already CONTAINS doc 102 — it would read as
    // dup_of_base of itself and the verdict log would double-append.
    val drop = Files.createTempDirectory("rec-sinc-drops").toString
    val idx = Files.createTempDirectory("rec-sinc-idx").toString
    val ckpt = Files.createTempDirectory("rec-sinc-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$drop/a")
    dropB.coalesce(1).write.parquet(s"$drop/b")
    val d1 = new StreamingIncrementalDedup(spark, idx, initial)
    runToCompletion(() => d1.start(stream(drop), ckpt), 120000L)
    crashWindow(ckpt)
    dropC.coalesce(1).write.parquet(s"$drop/c")

    val d2 = new StreamingIncrementalDedup(spark, idx, initial)
    runToCompletion(() => d2.start(stream(drop), ckpt), 120000L)

    assert(stateOf(d2) === want,
      "recovered admission state diverges from the uninterrupted run")
    // the post-crash near-dup resolved against the admitted doc, once
    val v301 = d2.currentVerdicts().filter(col("delta_id") === 301L).collect()
    assert(v301.length === 1)
    assert(v301.head.getLong(1) === 102L && v301.head.getString(3) === "dup_of_base")
    // 3 data batches → v3 exactly; a double-apply would have minted v4
    assert(d2.bandsVersions().max === 3L)
  }

  test("StreamingChangeFeed recovers with a zero-row re-feed for the replayed batch") {
    import graft.streaming.StreamingChangeFeed
    import graft.operators.Merge
    val cols = Seq("universeId", "rootPlaceId", "name", "description",
      "gameplayDescription", "playerCount")
    val initial = gameRows(Seq((1L, 10L, "one"), (2L, 20L, "two")))
    val dropA = gameRows(Seq((2L, 21L, "two v2")))
    val dropB = gameRows(Seq((4L, 40L, "four"), (5L, 50L, "five")))
    val dropC = gameRows(Seq((6L, 60L, "six")))
    def stream(dropDir: String) = spark.readStream.schema(Schemas.game)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    def mkFeed(tableDir: String, feedDir: String) =
      new StreamingChangeFeed(spark, s"$tableDir/games", feedDir, initial,
        "universeId", overwriteCols = Seq("rootPlaceId", "name"),
        coalesceCols = Seq.empty,
        keepCols = Seq("description", "gameplayDescription", "playerCount"),
        buckets = 8, retainVersions = 6)
    def feedRows(cf: StreamingChangeFeed) = cf.feed()
      .drop("version").orderBy("universeId").collect()

    // reference: three drops, uninterrupted
    val refDrop = Files.createTempDirectory("rec-cdc-ref-drops").toString
    val refTable = Files.createTempDirectory("rec-cdc-ref-table").toString
    val refFeed = Files.createTempDirectory("rec-cdc-ref-feed").toString
    val refCkpt = Files.createTempDirectory("rec-cdc-ref-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$refDrop/a")
    dropB.coalesce(1).write.parquet(s"$refDrop/b")
    dropC.coalesce(1).write.parquet(s"$refDrop/c")
    val ref = mkFeed(refTable, refFeed)
    runToCompletion(() => ref.start(stream(refDrop), refCkpt), 120000L)
    val wantTable = ref.currentTable().selectExpr(cols: _*)
      .orderBy("universeId").collect()
    val wantFeed = feedRows(ref)

    // crashed run: A+B, commit-log crash window, then C. The replayed
    // batch CANNOT be skipped (the manifest has no batch bookkeeping by
    // design) — it mints an extra version whose content is identical and
    // whose feed is therefore EMPTY; the consumer-visible stream of
    // change rows is exactly-once anyway.
    val drop = Files.createTempDirectory("rec-cdc-drops").toString
    val table = Files.createTempDirectory("rec-cdc-table").toString
    val feedD = Files.createTempDirectory("rec-cdc-feed").toString
    val ckpt = Files.createTempDirectory("rec-cdc-ckpt").toString
    dropA.coalesce(1).write.parquet(s"$drop/a")
    dropB.coalesce(1).write.parquet(s"$drop/b")
    val c1 = mkFeed(table, feedD)
    runToCompletion(() => c1.start(stream(drop), ckpt), 120000L)
    crashWindow(ckpt)
    dropC.coalesce(1).write.parquet(s"$drop/c")

    val c2 = mkFeed(table, feedD)
    runToCompletion(() => c2.start(stream(drop), ckpt), 120000L)

    assert(c2.currentTable().selectExpr(cols: _*).orderBy("universeId").collect()
      === wantTable, "recovered table diverges from the uninterrupted run")
    assert(feedRows(c2) === wantFeed,
      "recovered change rows diverge from the uninterrupted run")
    // 3 data batches + 1 replay → v4, drained to the pointer, and the
    // replay's version is the exactly-one EMPTY feed entry
    val versions = Merge.tableVersions(spark, s"$table/games")
    assert(versions.max === 4 && c2.emittedVersion === 4)
    val emptyVersions = (1 to 4).filter(v =>
      c2.feed().filter(col("version") === v).isEmpty)
    assert(emptyVersions.length === 1,
      s"exactly the replayed version must feed zero rows, got $emptyVersions")
  }
}
