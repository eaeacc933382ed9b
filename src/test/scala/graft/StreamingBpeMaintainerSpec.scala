package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingBpeMaintainer, SubCommitScheme, SubCommitSchemeMismatch}

/** The tokenizer retrain dial (round 17) — the policy family's third
  * member: NSW has deleted-fraction, IVF has chronic-distortion, BPE now
  * has chronic-fertility. */
class StreamingBpeMaintainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // digram-family corpora: 12 merges genuinely compress {ab,cd} words;
  // {xy,zw} words are unseen morphology (char-level fallback fertility)
  private def docsOf(ids: Seq[Long], digrams: Seq[String]) =
    ids.map { id =>
      val words = (1 to 12).map { j =>
        val d = digrams(((id + j) % digrams.length).toInt)
        d * (2 + ((id * 31 + j) % 4).toInt)
      }
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")

  test("chronic fertility drift fires the dial; retrain restores the fit (round 17)") {
    val dir = java.nio.file.Files.createTempDirectory("bpemaint").toString
    val m = new StreamingBpeMaintainer(spark, dir,
      docsOf(0L until 200L, Seq("ab", "cd")),
      acuteFertilityFactor = 3.0, retrainAtFertilityFactor = 1.3)
    assert(m.fertilitySinceTrain() === 1.0, "at train the ratio is exactly 1")
    val (baseline0, _, _) = m.fertInfo()
    // the digram corpus compresses COMPLETELY within the merge budget
    // (fertility 1.0 — the trainer's early-stop on an exhausted vocab);
    // anything near char fallback (~8) would mean training didn't bite
    assert(baseline0 >= 1.0 && baseline0 < 4.0,
      s"training must genuinely compress the digram corpus, got $baseline0")

    // a same-domain batch moves nothing: no retrain, ratio stays ~1
    m.insertBatch(docsOf(1000L until 1050L, Seq("ab", "cd")), 0L)
    assert(m.maybeRetrain(2L).isEmpty && m.retrains === 0)
    assert(math.abs(m.fertilitySinceTrain() - 1.0) < 0.1)

    // drift batches: 20% unseen morphology each — individually under the
    // 3.0 acute bar, chronically walking the corpus ratio up
    var fired = false
    var firedAt = -1
    (1 to 8).foreach { i =>
      if (!fired) {
        val lo = 2000L + i * 100L
        val batch = docsOf(lo until (lo + 10L), Seq("xy", "zw"))
          .unionByName(docsOf((lo + 10L) until (lo + 50L), Seq("ab", "cd")))
        m.insertBatch(batch, 2L * i)
        assert(m.retrains === 0,
          s"sub-acute batches must never trip the acute trigger (step $i)")
        if (m.maybeRetrain(2L * i + 2).nonEmpty) { fired = true; firedAt = i }
      }
    }
    assert(fired, "the chronic dial must fire as the corpus drifts")
    assert(m.retrains === 1)
    assert(m.fertilitySinceTrain() < 1.05,
      s"retrain resets the counters to the new fit, got ${m.fertilitySinceTrain()}")
    // the retrained vocabulary actually LEARNED the drifted morphology:
    // a drift-domain word tokenizes below its char-level fallback
    val drifted = m.currentVocab().filter(col("word").startsWith("xy"))
      .select(col("word"), size(split(col("seq"), " ")).as("n"))
      .collect()
    assert(drifted.nonEmpty, "drift words entered the vocabulary")
    assert(drifted.forall(r => r.getInt(1) < r.getString(0).length + 1),
      s"merges must compress drift words below char fallback: ${drifted.mkString(",")}")

    // replays stay suppressed across the retrain's version axis
    val (b1, w1, t1) = m.fertInfo()
    m.insertBatch(docsOf(2100L until 2150L, Seq("ab", "cd")), 2L * firedAt)
    assert(m.fertInfo() === ((b1, w1, t1)), "replayed batch must no-op")
  }

  test("acute fertility shift retrains immediately (round 17)") {
    val dir = java.nio.file.Files.createTempDirectory("bpemaint-acute").toString
    // collapseStagger rides through every maintainer constructor to the
    // store (round 17) — exercised here as a pass-through wiring check
    val m = new StreamingBpeMaintainer(spark, dir,
      docsOf(0L until 100L, Seq("ab", "cd")),
      acuteFertilityFactor = 1.5, retrainAtFertilityFactor = 10.0,
      collapseStagger = 2)
    // pure unseen morphology: char fallback fertility, far over 1.5×
    m.insertBatch(docsOf(5000L until 5050L, Seq("xy", "zw")), 0L)
    assert(m.retrains === 1, "an out-of-distribution batch is the acute case")
    assert(m.fertilitySinceTrain() < 1.05)
    graft.tools.CacheRegistry.release(blocking = true)
  }

  test("a retrain leaves the cache registry where it found it (round 18, ADVICE r17)") {
    val dir = java.nio.file.Files.createTempDirectory("bpemaint-scope").toString
    graft.tools.CacheRegistry.release(blocking = true)
    val before = graft.tools.CacheRegistry.trackedCount
    // the constructor bootstrap IS a retrain (bpeBuildStepsOn registers
    // ~merges+1 persisted/checkpointed frames); without the scope each
    // one stays pinned in the registry for the process lifetime —
    // unbounded executor-storage growth in a long-running stream
    val m = new StreamingBpeMaintainer(spark, dir,
      docsOf(0L until 100L, Seq("ab", "cd")),
      acuteFertilityFactor = 1.5, retrainAtFertilityFactor = 10.0)
    assert(graft.tools.CacheRegistry.trackedCount === before,
      "bootstrap retrain must release every frame it tracked")
    // an acute retrain (the long-running path) releases its frames too
    m.insertBatch(docsOf(5000L until 5050L, Seq("xy", "zw")), 0L)
    assert(m.retrains === 1)
    assert(graft.tools.CacheRegistry.trackedCount === before,
      "a streamed retrain must release every frame it tracked")
    // and the released plan still serves: the committed vocab reads back
    assert(m.currentVocab().count() > 0)
  }

  test("version-scheme guard: an undrained upgrade gets a named refusal, not a double-apply (round 18)") {
    val dir = java.nio.file.Files.createTempDirectory("bpemaint-scheme").toString
    val m = new StreamingBpeMaintainer(spark, dir,
      docsOf(0L until 100L, Seq("ab", "cd")),
      acuteFertilityFactor = 5.0, retrainAtFertilityFactor = 10.0)
    assert(SubCommitScheme.recorded(spark, dir) ===
      Some(StreamingBpeMaintainer.SubCommitsPerBatch),
      "a fresh store records the scheme it is written under")

    // batch 0 at the stream's derived version (2·id → target 2·id+1):
    // the state after a crash BETWEEN the store commit and the
    // checkpoint commit — the store holds the batch, the checkpoint
    // would replay it
    m.insertBatch(docsOf(1000L until 1050L, Seq("ab", "cd")),
      StreamingBpeMaintainer.SubCommitsPerBatch * 0L)
    val (b0, w0, t0) = m.fertInfo()

    // SAME-scheme replay (the crash-recovery path the guard must keep
    // working): versions re-derive identically, the store no-ops
    m.insertBatch(docsOf(1000L until 1050L, Seq("ab", "cd")), 0L)
    assert(m.fertInfo() === ((b0, w0, t0)),
      "a same-scheme replay is suppressed by the numeric version guard")

    // "UPGRADE": the store was written by a binary deriving 1 sub-commit
    // per batch (simulated by re-stamping the marker the old binary
    // would have left); the undrained checkpoint still holds batch 0.
    // The new binary must REFUSE to attach — under the wider scheme
    // batch 0 would replay at strictly larger versions (2·0+1 > a
    // factor-1 store's 0+1) and re-apply past the numeric guard,
    // double-counting the fertility mass and re-appending the docs
    val marker = java.nio.file.Paths.get(dir, "_subcommit_scheme")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._subcommit_scheme.crc"))
    java.nio.file.Files.write(marker, "1\n".getBytes("UTF-8"))
    val refusal = intercept[SubCommitSchemeMismatch] {
      new StreamingBpeMaintainer(spark, dir,
        docsOf(0L until 100L, Seq("ab", "cd")))
    }
    assert(refusal.getMessage.contains("Drain") &&
      refusal.getMessage.contains("acceptSchemeChange"),
      s"the refusal must name the recovery rule, got: ${refusal.getMessage}")
    // the refusal fired BEFORE any store access: nothing moved
    assert(m.fertInfo() === ((b0, w0, t0)))

    // drain acknowledged: the operator re-attaches explicitly, the
    // marker is re-stamped, and the maintainer works — including the
    // replay guard for post-drain batches
    val m2 = new StreamingBpeMaintainer(spark, dir,
      docsOf(0L until 100L, Seq("ab", "cd")),
      acceptSchemeChange = true)
    assert(SubCommitScheme.recorded(spark, dir) ===
      Some(StreamingBpeMaintainer.SubCommitsPerBatch))
    m2.insertBatch(docsOf(1100L until 1120L, Seq("ab", "cd")), 2L)
    val after = m2.fertInfo()
    assert(after._2 > w0 && after._3 > t0, "the post-drain batch landed")
    m2.insertBatch(docsOf(1100L until 1120L, Seq("ab", "cd")), 2L)
    assert(m2.fertInfo() === after, "post-drain replays stay suppressed")
    graft.tools.CacheRegistry.release(blocking = true)
  }

  test("a corrupt scheme marker is the named refusal, not a bare parse error (round 18, ADVICE r17)") {
    val dir = java.nio.file.Files.createTempDirectory("bpemaint-corrupt").toString
    new StreamingBpeMaintainer(spark, dir, docsOf(0L until 50L, Seq("ab", "cd")))
    val marker = java.nio.file.Paths.get(dir, "_subcommit_scheme")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._subcommit_scheme.crc"))
    // a truncated/partial write of the non-atomic stamp
    java.nio.file.Files.write(marker, "".getBytes("UTF-8"))
    val refusal = intercept[SubCommitSchemeMismatch] {
      new StreamingBpeMaintainer(spark, dir, docsOf(0L until 50L, Seq("ab", "cd")))
    }
    assert(refusal.getMessage.contains("_subcommit_scheme") &&
      refusal.getMessage.contains("unreadable"),
      s"must name the marker and the failure, got: ${refusal.getMessage}")
    // an unreadable marker must not silently pass as "no marker" — but
    // the drain acknowledgement recovers it, re-stamping this binary's
    // scheme (a drained stream has no crashed batch left to replay)
    new StreamingBpeMaintainer(spark, dir,
      docsOf(0L until 50L, Seq("ab", "cd")), acceptSchemeChange = true)
    assert(SubCommitScheme.recorded(spark, dir) ===
      Some(StreamingBpeMaintainer.SubCommitsPerBatch),
      "the acknowledged re-attach re-stamps the marker")
    graft.tools.CacheRegistry.release(blocking = true)
  }
}
