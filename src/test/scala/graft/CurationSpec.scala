package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  test("split is ~90/5/5 and covers every document exactly once") {
    val out = Curation.split9055(spark, dir).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("test", "train", "val"))
    val byName = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byName.values.sum
    assert(total === 500L)
    // hash-bucket split: binomial spread around 90/5/5
    assert(byName("train") > 400L && byName("train") < 480L)
    assert(byName("val") > 5L && byName("test") > 5L)
  }

  test("split assignment is append-stable: a prefix corpus assigns identically") {
    // the anti-contamination property rand(seed) does not have: recompute
    // the per-doc split over HALF the corpus and over the whole corpus —
    // shared doc_ids must land in the same split
    val bucket = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":split42"))), 1, 8), 16, 10).cast("long") % 100
    val docs = graft.io.Tables.documents(spark, dir).select(col("doc_id"))
    val full = docs.withColumn("b", bucket)
    val half = docs.filter(col("doc_id") % 2 === 0).repartition(7).withColumn("b", bucket)
    val joined = full.as("f").join(half.as("h"), "doc_id")
      .filter(col("f.b") =!= col("h.b"))
    assert(joined.count() === 0L)
  }

  test("shuffle shards: all shards populated, deterministic across runs") {
    val a = Curation.shuffleShards(spark, dir).collect()
    val b = Curation.shuffleShards(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getLong(0)).distinct.length === 8)
    assert(a.length === 40)
  }

  test("shard manifest: totals reconcile with the corpus, fingerprint catches a flipped doc") {
    val docs = graft.io.Tables.documents(spark, dir)
    val m = Curation.shardManifest(spark, dir).collect()
    assert(m.length === 8)
    assert(m.map(_.getLong(1)).sum === docs.count())
    assert(m.map(_.getLong(2)).sum ===
      docs.select(sum(size(split(lower(col("text")), "\\s+"))))
        .head().getLong(0))
    // one flipped document changes EXACTLY its own shard's content_xor,
    // with counts unchanged — the validation a loader runs per shard
    val flipped = Curation.shardManifestOf(
      docs.withColumn("text",
        when(col("doc_id") === 7L, concat(col("text"), lit(" corrupted")))
          .otherwise(col("text"))))
      .collect()
    val changed = m.zip(flipped).filter { case (a, b) =>
      a.getLong(5) != b.getLong(5) }
    assert(changed.length === 1)
    // n_docs identical everywhere; n_tokens differs only on that shard
    assert(m.map(_.getLong(1)).toSeq === flipped.map(_.getLong(1)).toSeq)
  }

  test("pack: distributed prefix sum equals the flat single-window packing") {
    // the scale claim — bucketed cumsum + offsets ≡ one global window
    val d = graft.io.Tables.documents(spark, dir)
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":shuf42"))), 1, 8), 16, 10).cast("long")
    val flat = d.select(col("doc_id"), h.as("h"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok"))
      .withColumn("start", sum(col("n_tok")).over(
        Window.orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok"))
      .groupBy(floor(col("start") / 2000L).as("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("chunk_id")).collect()
    val bucketed = Curation.packChunks(spark, dir).collect()
    assert(bucketed.toSeq === flat.toSeq)
  }

  test("pack: chunks are contiguous, budget-sized, and conserve tokens") {
    val out = Curation.packChunks(spark, dir).collect()
    val ids = out.map(_.getLong(0))
    assert(ids.toSeq === (0L until ids.length).toSeq)
    val total = out.map(_.getLong(2)).sum
    val corpus = graft.io.Tables.documents(spark, dir)
      .select(sum(size(split(lower(col("text")), "\\s+")).cast("long")))
      .head().getLong(0)
    assert(total === corpus)
    // a doc belongs to the chunk its FIRST token falls in, so a chunk's sum
    // deviates from the 2000 budget by less than one max-doc length
    val maxDoc = graft.io.Tables.documents(spark, dir)
      .select(max(size(split(lower(col("text")), "\\s+")).cast("long")))
      .head().getLong(0)
    out.dropRight(1).foreach { r =>
      assert(math.abs(r.getLong(2) - 2000L) < maxDoc,
        s"chunk ${r.getLong(0)} sum ${r.getLong(2)} strays >$maxDoc from budget")
    }
  }

  test("stratified sample: per-language quota respected, deterministic") {
    val out = Curation.stratifiedSample(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) <= 30L), "quota is 30 per stratum")
    assert(out.forall(_.getLong(1) >= 1L))
    val again = Curation.stratifiedSample(spark, dir).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("decontaminate: planted duplicates straddling the split are caught") {
    // the dedup fixture plants exact re-crawl copies; with a 90/5/5 hash
    // split some pairs must straddle test/train — each is a leak
    val out = Curation.decontaminate(spark, dir).collect()
    assert(out.nonEmpty, "planted cross-split duplicates must be flagged")
    // every flagged doc really is in the test bucket (driver-side replay
    // of the same md5 bucket assignment)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:split42".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    assert(out.forall(r => bucket(r.getLong(0)) >= 95))
    assert(out.forall(r => r.getLong(1) >= 1L && r.getLong(2) >= 1L))
    // an exact-copy pair straddling the split shares essentially the whole
    // document: the strongest flagged doc must carry many shared grams
    assert(out.map(_.getLong(1)).max >= 20L,
      "expected at least one near-fully-leaked document")
  }

  test("domain mix: quotas hit the target, sampling respects them, deterministic") {
    val a = Curation.domainMix(spark, dir).collect()
    val b = Curation.domainMix(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getString(0)).toSeq === a.map(_.getString(0)).toSeq.sorted)
    // nearest-rounding per source: total within ±|sources|/2 of the target
    val quotaSum = a.map(_.getLong(2)).sum
    assert(math.abs(quotaSum - 200L) <= a.length / 2 + 1,
      s"quota sum $quotaSum drifted from target 200")
    // sampler can never exceed its quota or its stratum
    a.foreach { r =>
      assert(r.getLong(3) === math.min(r.getLong(2), r.getLong(1)),
        s"source ${r.getString(0)}: n_sampled != min(quota, n_docs)")
    }
    // temperature α=0.5 flattens: smallest source is oversampled relative
    // to its share, largest undersampled
    val smallest = a.minBy(_.getLong(1))
    val largest = a.maxBy(_.getLong(1))
    val total = a.map(_.getLong(1)).sum.toDouble
    assert(smallest.getLong(2) / 200.0 >= smallest.getLong(1) / total)
    assert(largest.getLong(2) / 200.0 <= largest.getLong(1) / total)
  }

  test("bm25: ranked descending, scores positive, term counts in range") {
    val out = Curation.bm25TopK(spark, dir).collect()
    assert(out.length === 15)
    val scores = out.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    assert(scores.forall(_ > 0.0))
    assert(out.map(_.getLong(2)).forall(n => n >= 1L && n <= 3L))
    // multi-term matches should outrank single-term at the top on this corpus
    assert(out.head.getLong(2) >= 2L)
  }

  test("span corruption matches a naive recompute and hits the target rate") {
    val out = Curation.spanCorrupt(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def md5_32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d, 16)
    }
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").toSeq))
    assert(out.size === docs.length)
    var totMasked = 0L; var totTokens = 0L
    docs.foreach { case (id, toks) =>
      val n = toks.size
      def start(p: Int) = p >= 1 && md5_32(s"$id:$p") % 20 == 0
      def masked(p: Int) = start(p) || start(p - 1) || start(p - 2)
      def sb(p: Int) = masked(p) && !(p > 1 && masked(p - 1))
      val input = (1 to n).flatMap { p =>
        if (!masked(p)) Seq(toks(p - 1))
        else if (sb(p)) Seq("<m>") else Nil
      }
      val target = (1 to n).flatMap { p =>
        if (masked(p)) (if (sb(p)) Seq("<m>", toks(p - 1)) else Seq(toks(p - 1)))
        else Nil
      }
      val nMasked = (1 to n).count(masked)
      val nSpans = (1 to n).count(sb)
      val r = out(id)
      assert(r.getLong(1) === n.toLong, s"n_tokens doc $id")
      assert(r.getLong(2) === nSpans.toLong, s"n_spans doc $id")
      assert(r.getLong(3) === nMasked.toLong, s"n_masked doc $id")
      assert(r.getDouble(4) ===
        math.floor(nMasked.toDouble / n * 10000 + 0.5) / 10000.0, s"mask_frac doc $id")
      assert(r.getLong(5) === md5_32(input.mkString(" ")), s"input_fp doc $id")
      assert(r.getLong(6) === md5_32(target.mkString(" ")), s"target_fp doc $id")
      totMasked += nMasked; totTokens += n
    }
    // ~5% starts x 3-token spans => corpus-level corruption near 14%
    // (spans overlap/truncate at boundaries, so slightly under 15%)
    val rate = totMasked.toDouble / totTokens
    assert(rate > 0.10 && rate < 0.20, s"corruption rate $rate")
    // reconstruction conservation: masked + kept = n, sentinels = spans
    out.values.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getLong(2) <= r.getLong(3))
    }
  }

  test("hard negatives match a naive BM25 recompute and exclude the positive") {
    val out = Curation.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").toSeq))
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / nDocs
    val queries = docs.filter(_._1 % 97 == 0)
      .map { case (id, toks) => id -> toks.take(5).distinct }
    assert(queries.nonEmpty)
    val qTerms = queries.flatMap(_._2).toSet
    // tf / df over the pruned vocabulary only
    val tf = docs.map { case (id, toks) =>
      id -> toks.filter(qTerms).groupBy(identity).map { case (t, xs) => t -> xs.size }
    }.toMap
    val dfm = qTerms.map(t => t -> docs.count(d => tf(d._1).contains(t)).toDouble).toMap
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    def w6(id: Long, dl: Double, t: String): Option[Double] =
      tf(id).get(t).map { f =>
        val idf = math.log((nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
        r6(idf * (f * 2.2) / (f + (dl / avgdl * 0.75 + 0.25) * 1.2))
      }
    val expected = queries.flatMap { case (qid, terms) =>
      val scored = docs.filter(_._1 != qid).flatMap { case (id, toks) =>
        val ws = terms.flatMap(t => w6(id, toks.size.toDouble, t))
        if (ws.isEmpty) None
        else Some(id -> ws.map(BigDecimal.valueOf(_)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(5).zipWithIndex.map {
        case ((id, s), i) =>
          (qid, (i + 1).toLong, id,
            math.floor(s.toDouble * 10000 + 0.5) / 10000.0)
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq === expected.toSeq)
    // no query ranks itself as its own negative
    assert(out.forall { case (qid, _, nid, _) => qid != nid })
    assert(out.forall(_._4 > 0.0))
  }

  test("dsir selection matches a naive recomputation and pulls the target language") {
    val out = Curation.dsirSelect(spark, dir).collect()
    assert(out.length === 20)

    // full naive recompute: hashed bigram presence features → bucket counts
    // → smoothed log-ratio weights (6dp) → exact decimal sums → 4dp means
    def md5_32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d, 16)
    }
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // distinct GRAMS then bucket (two distinct grams sharing a bucket count
    // twice — presence features per gram, exactly what the plan explodes)
    val feats2 = docs.map { case (id, lang, text) =>
      val toks = text.toLowerCase.split("\\s+").toSeq
      val grams = toks.sliding(2).filter(_.size == 2)
        .map(g => md5_32(g.mkString(" "))).toSeq.distinct
      (id, lang, grams.map(_ % 1024L))
    }
    val all = feats2.flatMap { case (_, lang, bs) => bs.map(b => (b, lang)) }
    val rCnt = all.groupBy(_._1).map { case (b, xs) => b -> xs.size.toLong }
    val tCnt = all.filter(_._2 == "en").groupBy(_._1)
      .map { case (b, xs) => b -> xs.size.toLong }.withDefaultValue(0L)
    val tt = tCnt.values.sum.toDouble
    val rt = rCnt.values.sum.toDouble
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    val w = rCnt.map { case (b, r) =>
      b -> r6(math.log((tCnt(b) + 0.5) / (tt + 512.0)) -
        math.log((r + 0.5) / (rt + 512.0)))
    }
    val scored = feats2.filter(_._3.nonEmpty).map { case (id, lang, bs) =>
      val s = bs.map(b => BigDecimal.valueOf(w(b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val dsir = math.floor((s.toDouble / bs.size) * 10000 + 0.5) / 10000.0
      (id, lang, bs.size.toLong, dsir)
    }
    val expected = scored.sortBy { case (id, _, _, d) => (-d, id) }.take(20)
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === expected.toSeq)

    // the selector visibly pulls the target distribution
    assert(out.count(_.getString(1) == "en") >= 15, "top-20 not en-dominated")
    val byLang = scored.groupBy(_._2).map { case (l, xs) =>
      l -> xs.map(_._4).sum / xs.size }
    val en = byLang("en")
    byLang.foreach { case (l, m) =>
      if (l != "en") assert(en > m, s"mean dsir(en)=$en not above $l=$m")
    }
  }

  test("chunk overlap: full coverage, exact overlap, reassembly round-trips") {
    val docs = graft.io.Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = Curation.chunkOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (docId, cs) =>
      val toks = docs(docId)
      val sorted = cs.sortBy(_._2)
      // chunk_no is the dense 0..k lattice; starts stride by S=24
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      sorted.foreach { case (_, no, start, nTok, text) =>
        assert(start === no * 24 + 1)
        val expected = toks.slice((start - 1).toInt, (start - 1 + 32).toInt)
        assert(text === expected.mkString(" "), s"doc $docId chunk $no")
        assert(nTok === expected.length.toLong)
      }
      // coverage: the last chunk reaches the final token
      val last = sorted.last
      assert(last._3 - 1 + last._4 === toks.length.toLong,
        s"doc $docId: tail token uncovered")
      // every token index covered by >=1 chunk follows from stride<=W and
      // the lattice being dense: W=32 >= S=24
    }
  }

  test("priority sample is quality-biased and exactly K without replacement") {
    val sample = Curation.prioritySample(spark, dir).collect()
    assert(sample.length === 60)
    assert(sample.map(_.getLong(0)).distinct.length === 60, "replacement!")
    // keys nondecreasing in output order (it IS the bottom-K race)
    val keys = sample.map(_.getDouble(3))
    assert(keys.toSeq === keys.sorted.toSeq)
    // E-S with w = quality must overselect high-quality docs. The fixture's
    // quality band is narrow, so the sharp deterministic check is against
    // the UNWEIGHTED race on the SAME uniform draws (w = 1): weighting by
    // quality must lift the selected set's mean quality strictly.
    val quality = graft.operators.TextAnalysis.qualityScore(spark, dir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def u(docId: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:prio42".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967297.0
    }
    val unweighted = quality.keys.toSeq
      .sortBy(d => (-math.log(u(d)), d)).take(60)
    val unweightedQ = unweighted.map(quality).sum / 60
    val sampleQ = sample.map(_.getDouble(2)).sum / sample.length
    assert(sampleQ > unweightedQ,
      s"weighting by quality did not lift mean quality: $sampleQ vs unweighted $unweightedQ")
    val corpusQ = quality.values.sum / quality.size
    assert(sampleQ > corpusQ,
      s"weighted sample mean quality $sampleQ not above corpus mean $corpusQ")
  }

  test("bpe merge application is greedy left-to-right, token-boundary safe") {
    import spark.implicits._
    // (seq, expected after merging pair "a a" -> "aa")
    val cases = Seq(
      ("a a a", "aa a"),        // odd run: greedy takes the leftmost pair
      ("a a a a", "aa aa"),     // consecutive occurrences share a boundary
                                // space — needs the multi-pass replace
      ("a a a a a a a a", "aa aa aa aa"),
      ("x a b", "x a b"),       // no occurrence
      ("xa b a a", "xa b aa"),  // token ENDING in 'a' must not half-match
      ("a ab a a b", "a ab aa b")) // token 'ab' is not the pair 'a a'
    val got = cases.map(_._1).toDF("seq")
      .select(Curation.bpeApplyMerge(col("seq"), "a a", "aa"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("bpe training: monotone compression curve, deterministic replay") {
    val r = graft.operators.IndexBuild.buildBpe(spark, dir).collect()
    assert(r.length === 12)
    assert(r.map(_.getInt(0)).toSeq === (1 to 12))
    r.foreach { row =>
      assert(row.getString(2) === row.getString(1).replace(" ", ""),
        "merged symbol must be the pair with its space removed")
    }
    val counts = r.map(_.getLong(3))
    assert(counts.forall(_ > 0))
    // a pair created by an earlier merge can never outnumber the pair that
    // was chosen over it — greedy argmax counts are non-increasing
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts not non-increasing: ${counts.toSeq}")
    // each merge removes one token per merged occurrence: 0 < delta <= count
    val toks = r.map(_.getLong(4))
    toks.zip(toks.tail).zip(counts.tail).foreach { case ((prev, next), c) =>
      assert(next < prev && prev - next <= c,
        s"token delta ${prev - next} outside (0, $c]")
    }
    val again = graft.operators.IndexBuild.buildBpe(spark, dir).collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "bpe training must be byte-reproducible")
  }

  test("bpe fertility: covers every source and reconciles with the train curve") {
    val train = graft.operators.IndexBuild.buildBpe(spark, dir).collect()
    val finalTokens = train.map(_.getLong(4)).last
    val f = Curation.bpeFertility(spark, dir).collect()
    val sources = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    assert(f.length === sources, "one fertility row per source")
    f.foreach { row =>
      val (nWords, nTokens, tpw) = (row.getLong(1), row.getLong(2), row.getDouble(3))
      assert(nTokens >= nWords, "every word is at least one token")
      assert(tpw >= 1.0 && tpw === math.floor(nTokens.toDouble / nWords * 1e4 + 0.5) / 1e4)
    }
    // the apply side must conserve the train side's final corpus token count
    assert(f.map(_.getLong(2)).sum === finalTokens,
      "per-source token totals must sum to the final corpus_tokens")
  }

  test("token shards: contiguous full sequences that conserve the tokenized corpus") {
    val train = graft.operators.IndexBuild.buildBpe(spark, dir).collect()
    val finalTokens = train.map(_.getLong(4)).last
    val s = Curation.tokenShards(spark, dir).collect()
    val seqLen = 512L
    // contiguous ids from 0, every sequence full except possibly the tail
    assert(s.map(_.getLong(0)).toSeq === (0L until s.length.toLong))
    s.init.foreach(r => assert(r.getLong(3) === seqLen,
      s"non-tail sequence ${r.getLong(0)} not full: ${r.getLong(3)}"))
    assert(s.last.getLong(3) <= seqLen && s.last.getLong(3) > 0)
    // packing is a partition of the tokenized corpus — nothing dropped or
    // double-counted, and the total ties the BPE train curve's final count
    assert(s.map(_.getLong(3)).sum === finalTokens,
      "sequence tokens must sum to the tokenized corpus size")
    // carry accounting: sequence 0 starts at a document start; carried
    // tokens never exceed the sequence, and a carried doc implies >0 carry
    assert(s.head.getLong(2) === 0L, "sequence 0 cannot carry tokens in")
    s.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(3))
      assert(r.getLong(1) >= 1L, "every sequence overlaps at least one doc")
    }
    // boundary-aligned docs make carry 0, but on a real corpus most cuts
    // land mid-document (deterministic fixture, so this is a stable pin)
    assert(s.tail.count(_.getLong(2) > 0L) > s.length / 2,
      "most sequences should start mid-document")
  }

  test("token shards through the lake: committed table ≡ direct frame, manifest-checkable, time travels") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, pmod, sum}
    val direct = Curation.tokenShards(spark, dir).collect()
    val lake = Curation.tokenShardsLake(spark, dir).collect()
    // content-neutral commit: the lake read is row-identical
    assert(lake.toSeq === direct.toSeq)
    // the trainer's pre-epoch validation flow: a per-bucket manifest
    // (count / token sum / id range / xor fingerprint — the
    // cur_shard_manifest contract applied to the SEQUENCE table) computed
    // from the committed table matches one computed from the pre-commit
    // frame, so a partially-written or silently re-materialized shard
    // cannot pass
    def manifestOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(pmod(col("seq_id"), lit(8L)).as("shard"))
        .agg(count(lit(1)).as("n_seqs"), sum(col("n_tokens")).as("n_tokens"),
          min(col("seq_id")).as("min_seq"), max(col("seq_id")).as("max_seq"),
          expr("bit_xor(hash(seq_id, n_docs, carry_tokens, n_tokens))").as("xor"))
        .orderBy(col("shard")).collect().toSeq
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-shards-lake/$base/sequences"
    val v = graft.operators.Merge.tableVersions(spark, tablePath).max
    assert(manifestOf(graft.operators.Merge.readTableAt(spark, tablePath, v)
      .select("seq_id", "n_docs", "carry_tokens", "n_tokens")) ===
      manifestOf(Curation.tokenShards(spark, dir)))
    // the committed version is a pinnable training input: reading AT the
    // version is exactly the gate's frame (readTableAt ≡ readTable here,
    // and stays so after later commits — the time-travel contract
    // MergeSpec pins in depth)
    assert(graft.operators.Merge.readTableAt(spark, tablePath, v)
      .count() === direct.length.toLong)
  }
}
