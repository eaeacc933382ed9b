package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Filtering

class FilteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  test("MaxLongMultiplicity equals the naive mode count") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Seq.fill(rnd.nextInt(40))(rnd.nextInt(8).toLong)) :+
      Seq.empty[Long] :+ Seq(3L)
    val df = rows.toDF("xs").select(
      col("xs"),
      graft.functions.ArrayExpressions.maxLongMultiplicity(col("xs")).as("m"))
    df.collect().foreach { r =>
      val xs = r.getSeq[Long](0)
      val expected =
        if (xs.isEmpty) 0 else xs.groupBy(identity).values.map(_.size).max
      assert(r.getInt(1) === expected, s"input $xs")
    }
  }

  test("gopher repetition metrics match a naive Scala recomputation") {
    val out = Filtering.gopherRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    assert(docs.length === out.size)
    def round4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    docs.foreach { d =>
      val toks = d.getString(1).toLowerCase.split("\\s+").toSeq
      val n = toks.size.toDouble
      val dupw = 1.0 - toks.distinct.size / n
      val topw = toks.groupBy(identity).values.map(_.size).max / n
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val dup2 =
        if (bigrams.isEmpty) 0.0 else 1.0 - bigrams.distinct.size / bigrams.size.toDouble
      val keep = dupw <= 0.6 && topw <= 0.15 && dup2 <= 0.05 &&
        n >= 20 && n <= 1000
      val r = out(d.getLong(0))
      assert(r.getLong(1) === toks.size)
      assert(r.getDouble(2) === round4(dupw), s"dup_word_frac doc ${d.getLong(0)}")
      assert(r.getDouble(3) === round4(topw), s"top_word_frac doc ${d.getLong(0)}")
      assert(r.getDouble(4) === round4(dup2), s"dup_2gram_frac doc ${d.getLong(0)}")
      assert(r.getLong(5) === (if (keep) 1L else 0L), s"keep doc ${d.getLong(0)}")
    }
    // thresholds discriminate: both classes present
    val kept = out.values.count(_.getLong(5) == 1L)
    assert(kept > 0 && kept < out.size)
  }

  test("gopher quality metrics match a naive Scala recomputation") {
    val out = Filtering.gopherQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    assert(docs.length === out.size)
    def round4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    val stop = Set("the", "a", "of", "to", "and")
    docs.foreach { d =>
      val id = d.getLong(0)
      val dirty = d.getString(1) +
        (if (id % 5 == 0) " # # # # # # # #" else "") +
        (if (id % 7 == 0) " 12 345 6789 01 23 456 78 90" else "")
      val toks = dirty.split("\\s+").toSeq
      val n = toks.size.toDouble
      val mwl = toks.map(_.length).sum / n
      val symr = toks.count(t => t == "#" || t.matches("\\.\\.\\.")) / n
      val alpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')) / n
      val nStop = toks.count(stop)
      val keep = n >= 20 && n <= 400 && mwl >= 3.0 && mwl <= 10.0 &&
        symr <= 0.05 && alpha >= 0.9 && nStop >= 2
      val r = out(id)
      assert(r.getLong(1) === toks.size, s"n_words doc $id")
      assert(r.getDouble(2) === round4(mwl), s"mean_word_len doc $id")
      assert(r.getDouble(3) === round4(symr), s"symbol_ratio doc $id")
      assert(r.getDouble(4) === round4(alpha), s"alpha_frac doc $id")
      assert(r.getLong(5) === nStop.toLong, s"n_stop doc $id")
      assert(r.getLong(6) === (if (keep) 1L else 0L), s"keep doc $id")
    }
    // planted hashtag docs always fail (8/(n+8) > 0.05 needs n < 152 and the
    // corpus tops out near 110 words); planted numeric docs fail the alpha
    // rule exactly when the doc is small enough that 8 tokens matter — both
    // branches of that rule must occur, and alpha only dips on planted docs
    out.values.foreach { r =>
      val id = r.getLong(0)
      if (id % 5 == 0) assert(r.getLong(6) === 0L, s"hashtag doc $id kept")
      if (r.getDouble(4) < 0.9)
        assert(id % 7 == 0 || id % 5 == 0, s"alpha dipped on unplanted doc $id")
    }
    val numeric = out.values.filter(r => r.getLong(0) % 7 == 0 && r.getLong(0) % 5 != 0)
    assert(numeric.exists(_.getDouble(4) < 0.9), "alpha rule never fired")
    assert(numeric.exists(_.getDouble(4) >= 0.9), "alpha rule fired on every planted doc")
    val kept = out.values.count(_.getLong(6) == 1L)
    assert(kept > 0 && kept < out.size)
  }

  test("line dedup drops exactly the boilerplate lines and keeps order") {
    val out = Filtering.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.size === out.size)
    val b1 = "accept cookies to continue reading this site"
    val b2 = "all rights reserved contact the site owner today"
    def linesOf(id: Long): Seq[String] = {
      val toks = docs(id).toLowerCase.split("\\s+").toSeq
      val nat = toks.grouped(12).map(_.mkString(" ")).toSeq
      (if (id % 4 == 0) Seq(b1) else Nil) ++ nat ++
        (if (id % 6 == 0) Seq(b2) else Nil)
    }
    // dup set recomputed from scratch on the line STRINGS (also proves the
    // plan's 32-bit hashes did not collide on this corpus)
    val docCount = docs.keys.toSeq.flatMap(id => linesOf(id).distinct.map(_ -> id))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val dup = docCount.filter(_._2 >= 5).keySet
    assert(dup === Set(b1, b2), s"unexpected dup set: $dup")
    docs.keys.foreach { id =>
      val all = linesOf(id)
      val keptLines = all.filterNot(dup)
      val r = out(id)
      assert(r.getLong(1) === all.size.toLong, s"n_lines doc $id")
      assert(r.getLong(2) === (all.size - keptLines.size).toLong, s"n_dropped doc $id")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(keptLines.mkString("\n").getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      assert(r.getLong(3) === java.lang.Long.parseLong(md5, 16), s"clean_fp doc $id")
    }
  }

  test("lm perplexity matches a naive recomputation and head is en-dominated") {
    val out = Filtering.lmPerplexity(spark, dir).collect()
    def md5_32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d, 16)
    }
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 512L
    val pairs = docs.map { case (id, lang, text) =>
      val bs = text.toLowerCase.split("\\s+").map(t => md5_32(t) % B)
      (id, lang, bs.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq)
    }.filter(_._3.nonEmpty)
    assert(out.length === pairs.length, "every multi-token doc scored")
    val enPairs = pairs.filter(_._2 == "en").flatMap(_._3)
    val mc = enPairs.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val cc = enPairs.groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    def lp(p: (Long, Long)): Double = mc.get(p) match {
      case Some(c) => r6(math.log((c + 0.5) / (cc(p._1) + 256.0)))
      case None => cc.get(p._1) match {
        case Some(ctx) => r6(math.log(0.5 / (ctx + 256.0)))
        case None => r6(math.log(0.5 / 256.0))
      }
    }
    val hByDoc = pairs.map { case (id, lang, ps) =>
      val s = ps.map(p => BigDecimal.valueOf(lp(p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      (id, lang, ps.size.toLong,
        math.floor(-(s.toDouble) / ps.size * 10000 + 0.5) / 10000.0)
    }
    val expected = hByDoc.map(t => t._1 -> t).toMap
    out.foreach { r =>
      val (id, lang, n, h) = (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
      val e = expected(id)
      assert((lang, n, h) === ((e._2, e._3, e._4)), s"doc $id")
    }
    // tercile sizes within 1 of n/3, labels monotone in h
    val byBucket = out.groupBy(_.getString(4))
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    val n3 = out.length / 3.0
    byBucket.values.foreach(g => assert(math.abs(g.length - n3) <= 1.0))
    val maxHead = byBucket("head").map(_.getDouble(3)).max
    val minTail = byBucket("tail").map(_.getDouble(3)).min
    assert(maxHead < minTail)
    assert(byBucket("middle").forall(r =>
      r.getDouble(3) > maxHead - 1e-9 && r.getDouble(3) < minTail + 1e-9))
    // the en-trained LM discriminates: en mean cross-entropy below every
    // other language, and the head tercile is en-dominated
    val byLang = out.groupBy(_.getString(1))
      .map { case (l, rs) => l -> rs.map(_.getDouble(3)).sum / rs.length }
    byLang.foreach { case (l, m) =>
      if (l != "en") assert(byLang("en") < m, s"mean h(en) not below $l")
    }
    val enFrac = byBucket("head").count(_.getString(1) == "en").toDouble /
      byBucket("head").length
    assert(enFrac > 0.5, s"head tercile only $enFrac en")
  }

  test("pii redaction finds exactly the planted identifiers and scrubs them all") {
    val out = Filtering.piiRedact(spark, dir).collect()
    val ids = graft.io.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.filter(id => id % 7 == 0 || id % 11 == 0 || id % 13 == 0).sorted
    assert(out.map(_.getLong(0)).toSeq === expected.toSeq)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 7 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) === (if (id % 11 == 0) 1L else 0L), s"phones doc $id")
      assert(r.getLong(3) === (if (id % 13 == 0) 1L else 0L), s"ips doc $id")
    }
    // independent recomputation: plant + scrub with plain java.util.regex,
    // check the redacted text carries no residual PII and fingerprints to
    // the exact clean_fp the plan produced (byte-identical redaction)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\+[0-9][0-9 ]{5,}[0-9]"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val texts = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val dirty = texts(id) +
        (if (id % 7 == 0) s" contact user$id@example.com" else "") +
        (if (id % 11 == 0) f" call +1 555 ${id % 10000}%04d" else "") +
        (if (id % 13 == 0) s" host 10.0.${id % 250}.${id % 200 + 1}" else "")
      val clean = dirty.replaceAll(email, "<EMAIL>")
        .replaceAll(phone, "<PHONE>").replaceAll(ip, "<IP>")
      assert(!clean.matches(s".*($email|$phone|$ip).*"), s"residual PII doc $id")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(clean.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      assert(r.getLong(5) === java.lang.Long.parseLong(md5, 16), s"clean_fp doc $id")
      assert(r.getLong(4) === clean.length.toLong, s"clean_len doc $id")
    }
  }

  test("c4 heuristics match a naive Scala recomputation and every rule fires") {
    val out = Filtering.c4Heuristics(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    assert(docs.length === out.size)
    docs.foreach { d =>
      val id = d.getLong(0)
      val toks = d.getString(1).toLowerCase.split("\\s+").toSeq
      val nl = math.ceil(toks.size / 12.0).toInt
      val derived = (0 until nl).map { i =>
        val line = toks.slice(i * 12, i * 12 + 12).mkString(" ")
        if ((id + i) % 3 != 2) line + "." else line
      }
      val lines = derived ++
        (if (id % 9 == 0) Seq("enable javascript to view this page.") else Nil) ++
        (if (id % 17 == 0) Seq("lorem ipsum dolor sit amet.") else Nil) ++
        (if (id % 19 == 0) Seq("function() { return 0; }") else Nil) ++
        (if (id % 23 == 0) Seq("visit xxx site now.") else Nil)
      def isSent(l: String) = l.matches(".*[.!?\"]$")
      val kept = lines.filter(l =>
        isSent(l) && l.split(" ").length >= 3 && !l.contains("javascript"))
      val bad = lines.exists(_.matches(".*\\b(xxx|porn|nsfw)\\b.*"))
      val lor = lines.exists(_.contains("lorem ipsum"))
      val brace = lines.exists(_.contains("{"))
      val keep = kept.size >= 3 && !bad && !lor && !brace
      val r = out(id)
      assert(r.getLong(1) === lines.size.toLong, s"n_lines doc $id")
      assert(r.getLong(2) === lines.count(isSent).toLong, s"n_sent doc $id")
      assert(r.getLong(3) === kept.size.toLong, s"n_kept doc $id")
      assert(r.getLong(4) === (if (bad) 1L else 0L), s"has_badword doc $id")
      assert(r.getLong(5) === (if (lor) 1L else 0L), s"has_lorem doc $id")
      assert(r.getLong(6) === (if (brace) 1L else 0L), s"has_brace doc $id")
      assert(r.getLong(7) === (if (keep) 1L else 0L), s"keep doc $id")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString("\n").getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      assert(r.getLong(8) === java.lang.Long.parseLong(md5, 16), s"clean_fp doc $id")
    }
    // every rule discriminates: pages dropped by each page rule, lines
    // dropped by each line rule, and survivors exist
    val vals = out.values.toSeq
    assert(vals.exists(_.getLong(4) == 1L))
    assert(vals.exists(_.getLong(5) == 1L))
    assert(vals.exists(_.getLong(6) == 1L))
    assert(vals.exists(r => r.getLong(7) == 0L && r.getLong(4) == 0L &&
      r.getLong(5) == 0L && r.getLong(6) == 0L), "sentence-count rule fires")
    assert(vals.exists(r => r.getLong(3) < r.getLong(2)), "line rules fire")
    val kept = vals.count(_.getLong(7) == 1L)
    assert(kept > 0 && kept < vals.size)
  }
}
