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
}
