package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch

class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5_32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d, 16)
  }

  test("sketch semantics: exact below K, estimator above, merge = bulk") {
    // below K distinct values: exact
    val small = (1 to 40).map(i => md5_32(i.toString))
    val bSmall = small.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    assert(KmvSketch.finish(bSmall) === 40L)
    // duplicates never inflate
    val bDup = (small ++ small).foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    assert(KmvSketch.finish(bDup) === 40L)

    // above K: the (K-1)*2^32/h_k estimator, within ~3/sqrt(K-2) of truth
    val n = 5000
    val hashes = (1 to n).map(i => md5_32(s"v$i"))
    val bulk = hashes.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    val est = KmvSketch.finish(bulk)
    val relErr = math.abs(est.toDouble - n) / n
    assert(relErr < 3.0 / math.sqrt(KmvSketch.K - 2), s"est $est for $n (err $relErr)")

    // merge of arbitrary splits equals the bulk sketch exactly
    val (l, r) = hashes.splitAt(1234)
    val merged = KmvSketch.merge(
      l.foldLeft(KmvSketch.zero)(KmvSketch.reduce),
      r.foldLeft(KmvSketch.zero)(KmvSketch.reduce))
    assert(merged.toSeq === bulk.toSeq)
    // and is insensitive to merge order
    val swapped = KmvSketch.merge(
      r.foldLeft(KmvSketch.zero)(KmvSketch.reduce),
      l.foldLeft(KmvSketch.zero)(KmvSketch.reduce))
    assert(swapped.toSeq === bulk.toSeq)
  }

  test("the sketch aggregates partially map-side (no raw-row shuffle)") {
    // the whole point of a mergeable sketch: the plan must show a partial
    // aggregate before the exchange (k longs per group cross the wire,
    // not one row per input)
    val plan = graft.operators.Relational
      .kmvDistinct(spark, SparkTestSession.Sf0001)
      .queryExecution.executedPlan.toString
    val objAggs = "ObjectHashAggregate".r.findAllIn(plan).size
    val sortAggs = "SortAggregate".r.findAllIn(plan).size
    assert(objAggs + sortAggs >= 2,
      s"expected partial+final aggregate pair in:\n$plan")
  }

  test("the query is partition-independent and tracks exact distinct") {
    import org.apache.spark.sql.functions._
    val base = graft.operators.Relational
      .kmvDistinct(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(base.nonEmpty)
    base.foreach { case (flag, est, exact) =>
      val err = math.abs(est.toDouble - exact) / math.max(exact, 1L)
      assert(err < 3.0 / math.sqrt(KmvSketch.K - 2), s"flag $flag: est $est exact $exact")
    }
    // same inputs, hostile partitioning: identical output (the property
    // HLL register layouts cannot give us)
    val li = graft.io.Tables.lineitem(spark, SparkTestSession.Sf0001)
      .repartition(17, col("l_suppkey"))
    val kmv = udaf(KmvSketch)
    val re = li.select(col("l_returnflag"),
        col("l_partkey"),
        conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("l_returnflag"))
      .agg(kmv(col("h")).as("kmv_parts"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(re.toSeq === base.toSeq)
  }
}
