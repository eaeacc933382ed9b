package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ArrayExpressions
import graft.operators.Dedup

/** Calibration probe for the LSH banding dial: MEASURE the candidate
  * recall of banded minhash against the closed form 1−(1−s^r)^b, on
  * planted near-dup pairs spanning a similarity spectrum.
  *
  * Every banded dedup in the engine inherits the pinned 4 bands × 4 rows
  * (16 hashes) and cites the formula for why similar pairs collide; this
  * probe is the evidence the citation rests on. It plants, for each base
  * doc, near-dups with 2/6/12/24 appended tokens (exact Jaccard
  * (n−2)/(n+t−2) over 3-gram shingles, so the fixture's 10–99-token docs
  * yield pairs from ~0.2 to ~0.98), then for each partition of the 16
  * hashes — 16×1, 8×2, 4×4, 2×8 — reports caught-rate vs predicted
  * collision probability per similarity decile.
  *
  * Usage: runMain graft.tools.BandSweep — prints one BANDSWEEP row per
  * (config, decile). Recorded in SCALING.md "The banding dial".
  */
object BandSweep {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tails = Seq(2, 6, 12, 24)
    val tailText = (t: Int) => (1 to t).map(i => s"tail$i").mkString(" ")
    // planted near-dups: one per (doc, tail width), ids offset per width
    val corpus = tails.foldLeft(docs) { (acc, t) =>
      acc.unionByName(docs.select(
        (col("doc_id") + t * 1000000L).as("doc_id"),
        concat(col("text"), lit(" " + tailText(t))).as("text")))
    }
    val sh = Dedup.shingledOf(Dedup.toksOf(corpus))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // planted pairs with their EXACT shingle jaccard (not the formula)
    val pairs = tails.map { t =>
      docs.select(col("doc_id").as("a_id"),
        (col("doc_id") + t * 1000000L).as("b_id"))
    }.reduce(_ unionByName _)
      .join(sh.select(col("doc_id").as("a_id"), col("hs").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("hs").as("sb")), "b_id")
      .withColumn("inter", ArrayExpressions.sortedLongIntersectCount(col("sa"), col("sb")))
      .withColumn("jacc",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .select(col("a_id"), col("b_id"), col("jacc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()

    println(f"${"config"}%8s ${"jacc_decile"}%12s ${"n_pairs"}%8s ${"caught"}%8s ${"rate"}%7s ${"predicted"}%10s")
    for ((b, r) <- Seq((16, 1), (8, 2), (4, 4), (2, 8))) {
      val banded = Dedup.bandedSignatures(sh, b, r)
      val caught = banded.as("x")
        .join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
        .withColumn("hit", lit(1))
      val rows = pairs
        .join(caught, Seq("a_id", "b_id"), "left")
        .withColumn("decile", floor(col("jacc") * 10) / 10.0)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("hit"), lit(0))).as("caught"),
          avg(lit(1.0) - pow(lit(1.0) - pow(col("jacc"), r), b)).as("pred"))
        .orderBy(col("decile"))
        .collect()
      rows.foreach { row =>
        val (d, n, c, p) = (row.getDouble(0), row.getLong(1), row.getLong(2), row.getDouble(3))
        println(f"BANDSWEEP ${b}x$r%-5s $d%12.1f $n%8d $c%8d ${c.toDouble / n}%7.3f $p%10.3f")
      }
    }
    spark.stop()
  }
}
