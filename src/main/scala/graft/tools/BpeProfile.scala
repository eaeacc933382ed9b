package graft.tools

/* Phase profiler for the BPE training loop (the HnswBulkProfile
 * convention): times vocab0 persist, the totalFreq agg, and each round's
 * fused pair-agg + merge materialization separately. This probe is what
 * caught the growing per-round ANALYSIS cost (0.2 s -> 0.9 s by round 12
 * at sf0.1) that motivated checkpointTracked in Curation.bpeBuildSteps —
 * note its loop uses persistTracked deliberately, so the un-truncated
 * lineage growth stays reproducible. */
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    t("warm") { graft.operators.IndexBuild.buildBpe(spark, "/root/testdata/sf0.001").collect() }
    // replicate the loop with per-iteration timing
    import graft.io.Tables
    val vocab0 = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(concat_ws(" ", split(col("word"), "")), lit(" </w>")).as("seq"))
    var vocab = t("persist-vocab0") { val v = CacheRegistry.persistTracked(vocab0); v.count(); v }
    t("totalFreq") { vocab.agg(sum(col("freq"))).collect() }
    for (i <- 1 to 12) {
      val row = t(s"pairAgg-$i") {
        vocab.withColumn("l", split(col("seq"), " "))
          .select(explode(expr("transform(sequence(0, size(l) - 2), j -> concat(l[j], ' ', l[j+1]))")).as("pair"), col("freq"))
          .groupBy(col("pair")).agg(sum(col("freq")).as("c"))
          .agg(max(struct(col("c"), col("pair"))).as("m"), sum(col("c")).as("mass"))
          .collect()(0)
      }
      val pair = row.getStruct(0).getString(1)
      val next = CacheRegistry.persistTracked(
        vocab.withColumn("seq", graft.operators.Curation.bpeApplyMerge(col("seq"), pair, pair.replace(" ", ""))))
      t(s"materialize-$i") { next.count() }
      vocab = next
    }
    spark.stop()
  }
}
