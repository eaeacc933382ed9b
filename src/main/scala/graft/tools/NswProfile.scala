package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the NSW graph operator: edge-table build vs beam
  * hops vs the full query — `runMain graft.tools.NswProfile [sfDir]`.
  * The round-6 numbers this produced are recorded in SCALING.md. */
object NswProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.io.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"NSWPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 2) {
      val edges = CacheRegistry.persistTracked(graft.operators.Nsw.edgesOn(e))
      t(s"edges_build_run$i") { println("edges rows: " + edges.count()) }
      t(s"hops_only_run$i") {
        graft.operators.Nsw.searchWithEdges(e, edges)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"full_search_run$i") {
        graft.operators.Nsw.nswSearch(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      CacheRegistry.release(blocking = true)
      CacheRegistry.releaseShared(blocking = true)
    }
    spark.stop()
  }
}
