package graft.tools
import org.apache.spark.sql.SparkSession
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.IvfKMeans.kmeansCells(spark, dir).write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      graft.operators.IvfKMeans.kmeansSearch(spark, dir).write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"RUN$i cells ${(t1-t0)/1e9}%.2f search ${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
