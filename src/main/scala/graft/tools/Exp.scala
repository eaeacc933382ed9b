package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment main (dev tool, round 18): A/B timings for candidate
  * optimizations before they land in operators. Not part of the contract. */
object Exp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"EXP $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    // cost of the md5-hex-conv chain per row (600k rows)
    val base = li.select(col("l_partkey"))
    for (r <- 1 to 3) {
      time(s"baseline sum run$r")(noop(base.agg(sum(col("l_partkey")))))
      time(s"md5 only run$r")(noop(base.select(md5(col("l_partkey").cast("string")).as("h")).agg(count(col("h")))))
      time(s"md5+conv chain run$r")(noop(base.select(
        conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h")).agg(sum(col("h")))))
      time(s"xxhash64 run$r")(noop(base.select(xxhash64(col("l_partkey")).as("h")).agg(sum(col("h")))))
    }
    spark.stop()
  }
}
