package graft



import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing demo: pre-partitioning both sides of the canonical
  * games ⋈ embeddings join by key eliminates the shuffle entirely — the
  * at-scale answer for repeatedly-joined 100 TB tables (write once
  * bucketed, join forever shuffle-free). Verified by asserting the
  * executed plan contains no Exchange.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables join without any Exchange in the plan") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.io.Tables.documents(spark, SparkTestSession.Sf0001)
        .select(col("doc_id").as("id"), col("text"))
        .write.mode("overwrite")
        .bucketBy(8, "id").sortBy("id")
        .saveAsTable("docs_bucketed")
      graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
        .select(col("vec_id").as("id"), col("embedding"))
        .write.mode("overwrite")
        .bucketBy(8, "id").sortBy("id")
        .saveAsTable("emb_bucketed")

      val joined = spark.table("docs_bucketed")
        .join(spark.table("emb_bucketed"), Seq("id"))
      assert(joined.count() === 500L)

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS emb_bucketed")
    }
  }
}
