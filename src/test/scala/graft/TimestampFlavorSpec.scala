package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.io.Tables
import graft.operators.Events

/** Portability gate for parquet timestamp flavors (round-8 regression: the
  * scoring host's events fixture arrived as TIMESTAMP_NTZ and broke every
  * `unix_millis` call at analysis time, while the builder host's
  * TIMESTAMP(NANOS)→LONG shape stayed green — an environment split a data
  * engine must not have).
  *
  * The same events fixture is rewritten in the three shapes real writers
  * produce — LONG nanos (Spark under nanosAsLong), TIMESTAMP micros
  * (instant-adjusted), TIMESTAMP_NTZ micros (pandas/pyarrow default) — and
  * EVERY query in [[Events.queries]] must return identical rows on each.
  */
class TimestampFlavorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val flavorDirs: Map[String, String] = {
    val base = Tables.events(spark, SparkTestSession.Sf0001) // normalized TIMESTAMP
    val root = Files.createTempDirectory("graft-ts-flavors").toString
    val dirs = Map(
      "long_nanos" -> s"$root/long_nanos",
      "timestamp_micros" -> s"$root/timestamp_micros",
      "timestamp_ntz" -> s"$root/timestamp_ntz")
    base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.parquet(s"${dirs("long_nanos")}/events.parquet")
    base
      .write.parquet(s"${dirs("timestamp_micros")}/events.parquet")
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"${dirs("timestamp_ntz")}/events.parquet")
    dirs
  }

  test("reader normalizes every on-disk flavor to TimestampType") {
    flavorDirs.foreach { case (flavor, dir) =>
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt === org.apache.spark.sql.types.TimestampType,
        s"flavor $flavor read back as $dt")
    }
  }

  Events.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name returns identical rows on all three timestamp flavors") {
      val results = flavorDirs.map { case (flavor, dir) =>
        flavor -> Events.queries(name)(spark, dir).collect().toSeq
      }
      val (refFlavor, ref) = results.head
      assert(ref.nonEmpty, s"$name returned no rows on $refFlavor")
      results.tail.foreach { case (flavor, rows) =>
        assert(rows === ref, s"$name differs between $flavor and $refFlavor")
      }
    }
  }
}
