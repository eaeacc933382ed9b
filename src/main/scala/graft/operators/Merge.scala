package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{OracleViews, Tables}

/** The reference's core merge-upsert (J1 family — reference:
  * src/lib/commands/gatherGames.ts:56-91 and variants at
  * gatherGamesRolimons.ts:220-257, gatherGamesFromSearch.ts:64-92):
  * full-outer join of a fresh snapshot against the existing table on the
  * primary key, with per-column merge policy:
  *
  *   - OVERWRITE: matched rows take the fresh value (name, rootPlaceId —
  *     and playerCount in the search variant);
  *   - COALESCE:  fresh value if non-null else existing (description in the
  *     Rolimons variant);
  *   - KEEP:      enrichment columns always come from the existing side.
  *
  * Scale design: a shuffle full-outer hash join on the key — both sides
  * hash-partition on universeId, so at 100 TB each executor merges one
  * co-located slice; AQE handles skew. (On a Delta/Iceberg table this same
  * policy is `MERGE WHEN MATCHED UPDATE ... WHEN NOT MATCHED INSERT`.)
  * The reference's O(n²) `games.find` probe (gatherGames.ts:66) is
  * deliberately NOT replicated.
  */
object Merge {

  /** Parameterized merge-upsert. All column sets exclude the key. */
  def mergeUpsert(
      existing: DataFrame,
      fresh: DataFrame,
      key: String,
      overwriteCols: Seq[String],
      coalesceCols: Seq[String],
      keepCols: Seq[String]): DataFrame = {
    val e = existing.alias("e")
    val f = fresh.alias("f")
    val freshPresent = col(s"f.$key").isNotNull
    def pick(c: String): Column =
      if (overwriteCols.contains(c)) when(freshPresent, col(s"f.$c")).otherwise(col(s"e.$c"))
      else if (coalesceCols.contains(c)) coalesce(col(s"f.$c"), col(s"e.$c"))
      else col(s"e.$c")
    val outCols = coalesce(col(s"e.$key"), col(s"f.$key")).as(key) +:
      (overwriteCols ++ coalesceCols ++ keepCols).map(c => pick(c).as(c))
    e.join(f, col(s"e.$key") === col(s"f.$key"), "full_outer")
      .select(outCols: _*)
  }

  /** Existing snapshot: 2/3 of the games table, enrichments included. */
  private def existingSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).filter(col("universeId") % 3 =!= 1)
      .drop("descriptionFetched")

  /** Fresh snapshot: every even key, gathered anew — updated name and
    * rootPlaceId, no enrichments except the variant columns. */
  private def freshSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).filter(col("universeId") % 2 === 0)
      .select(
        col("universeId"),
        (col("universeId") + 2000000L).as("rootPlaceId"),
        concat(col("name"), lit(" v2")).as("name"),
        when(col("universeId") % 5 === 0,
          concat(lit("refreshed "), col("universeId").cast("string"))).as("description"),
        (col("universeId") % 100 + 1).as("playerCount"))

  private val snapshotsSql: String =
    """existing AS (SELECT universeId, rootPlaceId, name, description,
      |                    gameplayDescription, playerCount
      |             FROM games WHERE universeId % 3 <> 1),
      |fresh AS (SELECT universeId,
      |                 universeId + 2000000 AS rootPlaceId,
      |                 name || ' v2' AS name,
      |                 CASE WHEN universeId % 5 = 0
      |                      THEN 'refreshed ' || CAST(universeId AS VARCHAR) END AS description,
      |                 universeId % 100 + 1 AS playerCount
      |          FROM games WHERE universeId % 2 = 0)""".stripMargin

  /** J1 base merge: overwrite name/rootPlaceId, keep all enrichments
    * (reference: gatherGames.ts:60-86). */
  def mergeBase(spark: SparkSession, dir: String): DataFrame =
    mergeUpsert(
      existingSnapshot(spark, dir), freshSnapshot(spark, dir), "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"))
      .orderBy(col("universeId"))

  val mergeBaseSql: String = OracleViews.withGames(
    s""", $snapshotsSql
       |SELECT coalesce(e.universeId, f.universeId) AS universeId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.rootPlaceId ELSE e.rootPlaceId END AS rootPlaceId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.name ELSE e.name END AS name,
       |  e.description AS description,
       |  e.gameplayDescription AS gameplayDescription,
       |  e.playerCount AS playerCount
       |FROM existing e FULL OUTER JOIN fresh f ON e.universeId = f.universeId
       |ORDER BY universeId""".stripMargin)

  /** J1b+J1c variant merge: additionally coalesce description from fresh
    * (gatherGamesRolimons.ts:220-257) and overwrite playerCount
    * (gatherGamesFromSearch.ts:64-92). */
  def mergeVariants(spark: SparkSession, dir: String): DataFrame =
    mergeUpsert(
      existingSnapshot(spark, dir), freshSnapshot(spark, dir), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"))
      .orderBy(col("universeId"))

  val mergeVariantsSql: String = OracleViews.withGames(
    s""", $snapshotsSql
       |SELECT coalesce(e.universeId, f.universeId) AS universeId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.rootPlaceId ELSE e.rootPlaceId END AS rootPlaceId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.name ELSE e.name END AS name,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.playerCount ELSE e.playerCount END AS playerCount,
       |  coalesce(f.description, e.description) AS description,
       |  e.gameplayDescription AS gameplayDescription
       |FROM existing e FULL OUTER JOIN fresh f ON e.universeId = f.universeId
       |ORDER BY universeId""".stripMargin)

  // ---------------------------------------------------------------------
  // Incremental merge at lake shape (round-9 verdict #5). The full-outer
  // merges above produce a complete snapshot — correct, but at 100 TB an
  // upsert of a few thousand fresh rows must not rewrite the table.
  // ---------------------------------------------------------------------

  /** Per-round accounting of [[upsertIncrementalRounds]] — the evidence
    * for "rewritten bytes ∝ touched buckets, not table size". */
  final case class IncRoundStats(
      round: Int, touchedBuckets: Int, totalBuckets: Int,
      rewrittenBytes: Long, tableBytes: Long)

  /** Crash-window hooks for [[upsertIncrementalRounds]] — injectable by
    * MergeSpec to kill the writer at each commit boundary. Production
    * callers use [[IncHooks.none]]. */
  final case class IncHooks(
      beforeCommit: Int => Unit = _ => (),
      afterCommit: Int => Unit = _ => ())
  object IncHooks { val none: IncHooks = IncHooks() }

  /** Incremental merge-upsert over a bucket-partitioned parquet table
    * with a MANIFEST-COMMITTED layout (round-10 verdict #7 closed the
    * crash window the bare per-bucket rename swap had): the snapshot
    * lives at `tablePath/bucket=<b>/gen=<g>/` (bucket = key mod
    * `buckets`, a stable data-independent layout; gen = the merge round
    * that produced the bucket's current files), and the SINGLE source of
    * truth for what is committed is the latest manifest under
    * `tablePath/_manifests/` — one `bucket,gen` line per bucket, written
    * to a temp name and renamed in (one-file rename = the atomic commit
    * point, exactly a lake format's metadata-pointer swap). Each round:
    *
    *   1. computes the fresh batch's touched buckets (a tiny driver list),
    *   2. reads ONLY those buckets back through the manifest
    *      ([[readTable]] — explicit committed-gen paths, so the scan never
    *      touches idle buckets OR uncommitted files),
    *   3. applies the same per-column [[mergeUpsert]] policy within them,
    *   4. APPENDS the merged buckets as `gen=<round>` dirs (never mutating
    *      committed files; leftover same-gen dirs from a crashed prior
    *      attempt are cleared first — they are uncommitted by definition),
    *   5. commits the new manifest (touched buckets now point at the new
    *      gen), then garbage-collects the replaced gen dirs.
    *
    * Crash anywhere before (5)'s rename → the table reads as the previous
    * version (new gen dirs exist but no manifest names them); crash after
    * → the table reads as the new version and the stale gens are ignored
    * until the next round's GC. MergeSpec drives both windows through
    * [[IncHooks]] and asserts the read.
    *
    * Scale: rewritten bytes per round ≈ touched/total × table bytes, and
    * the manifest is O(buckets) lines — the dial is bucket count (size it
    * so one bucket's merge fits an executor, buckets ≈ tableBytes/1 GiB;
    * at 100 TB a 10⁵-bucket table absorbs a 10³-key batch by rewriting
    * ≈1 % of the data and rewriting a 10⁵-line manifest). Stats are
    * returned (and printed as MERGEINC lines by the SfScale replay)
    * rather than asserted, so SCALING.md rows are measurements. */
  def upsertIncrementalRounds(
      spark: SparkSession, tablePath: String,
      initial: DataFrame, freshRounds: Seq[DataFrame], key: String,
      overwriteCols: Seq[String], coalesceCols: Seq[String], keepCols: Seq[String],
      buckets: Int, hooks: IncHooks = IncHooks.none): Seq[IncRoundStats] = {
    val hc = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hc)
    // int, matching the type partition-discovery infers for `bucket=` dirs
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("bucket", pmod(col(key), lit(buckets)).cast("int"))
    def dirBytes(p: org.apache.hadoop.fs.Path): Long =
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).map(st =>
        if (st.isDirectory) dirBytes(st.getPath) else st.getLen).sum
    def genPath(b: Int, g: Int) =
      new org.apache.hadoop.fs.Path(table, s"bucket=$b/gen=$g")
    fs.delete(table, true)
    withBucket(initial).withColumn("gen", lit(0))
      .write.partitionBy("bucket", "gen").parquet(tablePath)
    // v0 manifest: every bucket the initial write produced, at gen 0
    val initialBuckets = fs.listStatus(table).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt)
    commitManifest(fs, table, 0, initialBuckets.map(_ -> 0).toMap)
    freshRounds.map(fresh0 =>
      upsertRound(spark, tablePath, fresh0, key,
        overwriteCols, coalesceCols, keepCols, buckets, hooks))
  }

  /** One incremental round against an EXISTING manifest-committed table —
    * the resume entry point: the round number is derived from the latest
    * committed manifest (version + 1), so re-running after a crash (any
    * window) picks up exactly where the last commit left off, clearing
    * that round's uncommitted leftovers before re-appending. */
  def upsertRound(
      spark: SparkSession, tablePath: String, fresh0: DataFrame, key: String,
      overwriteCols: Seq[String], coalesceCols: Seq[String], keepCols: Seq[String],
      buckets: Int, hooks: IncHooks = IncHooks.none): IncRoundStats = {
    val hc = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hc)
    def dirBytes(p: org.apache.hadoop.fs.Path): Long =
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).map(st =>
        if (st.isDirectory) dirBytes(st.getPath) else st.getLen).sum
    def genPath(b: Int, g: Int) =
      new org.apache.hadoop.fs.Path(table, s"bucket=$b/gen=$g")
    val (version, current) = readManifest(fs, table)
    val round = version + 1
    val fresh = fresh0.withColumn("bucket",
      pmod(col(key), lit(buckets)).cast("int"))
    val touched = fresh.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val existingTouched = readTable(spark, tablePath)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      .drop("bucket", "gen")
    val merged = mergeUpsert(
        existingTouched, fresh.drop("bucket"), key,
        overwriteCols, coalesceCols, keepCols)
      .withColumn("bucket", pmod(col(key), lit(buckets)).cast("int"))
    // clear uncommitted leftovers of a crashed prior attempt at this gen,
    // then append the merged buckets as the new generation — committed
    // files are never touched
    touched.foreach(b => fs.delete(genPath(b, round), true))
    merged.withColumn("gen", lit(round))
      .write.mode("append").partitionBy("bucket", "gen").parquet(tablePath)
    val rewritten = touched.map(b => dirBytes(genPath(b, round))).sum
    hooks.beforeCommit(round)
    val committed = current ++ touched.map(_ -> round)
    commitManifest(fs, table, round, committed)
    hooks.afterCommit(round)
    // GC the replaced generations (post-commit; a crash here only leaves
    // stale dirs the reader already ignores)
    touched.foreach(b => current.get(b).foreach(g => fs.delete(genPath(b, g), true)))
    val tableBytes = committed.map { case (b, g) => dirBytes(genPath(b, g)) }.sum
    IncRoundStats(round, touched.length, buckets, rewritten, tableBytes)
  }

  private def manifestDir(table: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(table, "_manifests")

  /** Atomic commit: write `bucket,gen` lines to a temp file, rename to
    * `manifest-v<version>` — the one-file rename that makes the version
    * visible. */
  private def commitManifest(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      version: Int, state: Map[Int, Int]): Unit = {
    val dir = manifestDir(table)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tmp-manifest-v$version")
    val out = fs.create(tmp, true)
    try out.write(state.toSeq.sorted.map { case (b, g) => s"$b,$g" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new org.apache.hadoop.fs.Path(dir, s"manifest-v$version")
    fs.delete(fin, false)
    require(fs.rename(tmp, fin), s"manifest commit failed: $fin")
  }

  /** Latest committed (version, bucket → gen). */
  private def readManifest(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path)
      : (Int, Map[Int, Int]) = {
    val dir = manifestDir(table)
    val versions = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("manifest-v")).map(_.stripPrefix("manifest-v").toInt)
    require(versions.nonEmpty, s"no committed manifest under $dir")
    val v = versions.max
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"manifest-v$v"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    (v, text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(b, g) = l.split(','); b.toInt -> g.toInt
    }.toMap)
  }

  /** The manifest-aware reader — the ONLY correct way to read the
    * incremental table (a bare `spark.read.parquet(tablePath)` would see
    * uncommitted or not-yet-GC'd generations): loads exactly the latest
    * manifest's `bucket=<b>/gen=<g>` dirs, with `basePath` so `bucket`
    * (and `gen`) stay partition columns and bucket filters still prune. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, state) = readManifest(fs, table)
    val paths = state.toSeq.sorted.map { case (b, g) => s"$tablePath/bucket=$b/gen=$g" }
    spark.read.option("basePath", tablePath).parquet(paths: _*)
  }

  private val IncBuckets = 16
  private val IncRounds = 3

  /** Round-r fresh batch: a SMALL sparse key slice (`key % 97 == r`, ~1 %
    * of the table) — the lake-shape regime, where the batch touches few
    * buckets. Carries the round number into every overwritten/coalesced
    * column so the final table proves ordering (later rounds win) and
    * policy (KEEP columns survive from the initial snapshot). */
  private def freshRound(spark: SparkSession, dir: String, r: Int): DataFrame =
    freshRoundMod(spark, dir, r, 97)

  private def freshRoundMod(
      spark: SparkSession, dir: String, r: Int, keyMod: Int): DataFrame =
    Tables.games(spark, dir).filter(col("universeId") % keyMod === r)
      .select(
        col("universeId"),
        (col("universeId") + lit(1000000L) * r).as("rootPlaceId"),
        concat(col("name"), lit(s" r$r")).as("name"),
        when(col("universeId") % 2 === 0,
          concat(lit(s"refresh$r "), col("universeId").cast("string"))).as("description"),
        (col("universeId") % 100 + r).as("playerCount"))

  /** SCALING probe (SfScale's merge-inc block): the same three-round
    * incremental merge at LAKE-REGIME dials — bucket count sized to the
    * corpus and a fresh batch much smaller than it (`keyMod` ≫ buckets is
    * the regime where rewritten-bytes ∝ touched-buckets shows; the
    * oracle-checked query pins 16 buckets / ~1 % batches for the
    * fixture-size equivalence proof instead). */
  def incrementalProbe(spark: SparkSession, dir: String, tablePath: String,
      buckets: Int, keyMod: Int): Seq[IncRoundStats] =
    upsertIncrementalRounds(
      spark, tablePath,
      existingSnapshot(spark, dir),
      (1 to IncRounds).map(freshRoundMod(spark, dir, _, keyMod)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = buckets)

  private def freshRoundSql(r: Int): String =
    s"""f$r AS (SELECT universeId,
       |          universeId + ${1000000L * r} AS rootPlaceId,
       |          name || ' r$r' AS name,
       |          CASE WHEN universeId % 2 = 0
       |               THEN 'refresh$r ' || CAST(universeId AS VARCHAR) END AS description,
       |          universeId % 100 + $r AS playerCount
       |        FROM games WHERE universeId % 97 = $r)""".stripMargin

  /** `j1_merge_incremental`: THE gate for the incremental path — run
    * [[IncRounds]] small merge rounds through the bucket-partitioned
    * on-disk table (writes + per-bucket swaps included), read the final
    * table back, and hash-compare it against the oracle's [[IncRounds]]
    * UNROLLED full-outer merges over the whole snapshot. Incremental ≡
    * full is exactly the claim: merge is key-local and the bucket
    * function is on the key, so a global full-outer merge restricted to
    * untouched buckets is the identity. Policy = the variants mix
    * (overwrite + coalesce + keep), so per-column policy survival is part
    * of the same hash. */
  def mergeIncremental(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-merge-inc/$base/games"
    val stats = upsertIncrementalRounds(
      spark, tablePath,
      existingSnapshot(spark, dir),
      (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = IncBuckets)
    stats.foreach(s => println(
      s"MERGEINC round=${s.round} touched=${s.touchedBuckets}/${s.totalBuckets} " +
        s"rewritten_bytes=${s.rewrittenBytes} table_bytes=${s.tableBytes}"))
    readTable(spark, tablePath)
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeIncrementalSql: String = OracleViews.withGames(
    s""", existing AS (SELECT universeId, rootPlaceId, name, description,
       |                      gameplayDescription, playerCount
       |               FROM games WHERE universeId % 3 <> 1),
       |${(1 to IncRounds).map(freshRoundSql).mkString(",\n")},
       |${(1 to IncRounds).map { r =>
           val prev = if (r == 1) "existing" else s"m${r - 1}"
           s"""m$r AS (SELECT coalesce(e.universeId, f.universeId) AS universeId,
              |  CASE WHEN f.universeId IS NOT NULL THEN f.rootPlaceId ELSE e.rootPlaceId END AS rootPlaceId,
              |  CASE WHEN f.universeId IS NOT NULL THEN f.name ELSE e.name END AS name,
              |  coalesce(f.description, e.description) AS description,
              |  e.gameplayDescription AS gameplayDescription,
              |  CASE WHEN f.universeId IS NOT NULL THEN f.playerCount ELSE e.playerCount END AS playerCount
              |FROM $prev e FULL OUTER JOIN f$r f ON e.universeId = f.universeId)""".stripMargin
         }.mkString(",\n")}
       |SELECT * FROM m$IncRounds ORDER BY universeId""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_merge_upsert" -> mergeBase,
    "j1bc_merge_variants" -> mergeVariants,
    "j1_merge_incremental" -> mergeIncremental
  )

  val oracles: Map[String, String] = Map(
    "j1_merge_upsert" -> mergeBaseSql,
    "j1bc_merge_variants" -> mergeVariantsSql,
    "j1_merge_incremental" -> mergeIncrementalSql
  )
}
