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

  /** Job-description label for one write-path phase (optimization guide
    * §1.5): the merge machinery runs several Spark actions per round, and
    * unlabeled jobs make per-phase attribution guesswork in any listener/UI
    * view. Thread-local, restored on exit, so nested phases keep the
    * innermost label. */
  private def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

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

  // shared on-disk layout helpers (one definition — local copies in the
  // writer methods drifted toward duplication as the lake surface grew)
  private def genPathOf(table: org.apache.hadoop.fs.Path, b: Int, g: Int) =
    new org.apache.hadoop.fs.Path(table, s"bucket=$b/gen=$g")
  private def dirBytesOf(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).map(st =>
      if (st.isDirectory) dirBytesOf(fs, st.getPath) else st.getLen).sum

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
    * rather than asserted, so SCALING.md rows are measurements.
    *
    * Bulk-load dial: at large bucket counts, pre-partition `initial` by
    * the bucket function (`repartition(n, pmod(key, buckets))`) before
    * calling — a wide unaligned write fans every task into up to
    * `buckets` partition dirs (10³ tasks × 10⁵ dirs is the classic
    * dynamic-partition-write explosion: open-writer memory and
    * tasks×buckets tiny files). Aligned, each bucket lands in one task =
    * one file. The ROUND path doesn't need it: a fresh batch's write
    * fans out only into its touched buckets. */
  def upsertIncrementalRounds(
      spark: SparkSession, tablePath: String,
      initial: DataFrame, freshRounds: Seq[DataFrame], key: String,
      overwriteCols: Seq[String], coalesceCols: Seq[String], keepCols: Seq[String],
      buckets: Int, hooks: IncHooks = IncHooks.none,
      retainVersions: Int = 1): Seq[IncRoundStats] = {
    val hc = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hc)
    // int, matching the type partition-discovery infers for `bucket=` dirs
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("bucket", pmod(col(key), lit(buckets)).cast("int"))
    def genPath(b: Int, g: Int) = genPathOf(table, b, g)
    fs.delete(table, true)
    labeled(spark, "merge:initial-write") {
      withBucket(initial).withColumn("gen", lit(0))
        .write.partitionBy("bucket", "gen").parquet(tablePath)
    }
    // v0 manifest: every bucket the initial write produced, at gen 0,
    // with its per-bucket stats measured at the one moment the table is
    // being created anyway (round 16 — later rounds never re-list)
    val initialBuckets = fs.listStatus(table).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt)
    val initialStats = initialBuckets.toSeq.flatMap(b =>
      statOfGenDir(fs, genPath(b, 0)).map(b -> _)).toMap
    commitManifest(fs, table, 0, initialBuckets.map(_ -> 0).toMap,
      TableMeta(schema = Some(initial.schema)), initialStats)
    freshRounds.map(fresh0 =>
      upsertRound(spark, tablePath, fresh0, key,
        overwriteCols, coalesceCols, keepCols, buckets, hooks, retainVersions))
  }

  /** One incremental round against an EXISTING manifest-committed table —
    * the resume entry point: the round number is derived from the latest
    * committed manifest (version + 1), so re-running after a crash (any
    * window) picks up exactly where the last commit left off — the retry
    * writes a FRESH atomically-claimed generation (never reusing a
    * crashed attempt's dirs), and the leftovers stay manifest-invisible
    * until the age-gated [[vacuumOrphans]] reclaims them. */
  def upsertRound(
      spark: SparkSession, tablePath: String, fresh0: DataFrame, key: String,
      overwriteCols: Seq[String], coalesceCols: Seq[String], keepCols: Seq[String],
      buckets: Int, hooks: IncHooks = IncHooks.none,
      retainVersions: Int = 1,
      autoCompactAtFiles: Option[Int] = None): IncRoundStats = {
    val hc = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hc)
    def dirBytes(p: org.apache.hadoop.fs.Path): Long = dirBytesOf(fs, p)
    def genPath(b: Int, g: Int) = genPathOf(table, b, g)
    val (version, current) = readManifest(fs, table)
    val round = version + 1
    val meta0 = readMetaAt(fs, table, version)
    val mapping = meta0.mapping
    val fresh = fresh0.withColumn("bucket",
      pmod(col(key), lit(buckets)).cast("int"))
    val touched = labeled(spark, "merge:touched-buckets") {
      fresh.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted
    }
    val existingTouched = readTable(spark, tablePath)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      .drop("bucket", "gen")
    // SCHEMA EVOLUTION: a batch may carry columns the table predates —
    // pad the existing side with typed nulls so the merge policies see
    // them (pre-evolution rows read the new column as null), and commit
    // the widened schema with this version's sidecar below
    val addedCols = (overwriteCols ++ coalesceCols)
      .filterNot(existingTouched.columns.contains)
    val existingPadded = addedCols.foldLeft(existingTouched)((df, c) =>
      df.withColumn(c, lit(null).cast(fresh0.schema(c).dataType)))
    // TYPE WIDENING (round-11 verdict #6): a batch may carry a WIDER
    // numeric type for an existing column (int → long, float → double) —
    // cast both merge sides to the wider type and commit the widened
    // schema; old generations stay narrow on disk and the parquet reader
    // upcasts them under the committed schema (verified: Spark 4's
    // vectorized reader reads int32 pages as LongType). A NARROWER batch
    // type is cast up to the table's type with no schema change.
    val widenPairs = fresh0.schema.fields.flatMap { f =>
      existingPadded.schema.find(_.name == f.name).flatMap { e =>
        widerOf(e.dataType, f.dataType).filter(_ != e.dataType).map(f.name -> _)
      }
    }.toMap
    val existingWide = widenPairs.foldLeft(existingPadded) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t)) }
    val freshTyped = existingWide.schema.fields
      .filter(f => fresh.columns.contains(f.name) && f.name != key)
      .foldLeft(fresh.drop("bucket")) { (df, f) =>
        if (df.schema(f.name).dataType == f.dataType) df
        else df.withColumn(f.name, col(f.name).cast(f.dataType)) }
    val mergedData = mergeUpsert(
      existingWide, freshTyped, key,
      overwriteCols, coalesceCols, keepCols)
    val merged = mergedData
      .withColumn("bucket", pmod(col(key), lit(buckets)).cast("int"))
    // append the merged buckets as a FRESH write-once generation —
    // committed files are never touched, and no two attempts (crashed
    // retries or concurrent writers) can ever share a gen dir; stale
    // leftovers are manifest-invisible and swept by retention
    val gen = freshGenFor(fs, table, round)
    // new generations write under PHYSICAL names (stable across renames)
    labeled(spark, "merge:merged-write") {
      toPhysical(merged, mapping).withColumn("gen", lit(gen))
        .write.mode("append").partitionBy("bucket", "gen").parquet(tablePath)
    }
    // one listStatus per TOUCHED bucket prices this round's stats — the
    // same listings the old `rewritten` accounting already paid; the
    // values ride the manifest so no later operation re-lists (round 16)
    val newStats: Map[Int, BucketStat] = touched.flatMap(b =>
      statOfGenDir(fs, genPath(b, gen)).map(b -> _)).toMap
    val rewritten = newStats.values.map(_.bytes).sum
    // maintain the skipping sidecars for the NEW generation only (verdict
    // r13 #5 — point/range reads stay pruned between clustered rewrites);
    // gen labels are write-once per attempt, so fragment writes are
    // race-free even before the commit decides
    val fragInfo = labeled(spark, "merge:gen-fragments") {
      writeGenFragments(spark, tablePath, table, gen,
        touched.filter(newStats.contains).map(b => genPath(b, gen).toString),
        meta0)
    }
    hooks.beforeCommit(round)
    // carry-over gens a pre-round-15 writer committed get their #frag
    // lines recorded in this round's manifest (round-16: migration is
    // automatic at the next write, not a manual refreshFragments call);
    // same for carried buckets a pre-round-16 manifest committed without
    // per-bucket stats — measured once here, recorded forever
    val adopted = labeled(spark, "merge:adopt-legacy") {
      adoptLegacyFrags(spark, fs, table, current, meta0.frags)
    }
    val stats0 = readBucketStatsAt(fs, table, version)
    val adoptedStats = adoptLegacyBucketStats(fs, table,
      current.filter { case (b, _) => !touched.contains(b) }, stats0)
    val meta = meta0.copy(schema = Some(mergedData.schema),
      frags = meta0.frags ++ adopted ++ fragInfo.map(gen -> _))
    val (committedVersion, committed, statsAll) = commitWithRetry(fs, table,
      round, current, touched.map(_ -> gen).toMap, meta,
      carriedStats = stats0 ++ adoptedStats, newStats = newStats,
      adoptedStats = adoptedStats)
    hooks.afterCommit(committedVersion)
    sweepRetention(fs, table, committedVersion, retainVersions, meta.takedownGrace)
    // manifest-served; a bucket only a stats-less legacy writer committed
    // (possible across a mixed-version race) falls back to one listing
    val tableBytes = committed.map { case (b, g) =>
      statsAll.get(b).map(_.bytes).getOrElse(dirBytes(genPath(b, g))) }.sum
    // AUTO-COMPACT (round 16 — Delta's auto-OPTIMIZE, the policy the
    // manifest stats make free): the dial decision reads the stats map
    // this commit just produced — ZERO FS calls when every bucket is
    // under the dial, which is the steady state — and only dial-crossing
    // offenders are rewritten (selection via onlyAboveFiles, target 1
    // file). A wide-shuffle round can leave a bucket holding one file
    // per shuffle partition; unbounded, that is the small-file problem
    // every read pays per-file open cost for. With the dial, files per
    // bucket are a table POLICY, not an accident of write width.
    autoCompactAtFiles.foreach { dial =>
      if (statsAll.values.exists(_.files > dial))
        // BEST-EFFORT (ADVICE r16 #1): the round above already committed —
        // a conflict here (another writer rewrote the offender bucket
        // while the policy rewrite ran; disjoint-bucket winners are merged
        // inside compact's own retry) must not surface as a failed round.
        // The dial re-checks at the next write, so nothing is lost.
        try compact(spark, tablePath, targetFiles = 1,
          retainVersions = retainVersions, onlyAboveFiles = Some(dial),
          hooks = hooks)
        catch { case _: VersionConflictException => () }
    }
    IncRoundStats(committedVersion, touched.length, buckets, rewritten, tableBytes)
  }

  /** Retention sweep (post-commit; a crash here only leaves stale dirs
    * the reader already ignores): keep every generation referenced by one
    * of the `retainVersions` newest manifests — those versions stay
    * time-travel-readable via [[readTableAt]] — and delete everything
    * else (replaced generations AND crashed-attempt leftovers), plus the
    * expired manifests themselves. retainVersions=1 is the plain-GC
    * behavior; the sweep is O(buckets) driver fs calls, the same order as
    * the manifest write. At 100 TB this is a lake format's VACUUM with a
    * version-count retention policy. */
  private def sweepRetention(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      round: Int, retainVersions: Int,
      takedownGrace: Option[Int] = None): Unit = {
    // the takedown-grace policy clamps retention table-wide (verdict r13
    // #7): any retained version may hold rows a later delete took down,
    // so the compliance bound "a takedown is physical after at most G
    // versions" is exactly "never retain more than G+1 versions"
    val effectiveRetain = takedownGrace
      .fold(retainVersions)(g =>
        math.min(retainVersions.toLong, g.toLong + 1L).toInt)
    val keepFrom = math.max(0, round - effectiveRetain + 1)
    val onDisk = committedVersions(fs, table)
    // live: referenced by a manifest inside the retention window — NO
    // upper bound, so a concurrent writer's already-committed newer
    // version is never treated as expired by a slower writer's sweep
    val live: Set[(Int, Int)] = onDisk.filter(_ >= keepFrom)
      .flatMap(v => readManifestAt(fs, table, v).toSeq).toSet
    // dead: referenced by SOME on-disk manifest but by no retained one.
    // Only provably-dead generations are deleted here — a gen dir no
    // manifest has ever named may be an in-flight concurrent writer's
    // not-yet-committed data (the round-13 two-writer race made this
    // concrete); such orphans are reclaimed by [[vacuumOrphans]] under an
    // age gate instead, exactly Delta VACUUM's uncommitted-file rule.
    // The dead set is computed FROM THE MANIFESTS (driver memory) and its
    // paths deleted directly — round 14 removed the per-bucket directory
    // walk this used to do, which was O(buckets) driver fs listings per
    // commit (the DeleteScale ×100 caveat: at 10⁵ buckets the walk, not
    // the data, was the sweep's cost); now the sweep is O(dead entries).
    val referenced: Set[(Int, Int)] = onDisk
      .flatMap(v => readManifestAt(fs, table, v).toSeq).toSet
    (referenced -- live).foreach { case (b, g) =>
      fs.delete(genPathOf(table, b, g), true) }
    fs.listStatus(manifestDir(table)).map(_.getPath)
      .filter(p => p.getName.startsWith("manifest-v") &&
        p.getName.stripPrefix("manifest-v").toInt < keepFrom)
      .foreach(p => fs.delete(p, false))
    // skipping-sidecar FRAGMENTS are per-generation; one expires exactly
    // when its generation does (referenced by some on-disk manifest but by
    // no retained one — never-referenced fragments belong to in-flight
    // writers and go through vacuumOrphans' age gate)
    val liveGens = live.map(_._2)
    val referencedGens = referenced.map(_._2)
    fragmentGens(fs, table)
      .filter { case (_, g) => referencedGens.contains(g) && !liveGens.contains(g) }
      .foreach { case (p, _) => fs.delete(p, true) }
    // legacy (pre-format-2) per-version sidecar FILES expire with their
    // manifests, same as before the metadata moved into the manifest
    Seq("stats-v", "bloom-v", "schema-v", "mapping-v").foreach { prefix =>
      fs.listStatus(manifestDir(table)).map(_.getPath)
        .filter(p => p.getName.startsWith(prefix) &&
          p.getName.stripPrefix(prefix).toInt < keepFrom)
        .foreach(p => fs.delete(p, true))
    }
  }

  /** Every skipping-sidecar fragment under `_manifests`, with the
    * generation it describes. */
  private def fragmentGens(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path)
      : Seq[(org.apache.hadoop.fs.Path, Int)] =
    fs.listStatus(manifestDir(table)).map(_.getPath).toSeq.flatMap { p =>
      Seq("statsg-", "bloomg-", "bloomgmeta-", "genmark-")
        .find(p.getName.startsWith)
        .map(prefix => p -> p.getName.stripPrefix(prefix).toInt)
    }

  /** Reclaim ORPHANED generation dirs: dirs no on-disk manifest has ever
    * referenced (crashed writer attempts, conflict-refused rounds), older
    * than `olderThanMs`. The routine retention sweep deliberately leaves
    * these alone — a never-referenced dir is indistinguishable from an
    * in-flight concurrent writer's not-yet-committed data, so reclaiming
    * it safely needs an age gate covering the longest plausible write
    * (Delta VACUUM's uncommitted-file rule). Returns dirs deleted. */
  def vacuumOrphans(spark: SparkSession, tablePath: String,
      olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced: Set[(Int, Int)] = committedVersions(fs, table)
      .flatMap(v => readManifestAt(fs, table, v).toSeq).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    var deleted = 0
    fs.listStatus(table).filter(_.getPath.getName.startsWith("bucket="))
      .foreach { bs =>
        val b = bs.getPath.getName.stripPrefix("bucket=").toInt
        fs.listStatus(bs.getPath).filter(_.getPath.getName.startsWith("gen="))
          .foreach { gs =>
            val g = gs.getPath.getName.stripPrefix("gen=").toInt
            if (!referenced.contains((b, g)) && gs.getModificationTime < cutoff) {
              fs.delete(gs.getPath, true); deleted += 1
            }
          }
      }
    // orphaned skipping-sidecar fragments (a conflict-refused or crashed
    // writer's gen never got referenced) age out with their gens
    val referencedGens = referenced.map(_._2)
    fragmentGens(fs, table).foreach { case (p, g) =>
      if (!referencedGens.contains(g) &&
          fs.getFileStatus(p).getModificationTime < cutoff) {
        fs.delete(p, true); deleted += 1
      }
    }
    // ManifestIo temp files a crashed commit attempt left behind (a
    // decided claim deletes its temp on both the win and lose paths, so
    // an aged `.tmp-` is always a crash leftover — round-14 ADVICE #4)
    fs.listStatus(manifestDir(table)).map(_.getPath)
      .filter(_.getName.startsWith(".tmp-"))
      .foreach { p =>
        if (fs.getFileStatus(p).getModificationTime < cutoff) {
          fs.delete(p, false); deleted += 1
        }
      }
    deleted
  }

  /** Per-delete accounting of [[deleteWhere]] — rewritten vs table bytes
    * is the evidence for "a takedown prices its touched buckets, not the
    * table" (the DeleteScale replay's axis). */
  final case class DeleteStats(
      version: Int, touchedBuckets: Int, deletedRows: Long,
      rewrittenBytes: Long = 0L, tableBytes: Long = 0L)

  /** ROW-LEVEL DELETE (round-12 verdict, next-round #1): remove every row
    * matching `predicate`, as a copy-on-write rewrite of ONLY the buckets
    * holding matching rows, committed as a normal manifest version — the
    * operation the lake could not express (the reference's own prune
    * removes games and their orphan embeddings —
    * reference: src/lib/commands/pruneGames.ts:200-249 — and a
    * training-data lake legally requires takedown / right-to-be-forgotten
    * deletes).
    *
    * Semantics: a row is deleted iff the predicate is TRUE for it (NULL
    * keeps the row — SQL DELETE's three-valued rule). A bucket whose rows
    * are all deleted drops out of the manifest entirely. A predicate
    * matching nothing burns no version (compact's no-op convention).
    *
    * Downstream contracts fall out of the manifest design:
    *   - TIME TRAVEL: pre-delete versions read complete until retention
    *     expires them; after that the deleted rows' generations are
    *     VACUUMed off disk — the point where a takedown becomes physical
    *     (MergeSpec pins both sides);
    *   - CDC: [[readChanges]] across a delete version emits `op = delete`
    *     rows with null post-images and (under `withPreimage`) full
    *     preimages — what the maintainer tier needs to cascade the
    *     takedown with zero state scans;
    *   - IVM: [[ivmDeltaAgg]] subtracts the deleted rows' contribution
    *     (−1 row, −f(pre)) from maintained views.
    *
    * Scale shape: one predicate scan to NAME the touched buckets (at
    * 100 TB this scan is itself file-skippable when the predicate ranges
    * a clustered column — the stats sidecars apply), then a rewrite of
    * only those buckets. A 10³-row takedown against a 10⁵-bucket table
    * rewrites ≈ the touched thousandth of the data. The commit goes
    * through the same optimistic-concurrency path as merge rounds. */
  def deleteWhere(spark: SparkSession, tablePath: String, predicate: Column,
      retainVersions: Int = 1,
      takedownGraceVersions: Int = Int.MaxValue,
      hooks: IncHooks = IncHooks.none,
      autoCompactAtFiles: Option[Int] = None): DeleteStats = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, current) = readManifest(fsys, table)
    val meta0 = readMetaAt(fsys, table, version)
    // TRUE deletes; NULL keeps (coalesce pins the three-valued boundary)
    val delPred = coalesce(predicate, lit(false))
    val hit = loadState(spark, tablePath, current, meta0.schema, meta0.mapping)
      .filter(delPred)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    deleteCommit(spark, tablePath, table, fsys, version, current, meta0,
      delPred, hit, retainVersions, takedownGraceVersions, hooks,
      autoCompactAtFiles)
  }

  /** KEY-BASED TAKEDOWN — [[deleteWhere]] specialized to
    * `column IN (values)`, the shape takedown requests actually have,
    * with the FIND phase served through the Bloom fragments: instead of
    * scanning the whole table to name the touched buckets (the
    * DeleteScale-measured `del_s` growth at ×100 — the scan, not the
    * rewrite, was the growing term), [[pointProbe]] opens only the files
    * whose filter fires. No false negatives means the candidate set
    * provably covers every matching row; tables without fragments fall
    * back to the plain predicate scan — pruning is an optimization,
    * never a correctness dependency. The rewrite and commit are
    * [[deleteWhere]]'s exactly (strict OCC, grace policy, fragments for
    * the new generation). */
  def deleteKeys(spark: SparkSession, tablePath: String, column: String,
      values: Seq[Long], retainVersions: Int = 1,
      takedownGraceVersions: Int = Int.MaxValue,
      hooks: IncHooks = IncHooks.none,
      autoCompactAtFiles: Option[Int] = None): DeleteStats = {
    require(values.nonEmpty, "deleteKeys needs at least one value")
    deleteKeysCore(spark, tablePath,
      col(column).isin(values.map(java.lang.Long.valueOf): _*),
      () => pointProbe(spark, tablePath, column, values),
      retainVersions, takedownGraceVersions, hooks, autoCompactAtFiles)
  }

  /** [[deleteKeys]] for STRING keys (round 16): takedown requests are as
    * often URL / content-hash / domain shaped as numeric-id shaped; the
    * find phase rides the same Bloom fragments (built over the column's
    * native values) through [[pointProbeStrings]], and the rewrite/commit
    * tail is [[deleteKeys]]'s exactly. */
  def deleteKeysStrings(spark: SparkSession, tablePath: String, column: String,
      values: Seq[String], retainVersions: Int = 1,
      takedownGraceVersions: Int = Int.MaxValue,
      hooks: IncHooks = IncHooks.none,
      autoCompactAtFiles: Option[Int] = None): DeleteStats = {
    require(values.nonEmpty, "deleteKeysStrings needs at least one value")
    deleteKeysCore(spark, tablePath, col(column).isin(values: _*),
      () => pointProbeStrings(spark, tablePath, column, values),
      retainVersions, takedownGraceVersions, hooks, autoCompactAtFiles)
  }

  private def deleteKeysCore(spark: SparkSession, tablePath: String,
      pred: Column, probe: () => PointProbeReport, retainVersions: Int,
      takedownGraceVersions: Int, hooks: IncHooks,
      autoCompactAtFiles: Option[Int] = None): DeleteStats = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, current) = readManifest(fsys, table)
    val meta0 = readMetaAt(fsys, table, version)
    val delPred = coalesce(pred, lit(false))
    val report = probe()
    val hit: Map[Int, Long] =
      if (report.prunedGens == 0)
        // no usable fragments anywhere: the plain predicate scan
        loadState(spark, tablePath, current, meta0.schema, meta0.mapping)
          .filter(delPred).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      else if (report.relPaths.isEmpty) Map.empty
      else {
        val direct = spark.read.option("basePath", tablePath)
          .parquet(report.relPaths.map(rel => s"$tablePath/$rel"): _*)
        meta0.mapping.foldLeft(direct) { case (d, (logical, physical)) =>
          if (logical != physical && d.columns.contains(physical))
            d.withColumnRenamed(physical, logical)
          else d
        }.filter(delPred)
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      }
    deleteCommit(spark, tablePath, table, fsys, version, current, meta0,
      delPred, hit, retainVersions, takedownGraceVersions, hooks,
      autoCompactAtFiles)
  }

  /** The shared rewrite-and-commit tail of both delete entry points:
    * copy-on-write of exactly the buckets in `hit`, strict-OCC commit,
    * grace-clamped retention sweep. */
  private def deleteCommit(spark: SparkSession, tablePath: String,
      table: org.apache.hadoop.fs.Path, fs: org.apache.hadoop.fs.FileSystem,
      version: Int, current: Map[Int, Int], meta0: TableMeta,
      delPred: Column, hit: Map[Int, Long], retainVersions: Int,
      takedownGraceVersions: Int, hooks: IncHooks,
      autoCompactAtFiles: Option[Int] = None): DeleteStats = {
    if (hit.isEmpty) return DeleteStats(version, 0, 0L)
    val round = version + 1
    val schema = meta0.schema
    val mapping = meta0.mapping
    val touched = hit.keys.toSeq.sorted
    val deletedRows = hit.values.sum
    val touchedEntries = current.filter { case (b, _) => touched.contains(b) }
    val gen = freshGenFor(fs, table, round)
    toPhysical(
      loadState(spark, tablePath, touchedEntries, schema, mapping)
        .filter(!delPred).drop("gen").withColumn("gen", lit(gen)), mapping)
      .write.mode("append").partitionBy("bucket", "gen").parquet(tablePath)
    // a fully-deleted bucket writes no dir and leaves the manifest; the
    // presence check and the stats measurement are the same one listing
    val newStats: Map[Int, BucketStat] = touched.flatMap(b =>
      statOfGenDir(fs, genPathOf(table, b, gen)).map(b -> _)).toMap
    val present = touched.filter(newStats.contains)
    val rewritten = newStats.values.map(_.bytes).sum
    val fragInfo = writeGenFragments(spark, tablePath, table, gen,
      present.map(b => genPathOf(table, b, gen).toString), meta0)
    val dataSchema = org.apache.spark.sql.types.StructType(
      loadState(spark, tablePath, touchedEntries, schema, mapping)
        .drop("bucket", "gen").schema.fields)
    // the grace policy persists in the manifest once set, so every later
    // writer's retention sweep honors it (verdict r13 #7)
    val grace =
      if (takedownGraceVersions == Int.MaxValue) meta0.takedownGrace
      else Some(meta0.takedownGrace.fold(takedownGraceVersions)(
        math.min(_, takedownGraceVersions)))
    val meta = meta0.copy(schema = Some(schema.getOrElse(dataSchema)),
      takedownGrace = grace,
      frags = meta0.frags ++
        adoptLegacyFrags(spark, fs, table, current, meta0.frags) ++
        fragInfo.map(gen -> _))
    hooks.beforeCommit(round)
    val stats0 = readBucketStatsAt(fs, table, version)
    val adoptedStats = adoptLegacyBucketStats(fs, table,
      current.filter { case (b, _) => !touched.contains(b) }, stats0)
    // strict: a predicate delete's read set is the whole table (ADVICE
    // r13 #3) — any concurrent bucket change conflicts, never auto-merged
    val (committedVersion, committed, statsAll) = commitWithRetry(fs, table,
      round, current, present.map(_ -> gen).toMap, meta,
      removedBuckets = touched.filterNot(present.contains),
      strict = true,
      carriedStats = stats0 ++ adoptedStats, newStats = newStats,
      adoptedStats = adoptedStats)
    hooks.afterCommit(committedVersion)
    sweepRetention(fs, table, committedVersion, retainVersions, meta.takedownGrace)
    val tableBytes = committed.map { case (b, g) =>
      statsAll.get(b).map(_.bytes)
        .getOrElse(dirBytesOf(fs, genPathOf(table, b, g))) }.sum
    // same dial as upsertRound's (round 16): the delete's rewrite reads
    // the touched buckets' prior files whole, so its write width is the
    // READ's partition count — a wide bucket stays wide across takedowns
    // without the policy; the decision is the same zero-FS-call check on
    // the stats map this commit produced
    autoCompactAtFiles.foreach { dial =>
      if (statsAll.values.exists(_.files > dial))
        // best-effort like the merge side's — the delete IS committed
        try compact(spark, tablePath, targetFiles = 1,
          retainVersions = retainVersions, onlyAboveFiles = Some(dial),
          hooks = hooks)
        catch { case _: VersionConflictException => () }
    }
    DeleteStats(committedVersion, touched.length, deletedRows, rewritten, tableBytes)
  }

  /** Per-bucket accounting of [[compact]] — files before/after, so the
    * small-file claim is a measurement. `statListings` counts the
    * per-bucket listStatus fallbacks the PLANNING phase paid: 0 on a
    * table whose manifest carries per-bucket stats (round 16 — planning
    * is a driver-memory read), one per bucket a pre-round-16 writer
    * committed without them (measured once, recorded at this commit). */
  final case class CompactStats(
      version: Int, buckets: Int, filesBefore: Long, filesAfter: Long,
      statListings: Long = 0L)

  /** OPTIMIZE / small-file compaction: rewrite every committed bucket
    * whose gen dir holds more than `targetFiles` data files into a single
    * new-generation file, and commit the result as a NEW manifest version.
    * Contents are untouched — compaction is a pure layout change, which is
    * exactly what the hash gate on `j1_merge_compact` proves (same oracle
    * as the incremental merge). Buckets already at ≤ `targetFiles` keep
    * their generation (their manifest entry is carried over unchanged), so
    * repeated compaction is a no-op — and crash-safe for free: the new
    * files land as an uncommitted generation until the one-file manifest
    * rename, the same commit point every merge round uses.
    *
    * Why it matters at 100 TB: each incremental round appends a
    * shuffle-partition's worth of files per touched bucket; after 10⁴
    * rounds a hot bucket holds 10⁴ small files and every read pays the
    * per-file open cost. Periodic compaction bounds files-per-bucket
    * without ever blocking readers (old versions stay readable through
    * retention). The rewrite is per-bucket parallel Spark work — one
    * partition-pruned read + one single-file write per oversized bucket. */
  def compact(spark: SparkSession, tablePath: String,
      targetFiles: Int = 1, retainVersions: Int = 1,
      onlyAboveFiles: Option[Int] = None,
      hooks: IncHooks = IncHooks.none): CompactStats = {
    val hc = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hc)
    def genPath(b: Int, g: Int) = genPathOf(table, b, g)
    val (version, current) = readManifest(fs, table)
    val round = version + 1
    // PLANNING is a manifest read (round 16): per-bucket file counts ride
    // the bucket lines, so naming the oversized buckets costs zero FS
    // calls on a stats-bearing table; buckets a pre-round-16 writer
    // committed without stats are measured once here and recorded at this
    // commit (the same one-write-round migration as fragment adoption)
    val stats0 = readBucketStatsAt(fs, table, version)
    val measured = scala.collection.mutable.Map.empty[Int, BucketStat]
    def statOf(b: Int, g: Int): BucketStat =
      stats0.getOrElse(b, measured.getOrElseUpdate(b,
        statOfGenDir(fs, genPath(b, g)).getOrElse(BucketStat(0L, 0L))))
    // onlyAboveFiles decouples the SELECTION dial from the rewrite
    // target: the auto-compact policy rewrites only dial-crossing
    // offenders, but rewrites them all the way down to `targetFiles`
    val threshold = onlyAboveFiles.getOrElse(targetFiles)
    val oversized = current.filter { case (b, g) => statOf(b, g).files > threshold }
    val filesBefore = current.map { case (b, g) => statOf(b, g).files }.sum
    if (oversized.isEmpty) // already compact — don't burn a version
      return CompactStats(version, 0, filesBefore, filesBefore, measured.size.toLong)
    val gen = freshGenFor(fs, table, round)
    labeled(spark, "compact:rewrite") {
      oversized.toSeq.sorted.foreach { case (b, g) =>
        spark.read.option("basePath", tablePath).parquet(s"$tablePath/bucket=$b/gen=$g")
          .drop("bucket", "gen").coalesce(targetFiles)
          .write.parquet(genPath(b, gen).toString)
      }
    }
    val newStats: Map[Int, BucketStat] = oversized.keys.toSeq.flatMap(b =>
      statOfGenDir(fs, genPath(b, gen)).map(b -> _)).toMap
    // layout-only version: schema, mapping, and sidecar policy carry
    // forward unchanged; the compacted generation gets fresh fragments so
    // skipping reads stay pruned across an OPTIMIZE
    val meta0 = readMetaAt(fs, table, version)
    val fragInfo = writeGenFragments(spark, tablePath, table, gen,
      oversized.keys.toSeq.sorted.map(b => genPath(b, gen).toString), meta0)
    val meta = meta0.copy(frags = meta0.frags ++
      adoptLegacyFrags(spark, fs, table, current, meta0.frags) ++
      fragInfo.map(gen -> _))
    // OCC with benign-retry (ADVICE r16 #1): a concurrent DISJOINT-bucket
    // writer landing between this planning read and the commit is merged
    // like any merge round's — compaction only claims the buckets it
    // rewrote. A winner that rewrote one of the OVERSIZED buckets is a
    // real conflict (this rewrite's input is stale) and still throws.
    hooks.beforeCommit(round)
    val (committedVersion, committedAll, statsAll) = commitWithRetry(fs, table,
      round, current, oversized.keys.map(_ -> gen).toMap, meta,
      carriedStats = stats0 ++ measured, newStats = newStats,
      adoptedStats = measured.toMap)
    sweepRetention(fs, table, committedVersion, retainVersions, meta.takedownGrace)
    // keysIterator, NOT keys.map — a Set would dedup equal counts
    val filesAfter = committedAll.keysIterator.map(b =>
      statsAll.get(b).map(_.files).getOrElse(0L)).sum
    CompactStats(committedVersion, oversized.size, filesBefore, filesAfter,
      measured.size.toLong)
  }

  /** OPTIMIZE-with-clustering (the ZORDER analogue for one dimension):
    * rewrite EVERY committed bucket with its rows range-split across
    * `filesPerBucket` files by `clusterCol`, and record a per-FILE
    * min/max sidecar (`_manifests/stats-v<version>`) alongside the new
    * manifest — Delta's add-file stats. Content is untouched (pure layout
    * + metadata change, so `j1_merge_skipping` shares the merge oracle's
    * row set), but reads carrying a `clusterCol` range predicate can now
    * SKIP files whose [min, max] misses the range ([[readTableWhere]])
    * without opening them — at 100 TB even the parquet FOOTER reads of a
    * full listing are expensive, and file-level stats prune before any
    * I/O. The bucket function stays on the merge key (rows never leave
    * their bucket — the merge invariant), so clustering is strictly
    * within-bucket: the range shuffle is one `repartitionByRange` on
    * (bucket, clusterCol), and the stats pass is one extra scan of the
    * rewritten bytes — the price every stats-collecting lake writer pays
    * at write time to save it on every read. Stats rows number
    * buckets × filesPerBucket (4·10⁵ at a 10⁵-bucket table — a few MB,
    * the same driver order as the manifest itself). */
  def cluster(spark: SparkSession, tablePath: String, clusterCol: String,
      filesPerBucket: Int = 4, retainVersions: Int = 1,
      bloomCols: Seq[String] = Seq.empty): CompactStats =
    clusterRewrite(spark, tablePath, Seq(col(clusterCol)), Seq(clusterCol),
      filesPerBucket, retainVersions, bloomCols)

  /** Z-ORDER (multi-column) clustering: rewrite every bucket with its rows
    * range-split by the INTERLEAVED-BITS key of `zCols` — each NUMERIC
    * column is normalized to [[ZBits]] bits against its global [min, max],
    * each STRING column is RANK-normalized against sampled
    * equal-frequency cut points (round 17 — [[StringRankBucket]];
    * min/max arithmetic is meaningless on a lexicographic domain), and
    * the bits interleaved, so files become hyper-rectangles in the
    * z-curve's locality order and a predicate on ANY clustered column
    * prunes (one-dimension clustering only prunes its own column; a
    * second predicate scans everything). Same manifest-committed
    * layout-only rewrite as [[cluster]] — `j1_merge_skipping_z` shares
    * the merge oracle with a two-predicate WHERE. The per-file sidecar
    * records min/max for every `zCols` member; [[readTableWhereAll]]
    * prunes on their conjunction. Cost = one range-normalization agg
    * (k columns' global min/max, one row) + the same one-shuffle rewrite
    * and stats pass as one-dimension clustering. */
  def clusterZ(spark: SparkSession, tablePath: String, zCols: Seq[String],
      filesPerBucket: Int = 4, retainVersions: Int = 1,
      bloomCols: Seq[String] = Seq.empty): CompactStats = {
    require(zCols.nonEmpty, "clusterZ needs at least one column")
    val current = readTable(spark, tablePath)
    // STRING dimensions (round 17, verdict r16 #2): rank-normalized
    // against sampled equal-frequency cut points instead of min/max
    // arithmetic — a string domain has no usable span (URL/domain values
    // cluster in a hair-thin lexicographic band), but its RANK is
    // uniform by construction. Round 16 made the READ side string-typed
    // (readTableWhereStrings / pointProbeStrings); this closes the
    // write side: a table can now be Z-LAID-OUT for the takedown-shaped
    // string predicates it already knows how to prune.
    val isStr = zCols.map(c =>
      c -> (current.schema(c).dataType ==
        org.apache.spark.sql.types.StringType)).toMap
    val numCols = zCols.filterNot(isStr)
    val strCols = zCols.filter(isStr)
    // one agg row prices ALL dimensions' statistics: numeric global
    // [min, max] plus each string column's non-null count (the sampling
    // fraction's denominator)
    val aggs = numCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c"))) ++
      strCols.map(c => count(col(c)).as(s"cnt_$c"))
    val ranges = current.agg(aggs.head, aggs.tail: _*).head()
    val cutsByCol: Map[String, Array[org.apache.spark.unsafe.types.UTF8String]] =
      strCols.map(c => c ->
        sampleStringCuts(current, c, ranges.getAs[Long](s"cnt_$c"))).toMap
    val zkey = zInterleave(zCols.map { c =>
      if (isStr(c)) {
        val cuts = cutsByCol(c)
        // rank ∈ [0, cuts.length] scaled onto the 16-bit lattice with
        // monotone integer math (floor division preserves order)
        val cells = math.max(cuts.length.toLong, 1L)
        graft.functions.StringRankBucket.rank(col(c), cuts).cast("long") *
          lit(((1L << ZBits) - 1) / cells)
      } else {
        val lo = ranges.getAs[Double](s"min_$c")
        val hi = ranges.getAs[Double](s"max_$c")
        zScaleNumeric(col(c), lo, hi)
      }
    })
    clusterRewrite(spark, tablePath, Seq(zkey), zCols, filesPerBucket,
      retainVersions, bloomCols)
  }

  /** Bits per column in the z-key — 16 gives 65k distinct cells per
    * dimension, far below any file count this layout produces, so the
    * quantization never limits pruning. */
  private val ZBits = 16

  /** Equal-frequency cells per STRING z-dimension: 4096 (12 effective
    * bits, spread over the 16-bit lattice) — still orders of magnitude
    * above files-per-bucket, so quantization never limits pruning, while
    * each cut point is estimated from ~32 sampled values. */
  private val ZStrCells = 4096
  private val ZStrSampleTarget = 131072L

  /** Sampled equal-frequency cut points for one string column — the
    * statistic `repartitionByRange` itself draws, made explicit so the
    * rank lands inside the interleaved key. Bounded driver state: ≤
    * [[ZStrSampleTarget]] sampled values, ≤ [[ZStrCells]]−1 cuts kept.
    * Sorting happens on [[org.apache.spark.unsafe.types.UTF8String]]
    * (binary UTF8 — Spark's string ordering and the fragment stats'),
    * NOT java.lang.String's UTF-16 order, which diverges on
    * supplementary characters. Sampling is seed-pinned; the cut set
    * affects LAYOUT only, never content. */
  private def sampleStringCuts(df: DataFrame, c: String, nonNull: Long)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    import org.apache.spark.unsafe.types.UTF8String
    if (nonNull <= 0L) return Array.empty
    val fraction = math.min(1.0, ZStrSampleTarget.toDouble / nonNull)
    val sampled = df.select(col(c)).where(col(c).isNotNull)
      .sample(withReplacement = false, fraction, seed = 0x5eedL)
      .collect().map(r => UTF8String.fromString(r.getString(0)))
    if (sampled.isEmpty) return Array.empty
    java.util.Arrays.sort(sampled.asInstanceOf[Array[Object]])
    val k = math.min(ZStrCells.toLong, sampled.length.toLong)
    (1L until k).map(i => sampled((i * sampled.length / k).toInt))
      .distinct.toArray
  }

  /** One numeric dimension scaled to [0, 2^ZBits) against its global
    * range (nulls → 0: they sort first, and BETWEEN never matches null
    * anyway). Pure arithmetic — stays inside whole-stage codegen. */
  private def zScaleNumeric(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, 1e-12)
    least(lit((1 << ZBits) - 1), greatest(lit(0),
      ((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(span) *
        lit((1 << ZBits) - 1)).cast("long")))
  }

  /** The interleaved-bits key over k pre-scaled [0, 2^ZBits) dimensions:
    * bit i of column j lands at position i·k + j. Pure integer
    * arithmetic — stays inside whole-stage codegen. */
  private def zInterleave(scaled: Seq[Column]): Column = {
    val k = scaled.size
    (for (i <- 0 until ZBits; j <- 0 until k) yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ bitwiseOR _)
  }

  /** Shared layout-only clustered rewrite: range-split every bucket's rows
    * across `filesPerBucket` files by `sortKeys` (within-bucket — the
    * merge invariant holds), write a per-file min/max sidecar for every
    * `statCols` member, commit as a new manifest version. */
  private def clusterRewrite(spark: SparkSession, tablePath: String,
      sortKeys: Seq[Column], statCols: Seq[String],
      filesPerBucket: Int, retainVersions: Int,
      bloomCols: Seq[String] = Seq.empty): CompactStats = {
    val hc = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hc)
    def genPath(b: Int, g: Int) = genPathOf(table, b, g)
    val (version, current) = readManifest(fs, table)
    val round = version + 1
    val gen = freshGenFor(fs, table, round)
    // before-counts from the manifest's per-bucket stats; one listing per
    // legacy (stats-less) bucket only
    val stats0 = readBucketStatsAt(fs, table, version)
    var planListed = 0L
    val filesBefore = current.map { case (b, g) =>
      stats0.get(b).map(_.files).getOrElse {
        planListed += 1
        statOfGenDir(fs, genPath(b, g)).fold(0L)(_.files) } }.sum
    val meta0 = readMetaAt(fs, table, version)
    val mapping = meta0.mapping
    labeled(spark, "cluster:rewrite-write") {
      toPhysical(
        loadState(spark, tablePath, current, meta0.schema,
          mapping).drop("gen")
          .repartitionByRange(current.size * filesPerBucket,
            col("bucket") +: sortKeys: _*)
          .withColumn("gen", lit(gen)), mapping)
        .write.mode("append").partitionBy("bucket", "gen").parquet(tablePath)
    }
    val genPaths = current.keys.toSeq.sorted.map(b => s"$tablePath/bucket=$b/gen=$gen")
    // the clustered rewrite DEFINES the table's sidecar policy: these
    // columns' fragments are maintained by every later writer's new
    // generation (round-13 verdict #5 — the sidecar no longer dies at the
    // first post-cluster version), and the rewrite itself writes the
    // fragments for its own generation. A conflict-refused rewrite leaves
    // only attempt-unique fragments no manifest references — swept by the
    // age-gated vacuum, never readable (ADVICE r13 #1's second half).
    val metaPolicy = meta0.copy(statsCols = statCols, bloomCols = bloomCols)
    val fragInfo = labeled(spark, "cluster:gen-fragments") {
      writeGenFragments(spark, tablePath, table, gen, genPaths, metaPolicy)
    }
    val meta = metaPolicy.copy(frags = metaPolicy.frags ++ fragInfo.map(gen -> _))
    val committed = current.keys.map(_ -> gen).toMap
    // a full rewrite measures every bucket it just wrote (∝ the change —
    // it IS the whole table here) and records the stats at the commit
    val newStats: Map[Int, BucketStat] = committed.keys.toSeq.flatMap(b =>
      statOfGenDir(fs, genPath(b, gen)).map(b -> _)).toMap
    commitManifest(fs, table, round, committed, meta, newStats)
    sweepRetention(fs, table, round, retainVersions, meta.takedownGrace)
    val filesAfter = newStats.values.map(_.files).sum
    CompactStats(round, committed.size, filesBefore, filesAfter, planListed)
  }

  // -------------------------------------------------------------------
  // SKIPPING-SIDECAR FRAGMENTS (round-14): min/max stats and Bloom
  // filters are written PER GENERATION (`_manifests/statsg-<gen>`,
  // `bloomg-<gen>`), not per version. Two structural wins over the
  // round-13 per-version sidecars:
  //   - CONCURRENCY-SAFE BY CONSTRUCTION: gen labels are write-once per
  //     attempt, so no two writers can ever collide on a fragment name —
  //     the ADVICE r13 #1 race (a losing clusterRewrite's sidecar
  //     describing uncommitted files, readable at the winner's version)
  //     cannot exist.
  //   - INCREMENTAL MAINTENANCE (round-13 verdict #5): a merge round,
  //     delete, or compaction writes fragments for ITS new generation
  //     only (cost ∝ the change), and a read prunes per generation —
  //     files in a generation without fragments are simply kept
  //     (pruning degrades gracefully instead of dying table-wide at the
  //     first post-cluster version).
  // Fragments store TABLE-RELATIVE file paths (ADVICE r11 #2) and every
  // kept file is validated against the manifest's (bucket, gen) entries
  // before any I/O — a fragment can never route a read to a file the
  // committed version does not own.
  //
  // LEGACY NOTE (ADVICE r14 #3): pre-round-14 tables carry per-VERSION
  // `stats-v`/`bloom-v` sidecars that no reader consults anymore — those
  // tables read correctly but unpruned until either a clusterRewrite or
  // (cheaper — no data rewrite) one [[refreshFragments]] call backfills
  // per-generation fragments. Round-14 tables' on-disk fragments keep
  // working through the FS-probe fallback, and refreshFragments adopts
  // them into the manifest so reads stop paying the per-gen probes.
  // -------------------------------------------------------------------

  private def fragStatsPath(table: org.apache.hadoop.fs.Path, gen: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(table), s"statsg-$gen")
  private def fragBloomPath(table: org.apache.hadoop.fs.Path, gen: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(table), s"bloomg-$gen")
  private def fragBloomMetaPath(table: org.apache.hadoop.fs.Path, gen: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(table), s"bloomgmeta-$gen")

  /** Write the stats and/or Bloom fragments for one freshly-written
    * generation (no-op when the table has no sidecar policy). One read of
    * the new generation's files feeds both aggregations — the write-time
    * price of read-time skipping, now priced ∝ the generation instead of
    * the table. Returns the generation's [[FragInfo]] for the caller to
    * embed in its manifest commit (round-15: reads learn fragment layout
    * from the manifest, not per-gen FS probes). */
  private def writeGenFragments(spark: SparkSession, tablePath: String,
      table: org.apache.hadoop.fs.Path, gen: Int, genPaths: Seq[String],
      meta: TableMeta): Option[FragInfo] = {
    if (genPaths.isEmpty || (meta.statsCols.isEmpty && meta.bloomCols.isEmpty))
      return None
    def phys(c: String) = meta.mapping.getOrElse(c, c)
    val data = spark.read.option("basePath", tablePath).parquet(genPaths: _*)
    def fileKey = regexp_extract(input_file_name(), "bucket=.*$", 0).as("file")
    if (meta.statsCols.nonEmpty) {
      val aggs = meta.statsCols.flatMap(c =>
        Seq(min(col(phys(c))).as(s"min_$c"), max(col(phys(c))).as(s"max_$c")))
      // one row per file of THIS generation — manifest-order small
      labeled(spark, "frag:stats-write") {
        data.groupBy(fileKey).agg(aggs.head, aggs.tail: _*)
          .coalesce(1)
          .write.mode("overwrite").parquet(fragStatsPath(table, gen).toString)
      }
    }
    if (meta.bloomCols.isEmpty)
      Some(FragInfo(meta.statsCols, 0L, Seq.empty))
    else {
      val counts = labeled(spark, "frag:bloom-count") {
        data.groupBy(fileKey).agg(count(lit(1)).as("n"))
          .agg(max(col("n")).as("mx"), sum(col("n")).as("total")).head()
      }
      val maxRows = counts.getLong(0)
      val totalRows = counts.getLong(1)
      var m = 64L
      while (m < BloomBitsPerRow * maxRows) m <<= 1
      // sharded write (round-13 verdict #1's write-side nit): range
      // partitioning on (col, word_idx) + within-partition sort means a
      // point read's `word_idx IN (probes)` scan prunes whole files and
      // row groups; partition count scales with the fragment's rows
      val parts = math.max(1L, math.min(512L, totalRows / 4 / 1000000L)).toInt
      labeled(spark, "frag:bloom-write") {
        meta.bloomCols.map { lc =>
          data.select(fileKey, col(phys(lc)).as("v")).where(col("v").isNotNull)
            .select(col("file"), explode(array((0 until BloomHashes).map(i =>
              pmod(xxhash64(col("v"), lit(i)), lit(m))): _*)).as("pos"))
            .groupBy(col("file"), (col("pos") / 64).cast("long").as("word_idx"))
            .agg(expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").as("bits"))
            .select(col("file"), lit(lc).as("col"), col("word_idx"), col("bits"))
        }.reduce(_ unionByName _)
          .repartitionByRange(parts, col("col"), col("word_idx"))
          .sortWithinPartitions(col("col"), col("word_idx"))
          .write.mode("overwrite").parquet(fragBloomPath(table, gen).toString)
      }
      // fragment header (driver-readable without a Spark job): the bit
      // width and covered columns the probe needs BEFORE the heavy scan
      val out = fs(spark, table).create(fragBloomMetaPath(table, gen), true)
      try out.write(s"m=$m\ncols=${meta.bloomCols.mkString(",")}\n"
        .getBytes("UTF-8"))
      finally out.close()
      Some(FragInfo(meta.statsCols, m, meta.bloomCols))
    }
  }

  private def fs(spark: SparkSession, table: org.apache.hadoop.fs.Path) =
    table.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The generation's bloom-fragment header: (m, covered columns). */
  private def readBloomMeta(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(Long, Seq[String])] = {
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val kv = text.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('='); l.take(i) -> l.drop(i + 1)
    }.toMap
    kv.get("m").map(m => (m.trim.toLong,
      kv.get("cols").map(_.split(',').toSeq).getOrElse(Seq.empty)))
  }

  /** Parse a fragment's table-relative file path into (bucket, gen);
    * None when it is not of the expected shape. */
  private def parseRelFile(rel: String): Option[(Int, Int)] = {
    val re = "^bucket=(\\d+)/gen=(\\d+)/.+".r
    rel match {
      case re(b, g) => Some((b.toInt, g.toInt))
      case _ => None
    }
  }

  /** DATA-SKIPPING read: `clusterCol BETWEEN lo AND hi` served through the
    * current version's per-file stats sidecar — only files whose
    * [min, max] intersects the range are opened (NULL rows never match a
    * BETWEEN, so null-stats files prune too). Falls back to the plain
    * manifest read when the current version has no sidecar (any merge
    * round after the last [[cluster]] invalidates it by committing a new
    * version) — pruning is an optimization, never a correctness
    * dependency, which is exactly what lets `j1_merge_skipping` share the
    * merge CTEs' oracle with a WHERE clause. */
  def readTableWhere(spark: SparkSession, tablePath: String,
      clusterCol: String, lo: Long, hi: Long): DataFrame =
    readTableWhereAll(spark, tablePath, Seq((clusterCol, lo, hi)))

  /** The multi-predicate data-skipping read: every `(col, lo, hi)` range
    * whose column the sidecar carries stats for must intersect a file's
    * recorded [min, max] for the file to be opened; predicates on columns
    * WITHOUT stats (not in the last cluster's `statCols`) don't prune but
    * still filter — exactly a lake reader's behavior, and what makes the
    * one-dimension layout an honest control for the Z-order gate (its
    * playerCount stats prune, its universeId predicate can't). No sidecar
    * at all falls back to the plain manifest read — pruning is an
    * optimization, never a correctness dependency. */
  def readTableWhereAll(spark: SparkSession, tablePath: String,
      preds: Seq[(String, Long, Long)]): DataFrame =
    readTableWhereAllTyped(spark, tablePath,
      preds.map { case (c, lo, hi) => (c, lit(lo), lit(hi)) })

  /** STRING-typed range pruning (round-16, verdict r15 #6): the same
    * stats-fragment keep-decision with lexicographic bounds — the
    * Delta/Iceberg norm for string column stats. Sound because the
    * fragments store each file's FULL min/max value (`min(col)`/
    * `max(col)` at write time — no prefix truncation, so there is no
    * truncated-upper-bound subtlety to get wrong; a deployment that
    * later truncates long strings for sidecar size must round the upper
    * bound UP, Delta-style). Comparison collation is Spark's binary
    * UTF8 ordering on BOTH sides — the same `>=`/`<=` the data filter
    * uses, so pruning can never disagree with filtering. */
  def readTableWhereStrings(spark: SparkSession, tablePath: String,
      preds: Seq[(String, String, String)]): DataFrame =
    readTableWhereAllTyped(spark, tablePath,
      preds.map { case (c, lo, hi) => (c, lit(lo), lit(hi)) })

  /** MIXED-type skipping read (round 17): numeric and string range
    * predicates prune TOGETHER in one keep-decision — the takedown-audit
    * shape (`name BETWEEN … AND playerCount BETWEEN …`) the string-Z
    * layout exists to serve. Both families route through the same
    * unioned fragment scan; either list may be empty (degenerating to
    * the single-type faces). */
  def readTableWhereMixed(spark: SparkSession, tablePath: String,
      numPreds: Seq[(String, Long, Long)],
      strPreds: Seq[(String, String, String)]): DataFrame =
    readTableWhereAllTyped(spark, tablePath,
      numPreds.map { case (c, lo, hi) => (c, lit(lo), lit(hi)) } ++
        strPreds.map { case (c, lo, hi) => (c, lit(lo), lit(hi)) })

  /** Committed data-file count at the current version, manifest-served:
    * the per-bucket stats lines carry file counts, so the usual cost is
    * ZERO Spark jobs and zero listings (one listStatus only per
    * legacy stats-less bucket). Round 18: the skipping gates' printed
    * `files_total` used `readTable(...).inputFiles`, which built a whole
    * file index (a parallel-listing Spark job at >32 dirs) just to count
    * files the manifest already knows. */
  def tableFileCount(spark: SparkSession, tablePath: String): Long = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, state) = readManifest(fsys, table)
    val stats = readBucketStatsAt(fsys, table, version)
    state.map { case (b, g) =>
      stats.get(b).map(_.files).getOrElse(
        statOfGenDir(fsys, genPathOf(table, b, g)).fold(0L)(_.files))
    }.sum
  }

  /** The stats fragment's schema, derived from the table's committed
    * schema: `file` plus (min_c, max_c) in the generation's statsCols
    * order, each typed as its source column (round 18 — passing it skips
    * the per-read footer-inference job the bare `spark.read.parquet`
    * paid on every skipping read). */
  private def fragStatsSchema(meta: TableMeta, statsCols: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] =
    meta.schema.map { st =>
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType) +:
          statsCols.flatMap { c =>
            val dt = st(c).dataType
            Seq(org.apache.spark.sql.types.StructField(s"min_$c", dt),
              org.apache.spark.sql.types.StructField(s"max_$c", dt))
          })
    }

  private def readTableWhereAllTyped(spark: SparkSession, tablePath: String,
      preds: Seq[(String, Column, Column)]): DataFrame = {
    require(preds.nonEmpty, "readTableWhereAll needs at least one predicate")
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, state) = readManifest(fsys, table)
    val pred = preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    val meta = readMetaAt(fsys, table, version)
    def full() = loadState(spark, tablePath, state, meta.schema, meta.mapping)
      .filter(pred)
    // per-GENERATION pruning: each gen with a stats fragment contributes
    // only its intersecting files; gens without one (written before the
    // sidecar policy, or by a writer that crashed mid-fragment) keep all
    // their files — graceful degradation, never a correctness dependency.
    // Job shape (round-15, verdict r14 #8 + ADVICE #5): the per-gen
    // fragment layout comes from the manifest's #frag entries (FS probes
    // only for pre-round-15 gens), every contributing fragment joins ONE
    // unioned scan with the keep-decision EVALUATED IN THE SCAN — the
    // driver collects only surviving (gen, file) rows, never one row per
    // file, and pays one job instead of O(#gens) sequential ones (an
    // incrementally-merged table carries one surviving gen per past round
    // between compactions).
    val byGen = state.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (g, entries) => g -> entries.keys.toSeq.sorted }
    // classify each gen: Some(statPreds) = prunable through its fragment,
    // None = read whole (no fragment, or no overlap with the predicates)
    val prunable: Seq[(Int, Seq[(String, Column, Column)])] = byGen.flatMap {
      case (g, _) =>
        val fragStatsCols: Option[Seq[String]] = meta.frags.get(g) match {
          case Some(fi) => if (fi.statsCols.isEmpty) None else Some(fi.statsCols)
          case None => // pre-round-15 gen: fall back to the FS + footer
            val sp = fragStatsPath(table, g)
            if (!fsys.exists(sp)) None
            else Some(spark.read.parquet(sp.toString).columns.toSeq
              .filter(_.startsWith("min_")).map(_.stripPrefix("min_")))
        }
        val statPreds = preds.filter(p => fragStatsCols.exists(_.contains(p._1)))
        if (statPreds.isEmpty) None else Some(g -> statPreds)
    }
    // one unioned, predicate-pushed scan; only survivors reach the driver.
    // NULL stats (an all-null file) make the conjunction NULL → filtered
    // out → pruned, matching a BETWEEN's null semantics.
    val keptByGen: Map[Int, Seq[String]] =
      if (prunable.isEmpty) Map.empty
      else prunable.map { case (g, sps) =>
        val keepExpr = sps.map { case (c, lo, hi) =>
          col(s"max_$c") >= lo && col(s"min_$c") <= hi }.reduce(_ && _)
        spark.read.parquet(fragStatsPath(table, g).toString)
          .filter(keepExpr).select(lit(g).as("gen"), col("file"))
      }.reduce(_ unionByName _).collect()
        .groupBy(_.getInt(0))
        .map { case (g, rs) => g -> rs.map(_.getString(1)).toSeq }
    val prunableGens = prunable.map(_._1).toSet
    var anyPruned = false
    val relPaths: Seq[String] = byGen.flatMap { case (g, buckets) =>
      val whole = buckets.map(b => s"bucket=$b/gen=$g")
      if (!prunableGens.contains(g)) whole
      else {
        val keep = keptByGen.getOrElse(g, Seq.empty)
        // a fragment can never route the read outside the committed
        // version: a malformed path falls the gen back; a well-formed
        // entry whose bucket has since been rewritten at a NEWER gen
        // is simply dropped — that bucket's rows live in the newer
        // generation, covered by its own piece of this loop
        if (keep.exists(rel => parseRelFile(rel).isEmpty)) whole
        else {
          anyPruned = true
          keep.filter(rel => parseRelFile(rel).exists {
            case (b, g2) => g2 == g && state.get(b).contains(g) })
        }
      }
    }
    if (relPaths.isEmpty) return full().limit(0)
    if (!anyPruned) return full()
    val direct = spark.read.option("basePath", tablePath)
      .parquet(relPaths.map(rel => s"$tablePath/$rel"): _*)
    meta.mapping.foldLeft(direct) { case (d, (logical, physical)) =>
      if (logical != physical && d.columns.contains(physical))
        d.withColumnRenamed(physical, logical)
      else d
    }.filter(pred)
  }

  // -------------------------------------------------------------------
  // BLOOM FRAGMENTS (round-12 verdict #5; per-gen since round 14): min/max
  // stats are useless for EQUALITY probes on a high-cardinality key — a
  // point read on universeId intersects essentially every file's
  // [min, max]. Per-file Bloom filters answer "might this file hold key
  // k?" with no false negatives, so `=`/`IN` reads open only the files
  // whose filter fires — Delta/Iceberg's bloom column stats. Stored as
  // sparse packed-word parquet per GENERATION (see the fragment section
  // above), probed with the word positions PUSHED INTO the fragment scan.
  // -------------------------------------------------------------------

  private val BloomHashes = 4
  /** Sidecar bits per row in the largest file — with k=4 hashes this
    * prices a point read's false-file rate at ~0.2 % while keeping the
    * sidecar ≈ 2 bits/row of table on disk. */
  private val BloomBitsPerRow = 16L

  /** What one point probe decided and what it cost — `scannedSidecarRows`
    * is the round-13 verdict #1 observable: the driver collects
    * O(|values| · k · files) fragment rows, never rows ∝ table size,
    * because the probe positions are computed BEFORE the fragment scan
    * and `word_idx IN (positions)` is pushed into it (MergeSpec bounds
    * this). */
  private[graft] final case class PointProbeReport(
      relPaths: Seq[String], scannedSidecarRows: Long,
      prunedGens: Int, unfragmentedGens: Int, fsProbes: Int = 0)

  /** Decide the file set for `column IN (values)` per generation: gens
    * with a Bloom fragment covering `column` contribute only their firing
    * files; gens without one keep all their files.
    *
    * Job shape (round-14 review finding): an incrementally-merged table's
    * manifest references one generation PER PAST ROUND for untouched
    * buckets, so a per-gen read-and-collect loop would run O(#gens)
    * sequential driver-blocking jobs. Instead: ONE probe-positions job
    * per DISTINCT filter width m (usually one), and ONE unioned scan of
    * every covered fragment, collected once — per-gen work after that is
    * driver arithmetic over the already-bounded row set. */
  private[graft] def pointProbe(spark: SparkSession, tablePath: String,
      column: String, values: Seq[Long]): PointProbeReport = {
    import spark.implicits._
    pointProbeDf(spark, tablePath, column, values.toDF("v"))
  }

  /** [[pointProbe]] for STRING keys (round 16): real takedown requests
    * are as often URL / content-hash / domain shaped as numeric-id
    * shaped, and the Bloom fragments already hash the column's NATIVE
    * values ([[writeGenFragments]]'s `xxhash64(col, i)`), so the probe
    * side only needs to hash the same way — the committed-type cast is a
    * no-op for a string probe against a string column. */
  private[graft] def pointProbeStrings(spark: SparkSession, tablePath: String,
      column: String, values: Seq[String]): PointProbeReport = {
    import spark.implicits._
    pointProbeDf(spark, tablePath, column, values.toDF("v"))
  }

  private def pointProbeDf(spark: SparkSession, tablePath: String,
      column: String, valuesDf: DataFrame): PointProbeReport = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, state) = readManifest(fsys, table)
    val meta = readMetaAt(fsys, table, version)
    // probe under the column's committed type (a long probe against an
    // int column would hash differently); with no committed schema, the
    // probe's OWN type — defaulting to LongType here would cast a string
    // probe to null and hash garbage, a Bloom FALSE NEGATIVE (pruning
    // must never be a correctness dependency, and a wrong-position probe
    // breaks exactly that)
    val dt = meta.schema.flatMap(_.find(_.name == column)).map(_.dataType)
      .getOrElse(valuesDf.schema.head.dataType)
    val byGen: Seq[(Int, Seq[Int])] = state.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (g, entries) => g -> entries.keys.toSeq.sorted }
    // driver-side split: gens with a fragment covering the column vs
    // whole. Fragment layout comes from the manifest's #frag entries
    // (round-15, verdict r14 #5) — ZERO per-gen FS round-trips for any
    // generation a round-15+ writer committed; gens absent from the map
    // (pre-upgrade tables) fall back to the per-gen FS probe, counted in
    // the report so the spec can pin "≤ a constant" for fresh tables.
    var fsProbes = 0
    val fragged: Seq[(Int, Long)] = byGen.flatMap { case (g, _) =>
      meta.frags.get(g) match {
        case Some(fi) =>
          if (fi.bloomM > 0 && fi.bloomCols.contains(column)) Some(g -> fi.bloomM)
          else None
        case None =>
          fsProbes += 1
          readBloomMeta(fsys, fragBloomMetaPath(table, g)) match {
            case Some((m, cols)) if cols.contains(column) && {
                fsProbes += 1; fsys.exists(fragBloomPath(table, g)) } =>
              Some(g -> m)
            case _ => None
          }
      }
    }
    val fraggedGens = fragged.map(_._1).toSet
    // positions first (through the writer's own hash expressions — engine
    // hash parity is structural): one tiny job per distinct m
    val probesByM: Map[Long, Array[Array[Long]]] =
      fragged.map(_._2).distinct.map { m =>
        m -> valuesDf
          .select((0 until BloomHashes).map(i =>
            pmod(xxhash64(col("v").cast(dt), lit(i)), lit(m)).as(s"p$i")): _*)
          .collect().map(r => Array.tabulate(BloomHashes)(r.getLong))
      }.toMap
    // one unioned, word_idx-pushed scan over every covered fragment
    val rowsByGen: Map[Int, Array[org.apache.spark.sql.Row]] =
      if (fragged.isEmpty) Map.empty
      else fragged.map { case (g, m) =>
        val wordIdxs = probesByM(m).flatten.map(_ / 64).distinct
        spark.read.parquet(fragBloomPath(table, g).toString)
          .filter(col("col") === column &&
            col("word_idx").isin(wordIdxs.map(java.lang.Long.valueOf): _*))
          .select(lit(g).as("gen"), col("file"), col("word_idx"), col("bits"))
      }.reduce(_ unionByName _).collect().groupBy(_.getInt(0))
    var scanned = 0L; var pruned = 0; var unfragmented = 0
    val relPaths: Seq[String] = byGen.flatMap { case (g, buckets) =>
      val whole = buckets.map(b => s"bucket=$b/gen=$g")
      if (!fraggedGens.contains(g)) { unfragmented += 1; whole }
      else {
        val m = fragged.find(_._1 == g).get._2
        val probes = probesByM(m)
        val rows = rowsByGen.getOrElse(g, Array.empty)
        scanned += rows.length
        val words: Map[String, Map[Long, Long]] = rows.groupBy(_.getString(1))
          .map { case (f, rs) =>
            f -> rs.map(r => r.getLong(2) -> r.getLong(3)).toMap }
        // a file fires when EVERY probe bit of at least one value is set
        // (no false negatives — a file absent from the filtered rows has
        // none of the probe words set and cannot hold a value)
        val keep = words.keys.toSeq.sorted.filter { f =>
          val wm = words(f)
          probes.exists(ps => ps.forall { pos =>
            (wm.getOrElse(pos / 64, 0L) & (1L << (pos % 64).toInt)) != 0L
          })
        }
        // malformed paths fall the gen back; entries for buckets since
        // rewritten at a newer gen are dropped (their rows live in the
        // newer generation, covered by its own piece of this loop)
        if (keep.exists(rel => parseRelFile(rel).isEmpty)) {
          unfragmented += 1; whole
        } else {
          pruned += 1
          keep.filter(rel => parseRelFile(rel).exists {
            case (b, g2) => g2 == g && state.get(b).contains(g) })
        }
      }
    }
    PointProbeReport(relPaths, scanned, pruned, unfragmented, fsProbes)
  }

  /** POINT-LOOKUP skipping read: `column IN (values)` served through the
    * committed generations' Bloom fragments ([[pointProbe]]) — no false
    * negatives by construction, false positives just open an extra file,
    * and generations without a fragment are read whole (which is what
    * lets `j1_merge_point_read` share the merge CTEs' oracle: pruning is
    * an optimization, never a correctness dependency). */
  def readTableWhereIn(spark: SparkSession, tablePath: String,
      column: String, values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "readTableWhereIn needs at least one value")
    readTableWhereInCore(spark, tablePath,
      col(column).isin(values.map(java.lang.Long.valueOf): _*),
      pointProbe(spark, tablePath, column, values))
  }

  /** [[readTableWhereIn]] for STRING keys — same Bloom-served file set
    * via [[pointProbeStrings]]. */
  def readTableWhereInStrings(spark: SparkSession, tablePath: String,
      column: String, values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "readTableWhereInStrings needs at least one value")
    readTableWhereInCore(spark, tablePath, col(column).isin(values: _*),
      pointProbeStrings(spark, tablePath, column, values))
  }

  private def readTableWhereInCore(spark: SparkSession, tablePath: String,
      pred: Column, report: PointProbeReport): DataFrame = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, state) = readManifest(fsys, table)
    val meta = readMetaAt(fsys, table, version)
    def full() = loadState(spark, tablePath, state, meta.schema, meta.mapping)
      .filter(pred)
    if (report.relPaths.isEmpty) return full().limit(0)
    if (report.prunedGens == 0) return full()
    val direct = spark.read.option("basePath", tablePath)
      .parquet(report.relPaths.map(rel => s"$tablePath/$rel"): _*)
    meta.mapping.foldLeft(direct) { case (d, (logical, physical)) =>
      if (logical != physical && d.columns.contains(physical))
        d.withColumnRenamed(physical, logical)
      else d
    }.filter(pred)
  }

  /** AUTO-ADOPT fragment metadata at the write round (round-16, verdict
    * r15 #1 — kills the last sequential-jobs read shape): `#frag` entries
    * for every generation `state` references that `knownFrags` does not
    * yet describe. Pre-round-15 writers left fragment LAYOUT discoverable
    * only by per-gen FS probes — [[pointProbe]]'s `exists`/readBloomMeta
    * round-trips and [[readTableWhereAll]]'s sequential driver footer
    * reads, O(#legacy gens) per read until someone remembered to call
    * [[refreshFragments]]. Every upsert/delete/compact already commits a
    * manifest, so adoption rides along: each legacy generation's on-disk
    * layout is read ONCE (2–3 FS calls + at most one parquet footer) and
    * recorded; after that commit the fallbacks are dead code for this
    * table. A generation with NOTHING on disk is recorded as an
    * explicitly-EMPTY [[FragInfo]] (`#frag g 0 - -`) so later reads and
    * commits know definitively there is nothing to probe — and
    * [[refreshFragments]] treats the empty entry as backfillable, so an
    * explicit COMPUTE backfill still works after adoption. On a fully
    * described table (every round-15+ write) the unknown set is empty and
    * this costs nothing. */
  private def adoptLegacyFrags(spark: SparkSession,
      fsys: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      state: Map[Int, Int], knownFrags: Map[Int, FragInfo]): Map[Int, FragInfo] = {
    val unknown = (state.values.toSet -- knownFrags.keySet).toSeq.sorted
    unknown.map { g =>
      val statsOnDisk: Seq[String] =
        if (!fsys.exists(fragStatsPath(table, g))) Seq.empty
        else spark.read.parquet(fragStatsPath(table, g).toString)
          .columns.toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
      val bloomOnDisk = readBloomMeta(fsys, fragBloomMetaPath(table, g))
        .filter(_ => fsys.exists(fragBloomPath(table, g)))
      g -> FragInfo(statsOnDisk,
        bloomOnDisk.map(_._1).getOrElse(0L),
        bloomOnDisk.map(_._2).getOrElse(Seq.empty))
    }.toMap
  }

  /** BACKFILL data-skipping fragments WITHOUT rewriting data (round-15;
    * ADVICE r14 #3's migration path): for every generation the current
    * version references,
    *
    *   - a generation whose fragments exist on disk but are missing from
    *     the manifest (written by a pre-round-15 writer) is ADOPTED: its
    *     layout is read once from the FS and recorded as a `#frag` entry;
    *   - a generation with no fragments at all gets them COMPUTED — one
    *     read of that generation's files, same as any writer pays for its
    *     new gen;
    *
    * then ONE metadata-only version commits the complete fragment map
    * (and the sidecar policy, when `statsCols`/`bloomCols` set it for a
    * table that never had one). This is the cheap way to (re)gain
    * skipping on an existing table: no data rewrite (unlike [[cluster]]),
    * and point reads need no clustering at all — Bloom fragments prune
    * on ANY layout. Pre-round-14 tables (whose per-version `stats-v`
    * sidecars stopped being consulted when fragments replaced them) run
    * this once instead of re-clustering. Returns [[RefreshFragmentsStats]]
    * — the generation count AND whether a version committed are separate
    * fields (ADVICE r15 #4: the old Int return read 0 for a policy-only
    * commit, misleading callers using it to detect "no version burned"). */
  def refreshFragments(spark: SparkSession, tablePath: String,
      statsCols: Seq[String] = Seq.empty, bloomCols: Seq[String] = Seq.empty,
      retainVersions: Int = 2): RefreshFragmentsStats = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, state) = readManifest(fsys, table)
    val meta0 = readMetaAt(fsys, table, version)
    val policy = meta0.copy(
      statsCols = if (statsCols.nonEmpty) statsCols else meta0.statsCols,
      bloomCols = if (bloomCols.nonEmpty) bloomCols else meta0.bloomCols)
    require(policy.statsCols.nonEmpty || policy.bloomCols.nonEmpty,
      s"$tablePath has no sidecar policy and none was given — nothing to backfill")
    val byGen = state.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (g, entries) => g -> entries.keys.toSeq.sorted }
    val newFrags: Seq[(Int, FragInfo)] = byGen.flatMap { case (g, buckets) =>
      // an explicitly-EMPTY entry (auto-adopted by a write round for a gen
      // with nothing on disk) is still backfillable — only a gen with real
      // fragments recorded is done
      if (meta0.frags.get(g).exists(fi => fi.statsCols.nonEmpty || fi.bloomM > 0))
        None
      else {
        // adopt an on-disk fragment set a pre-round-15 writer left behind
        val statsOnDisk: Seq[String] =
          if (!fsys.exists(fragStatsPath(table, g))) Seq.empty
          else spark.read.parquet(fragStatsPath(table, g).toString)
            .columns.toSeq.filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
        val bloomOnDisk: Option[(Long, Seq[String])] =
          readBloomMeta(fsys, fragBloomMetaPath(table, g))
            .filter(_ => fsys.exists(fragBloomPath(table, g)))
        if (statsOnDisk.nonEmpty || bloomOnDisk.nonEmpty)
          Some(g -> FragInfo(statsOnDisk,
            bloomOnDisk.map(_._1).getOrElse(0L),
            bloomOnDisk.map(_._2).getOrElse(Seq.empty)))
        else // nothing on disk: compute fragments for this generation
          writeGenFragments(spark, tablePath, table, g,
            buckets.map(b => genPathOf(table, b, g).toString), policy)
            .map(g -> _)
      }
    }
    if (newFrags.isEmpty &&
        policy.statsCols == meta0.statsCols && policy.bloomCols == meta0.bloomCols)
      // fully fragmented already under an unchanged policy — don't burn a
      // version
      return RefreshFragmentsStats(0, None)
    val meta = policy.copy(frags = meta0.frags ++ newFrags)
    val (committedVersion, _, _) =
      commitWithRetry(fsys, table, version + 1, state, Map.empty, meta,
        carriedStats = readBucketStatsAt(fsys, table, version))
    sweepRetention(fsys, table, committedVersion, retainVersions, meta.takedownGrace)
    RefreshFragmentsStats(newFrags.size, Some(committedVersion))
  }

  /** What one [[refreshFragments]] call did: `generations` adopted or
    * backfilled, and the version it committed — None when the table was
    * already fully fragmented under an unchanged policy (no version
    * burned). A policy-only change reads as (0, Some(v)): no generation
    * needed work, but a version DID commit to record the new sidecar
    * policy for later writers. */
  final case class RefreshFragmentsStats(
      generations: Int, committedVersion: Option[Int])

  // -------------------------------------------------------------------
  // Schema in the log (Delta-style): each version commits its DATA
  // schema (key + data columns, no partition cols) as a sidecar, so
  // readers never footer-scan 10^5 files to discover columns, and SCHEMA
  // EVOLUTION falls out: a round whose batch carries a new column
  // commits a widened schema, and reading OLD generations under it fills
  // the missing column with null (the parquet reader's behavior under an
  // explicit schema) — exactly Delta's ADD COLUMN semantics. Time travel
  // stays faithful: each version reads under ITS OWN schema sidecar.
  // -------------------------------------------------------------------

  /** The wider of two numeric types within one family (integral or
    * fractional), None when the pair is not a safe widening. */
  private def widerOf(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val integral: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    val fractional: Seq[DataType] = Seq(FloatType, DoubleType)
    def pick(ladder: Seq[DataType]): Option[DataType] = {
      val (ia, ib) = (ladder.indexOf(a), ladder.indexOf(b))
      if (ia >= 0 && ib >= 0) Some(ladder(math.max(ia, ib))) else None
    }
    if (a == b) Some(a) else pick(integral).orElse(pick(fractional))
  }

  private def schemaPath(table: org.apache.hadoop.fs.Path, version: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(table), s"schema-v$version")

  /** LEGACY reader (pre-format-2 tables only — since round 14 the schema
    * travels inside the manifest, [[readMetaAt]]): the schema a version
    * committed — None for tables written before the sidecar existed
    * (readers then fall back to footer inference). The committed schema
    * is the LOGICAL one (user-facing names); physical parquet names are
    * recovered through [[readMappingAt]]. */
  private def readSchemaAt(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path, version: Int)
      : Option[org.apache.spark.sql.types.StructType] = {
    val p = schemaPath(table, version)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(text)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  // -------------------------------------------------------------------
  // COLUMN MAPPING (Delta's rename-without-rewrite): physical parquet
  // column names NEVER change once written; a RENAME commits a new
  // version whose mapping sidecar binds the new LOGICAL name to the
  // unchanged physical one. Readers read under physical names and
  // project to logical; writers translate logical back to physical
  // before appending, so every generation — pre- and post-rename —
  // carries one physical name per column. Time travel stays faithful:
  // each version reads under ITS OWN schema + mapping, so historical
  // reads surface the OLD name.
  // -------------------------------------------------------------------

  private def mappingPath(table: org.apache.hadoop.fs.Path, version: Int) =
    new org.apache.hadoop.fs.Path(manifestDir(table), s"mapping-v$version")

  /** LEGACY reader (pre-format-2 tables only): logical → physical for
    * columns whose names diverged; identity entries are omitted (absent
    * file = fully identity). */
  private def readMappingAt(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path, version: Int): Map[String, String] = {
    val p = mappingPath(table, version)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      text.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(lo, ph) = l.split(','); lo -> ph
      }.toMap
    }
  }

  /** Rename `from` to `to` as a metadata-only commit: no data touched,
    * the manifest carries over, the new version's schema holds the new
    * logical name and its mapping binds it to `from`'s PHYSICAL name.
    * Old versions keep reading (and time-traveling) under `from`. */
  def renameColumn(spark: SparkSession, tablePath: String,
      from: String, to: String, retainVersions: Int = 2): Unit = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (version, current) = readManifest(fs, table)
    val round = version + 1
    val meta0 = readMetaAt(fs, table, version)
    val schema = meta0.schema.getOrElse(
      sys.error(s"renameColumn needs a committed schema on $tablePath"))
    require(schema.fieldNames.contains(from), s"no column $from to rename")
    require(!schema.fieldNames.contains(to), s"column $to already exists")
    val mapping = meta0.mapping
    val physical = mapping.getOrElse(from, from)
    val renamedSchema = org.apache.spark.sql.types.StructType(
      schema.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    // sidecar policy follows the rename (fragments already on disk keep
    // the OLD logical name, so pruning on the renamed column degrades to
    // keep-all for pre-rename generations — correctness is untouched)
    def ren(cs: Seq[String]) = cs.map(c => if (c == from) to else c)
    commitManifest(fs, table, round, current, meta0.copy(
      schema = Some(renamedSchema),
      mapping = (mapping - from) + (to -> physical),
      statsCols = ren(meta0.statsCols), bloomCols = ren(meta0.bloomCols)),
      // metadata-only commit: per-bucket stats carry forward untouched
      readBucketStatsAt(fs, table, version))
    sweepRetention(fs, table, round, retainVersions, meta0.takedownGrace)
  }

  /** Translate a LOGICAL frame to physical column names for writing. */
  private def toPhysical(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (logical, physical)) =>
      if (logical != physical && d.columns.contains(logical))
        d.withColumnRenamed(logical, physical)
      else d
    }

  private def manifestDir(table: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(table, "_manifests")

  /** Everything a version commits BESIDES the bucket → gen map, embedded
    * in the manifest file itself (round-14, ADVICE r13 #1): the previous
    * design wrote schema/mapping as separate pre-commit sidecar files
    * with overwrite, so a writer LOSING the put-if-absent manifest race
    * had already replaced the winner's committed metadata — and the
    * conflict check then read back the loser's own write. With the
    * metadata inside the one put-if-absent manifest file, a version's
    * schema/mapping/layout properties are atomic with its commit and
    * structurally impossible to clobber (Delta keeps schema in the
    * commit JSON for the same reason). `statsCols`/`bloomCols` are the
    * table's skipping-sidecar policy: once a clustered rewrite sets them,
    * every later writer maintains per-generation fragments for its new
    * generation (round-13 verdict #5 — sidecars no longer die at the
    * next version). `takedownGrace` is the compliance dial (verdict #7):
    * when set, retention is clamped to at most that many pre-delete
    * versions, bounding takedown-to-physical latency table-wide. */
  private[graft] final case class TableMeta(
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      mapping: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty,
      takedownGrace: Option[Int] = None,
      frags: Map[Int, FragInfo] = Map.empty)

  /** Per-generation skipping-fragment metadata, embedded in the manifest
    * (round-15 — verdict r14 #5): which stat columns the generation's
    * `statsg-` fragment covers, and the Bloom fragment's bit width `m`
    * (0 = no Bloom fragment) with its covered columns. With this in the
    * manifest, a point or range read learns every generation's fragment
    * layout from the ONE manifest file it already read — zero per-gen FS
    * probes (the round-14 residual: [[pointProbe]] paid O(live
    * generations) driver `exists`/`readBloomMeta` round-trips before its
    * single pushed-down scan). Generations absent from the map (written
    * by pre-round-15 code) fall back to the FS probe — and
    * [[refreshFragments]] adopts them into the manifest. */
  private[graft] final case class FragInfo(
      statsCols: Seq[String], bloomM: Long, bloomCols: Seq[String])

  /** Per-bucket data-file count and byte size of the generation a manifest
    * line commits, carried ON the line itself (`bucket,gen,files,bytes` —
    * round 16; Delta's add-file `size`/Iceberg's manifest-entry stats).
    * Writers know these numbers for free — they just wrote the files —
    * and record them at commit; carried-over buckets copy the previous
    * version's values (the gen is immutable, so they cannot stale). With
    * them in the manifest, OPTIMIZE planning (which buckets exceed the
    * file target), CompactStats' before/after accounting, and the
    * per-round `tableBytes` report are all driver-memory reads — the last
    * O(buckets)-listStatus-per-operation loops in the lake are gone (at a
    * 10⁵-bucket table, compact() paid 3·10⁵ serial NameNode RPCs per run
    * BEFORE it moved any data; the round-14 retention-sweep fix killed
    * the same shape on the delete path). Two-field legacy lines read as
    * stats-unknown and are adopted (measured once, recorded) by the next
    * write round or compact — the [[refreshFragments]] migration story. */
  private[graft] final case class BucketStat(files: Long, bytes: Long)

  /** One listStatus of a gen dir → its data-file count and bytes; None
    * when the dir does not exist (a fully-deleted or never-written
    * bucket). The `_`/`.` filter keeps committed markers like _SUCCESS
    * out of the file count (they are zero-length, so bytes are exact
    * either way). */
  private def statOfGenDir(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path)
      : Option[BucketStat] =
    if (!fs.exists(p)) None
    else {
      val data = fs.listStatus(p).filter(st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      Some(BucketStat(data.length.toLong, data.map(_.getLen).sum))
    }

  /** The per-bucket stats a committed manifest carries (buckets on
    * legacy two-field lines are simply absent — stats-unknown). */
  private[graft] def readBucketStatsAt(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      version: Int): Map[Int, BucketStat] =
    manifestLines(fs, table, version).filterNot(_.startsWith("#")).flatMap { l =>
      val parts = l.split(',')
      if (parts.length >= 4)
        Some(parts(0).toInt -> BucketStat(parts(2).toLong, parts(3).toLong))
      else None
    }.toMap

  /** Measure-and-record stats for carried-over buckets a pre-round-16
    * manifest committed without them: one listStatus per missing bucket,
    * ONCE — the recorded values ride every later manifest. */
  private def adoptLegacyBucketStats(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      entries: Map[Int, Int], known: Map[Int, BucketStat])
      : Map[Int, BucketStat] =
    entries.collect {
      case (b, g) if !known.contains(b) =>
        statOfGenDir(fs, genPathOf(table, b, g)).map(b -> _)
    }.flatten.toMap

  /** Atomic commit: write `#`-prefixed metadata lines plus `bucket,gen`
    * lines to a temp file, claim `manifest-v<version>` PUT-IF-ABSENT
    * ([[ManifestIo.commitFile]] — round-12 verdict: the old
    * delete-then-rename was last-write-wins, so a concurrent writer or
    * stale retry silently replaced a committed version). A commit of an
    * existing version throws [[VersionConflictException]];
    * [[upsertRound]] catches it and retries at the next version when the
    * conflict is benign (disjoint buckets). */
  private def commitManifest(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      version: Int, state: Map[Int, Int], meta: TableMeta,
      stats: Map[Int, BucketStat] = Map.empty): Unit = {
    // fragment entries only for generations this version references —
    // entries for replaced gens would be dead weight in every later read
    val liveGens = state.values.toSet
    def colsOrDash(cs: Seq[String]) = if (cs.isEmpty) "-" else cs.mkString(",")
    val metaLines = Seq("#format 2") ++
      meta.schema.map(s => s"#schema ${s.json}").toSeq ++
      meta.mapping.toSeq.sorted.map { case (l, ph) => s"#mapping $l,$ph" } ++
      (if (meta.statsCols.nonEmpty)
        Seq(s"#statscols ${meta.statsCols.mkString(",")}") else Seq.empty) ++
      (if (meta.bloomCols.nonEmpty)
        Seq(s"#bloomcols ${meta.bloomCols.mkString(",")}") else Seq.empty) ++
      meta.takedownGrace.map(g => s"#takedowngrace $g").toSeq ++
      meta.frags.toSeq.filter(kv => liveGens(kv._1)).sortBy(_._1)
        .map { case (g, fi) =>
          s"#frag $g ${fi.bloomM} ${colsOrDash(fi.statsCols)} ${colsOrDash(fi.bloomCols)}" }
    ManifestIo.commitFile(fs, manifestDir(table), s"manifest-v$version",
      (metaLines ++ state.toSeq.sorted.map { case (b, g) =>
        stats.get(b).fold(s"$b,$g")(st => s"$b,$g,${st.files},${st.bytes}") })
        .mkString("", "\n", "\n"))
  }

  /** A version's committed metadata. Format-2 manifests carry it inline;
    * legacy (round-13) tables fall back to their schema-v/mapping-v
    * sidecar files, so persisted history tables stay readable. */
  private[graft] def readMetaAt(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      version: Int): TableMeta = {
    val lines = manifestLines(fs, table, version)
    if (!lines.exists(_.startsWith("#format")))
      TableMeta(readSchemaAt(fs, table, version), readMappingAt(fs, table, version))
    else {
      def tagged(tag: String): Seq[String] =
        lines.filter(_.startsWith(s"#$tag ")).map(_.stripPrefix(s"#$tag "))
      TableMeta(
        schema = tagged("schema").headOption.map(j =>
          org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[org.apache.spark.sql.types.StructType]),
        mapping = tagged("mapping").map { l =>
          val Array(lo, ph) = l.split(','); lo -> ph }.toMap,
        statsCols = tagged("statscols").headOption
          .map(_.split(',').toSeq).getOrElse(Seq.empty),
        bloomCols = tagged("bloomcols").headOption
          .map(_.split(',').toSeq).getOrElse(Seq.empty),
        takedownGrace = tagged("takedowngrace").headOption.map(_.trim.toInt),
        frags = tagged("frag").map { l =>
          val parts = l.split(' ')
          def cols(s: String) = if (s == "-") Seq.empty[String] else s.split(',').toSeq
          parts(0).toInt -> FragInfo(cols(parts(2)), parts(1).toLong, cols(parts(3)))
        }.toMap)
    }
  }

  private def manifestLines(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      version: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir(table), s"manifest-v$version")
    require(fs.exists(p),
      s"version $version is expired or never committed (retained: " +
        s"${committedVersions(fs, table).mkString(",")})")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.linesIterator.filter(_.nonEmpty).toSeq
  }

  /** A fresh GENERATION label for one writer attempt at `round`: gen dirs
    * are write-once — no two attempts (crashed retries, or two concurrent
    * disjoint-bucket writers racing the same round number) may ever
    * append into the same `bucket=<b>/gen=<g>` dir, or the winner's
    * committed dir would carry the loser's rows. The label packs the
    * round into the high bits (readable lineage, strictly increasing
    * across rounds) with a random low salt per attempt; uncommitted
    * leftovers of crashed attempts are ignored by readers (manifest-
    * driven) and removed by the retention sweep. Bound: 2^19 rounds per
    * table before Int overflow — raise gen to Long before then. */
  private def freshGen(round: Int): Int = {
    require(round < (1 << 19), s"generation label space exhausted at round $round")
    (round << 12) | scala.util.Random.nextInt(1 << 12)
  }

  /** [[freshGen]] hardened against the 12-bit salt space (round 14): a
    * crashed attempt's leftover dirs share the salt space with its retry,
    * and a same-salt draw (p = 2⁻¹²) would APPEND the retry's rows into
    * the crashed attempt's dirs — the committed gen would then hold both
    * attempts' rows. The label is CLAIMED atomically before any write: a
    * put-if-absent `genmark-<gen>` marker under `_manifests` (ONE fs
    * call per draw — existence-probing every touched dir would be
    * O(buckets) serial RPCs on a clustered rewrite, and check-then-write
    * still races a concurrent same-salt writer; the marker closes both).
    * Markers expire with their generations through the same sweep rules
    * as the fragments. */
  private def freshGenFor(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path, round: Int): Int = {
    while (true) {
      val g = freshGen(round)
      try {
        ManifestIo.commitFile(fs, manifestDir(table), s"genmark-$g", "")
        return g
      } catch {
        case _: VersionConflictException => () // label taken — redraw
      }
    }
    sys.error("unreachable")
  }

  private val MaxCommitRetries = 5

  /** Commit `base ++ newEntries` with OPTIMISTIC CONCURRENCY (round-12
    * verdict #3): try version `round`; on [[VersionConflictException]]
    * (another writer won the put-if-absent race), re-read the winner's
    * manifest and retry at the next version — valid exactly when the
    * winner did not rewrite any bucket this writer's merge read
    * (disjoint-bucket writers merge their manifests, Delta-style) and did
    * not change the schema/mapping this writer committed under. A real
    * overlap or metadata change surfaces as a conflict error telling the
    * caller to re-run the round against the latest version — its merged
    * rows were computed from stale data and must not be committed.
    * Returns (committed version, committed state).
    *
    * Note on the retention sweep: a writer racing others should keep
    * `retainVersions` ≥ the concurrent-writer lag — the sweep removes
    * unreferenced gen dirs, and an in-flight writer's not-yet-committed
    * gens look unreferenced to it (the same reason Delta's VACUUM has a
    * retention window). */
  /** ADVICE r13 #1 note: earlier revisions wrote schema/mapping sidecar
    * FILES here before each commit attempt — with overwrite — so a losing
    * writer clobbered the winner's committed metadata and the conflict
    * check below read back its own write. Metadata now travels INSIDE the
    * put-if-absent manifest ([[commitManifest]]), so the winner's is
    * immutable and the comparison reads what the winner actually
    * committed.
    *
    * `strict` (ADVICE r13 #3): a predicate DELETE's read set is the WHOLE
    * table, not just the buckets it rewrote — a concurrent writer
    * inserting predicate-matching rows into an untouched bucket would
    * otherwise let the takedown commit a version that still contains
    * matching rows (write skew; Delta fails DELETE on any concurrent
    * change it cannot prove disjoint from the predicate). Strict mode
    * refuses on ANY bucket change between this writer's base and the
    * winner's state. */
  private def commitWithRetry(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      round: Int, base0: Map[Int, Int],
      newEntries: Map[Int, Int],
      meta: TableMeta,
      removedBuckets: Seq[Int] = Seq.empty,
      strict: Boolean = false,
      carriedStats: Map[Int, BucketStat] = Map.empty,
      newStats: Map[Int, BucketStat] = Map.empty,
      adoptedStats: Map[Int, BucketStat] = Map.empty)
      : (Int, Map[Int, Int], Map[Int, BucketStat]) = {
    var attemptVersion = round
    var base = base0
    var attempts = 0
    // fragment metadata is MERGED across racers, not compared: each
    // writer knows only its own new generation's fragments, and the
    // winner's gens (disjoint buckets) carry the winner's entries
    var mergedFrags = meta.frags
    // same story for the per-bucket stats: on a benign (disjoint-bucket)
    // retry, carried values re-read from the winner's manifest, this
    // writer's own new gens keep its own measurements
    var carried = carriedStats
    while (true) {
      val stateMap = (base -- removedBuckets) ++ newEntries
      val statsMap = ((carried -- removedBuckets) ++ newStats)
        .filter { case (b, _) => stateMap.contains(b) }
      try {
        commitManifest(fs, table, attemptVersion, stateMap,
          meta.copy(frags = mergedFrags), statsMap)
        return (attemptVersion, stateMap, statsMap)
      } catch {
        case c: VersionConflictException =>
          attempts += 1
          if (attempts > MaxCommitRetries) throw c
          val (wv, wstate) = readManifest(fs, table)
          val overlap =
            (if (strict) (wstate.keySet ++ base0.keySet).toSeq
             else newEntries.keys.toSeq ++ removedBuckets)
              .filter(b => wstate.get(b) != base0.get(b)).sorted
          if (overlap.nonEmpty)
            throw new VersionConflictException(
              s"concurrent writer rewrote bucket(s) ${overlap.mkString(",")} " +
                s"of $table after this round read ${if (strict) "the table"
                  else "them"} — the ${if (strict) "delete's predicate scan is"
                  else "merged rows are"} stale; re-run against the latest version")
          // metadata check: the winner must have committed the SAME schema
          // this writer is about to (same field set/types — nullability is
          // normalized: a merge round makes every column nullable while an
          // initial load may not), mapping, and layout properties; a
          // metadata-changing winner is a conflict no manifest merge can
          // reconcile
          // field ORDER is also normalized (round 17): column identity is
          // nominal end-to-end (mergeUpsert joins by name, loadState reads
          // by name, fragments are keyed by column name), and a merge
          // round legitimately reorders columns vs the initial load — a
          // compact/cluster racing such a round carries the OLD order and
          // must not read that as a schema change
          def norm(s: Option[org.apache.spark.sql.types.StructType]) =
            s.map(st => org.apache.spark.sql.types.StructType(st.fields.map(
              _.copy(nullable = true,
                metadata = org.apache.spark.sql.types.Metadata.empty))
              .sortBy(_.name)))
          val wmeta = readMetaAt(fs, table, wv)
          if (norm(wmeta.schema) != norm(meta.schema) ||
              wmeta.copy(schema = None, frags = Map.empty) !=
                meta.copy(schema = None, frags = Map.empty))
            throw new VersionConflictException(
              s"concurrent writer changed the schema/mapping/layout of $table — " +
                "metadata conflicts are not auto-merged; re-run the round")
          attemptVersion = wv + 1
          base = wstate
          // this writer's own entries win for its own gens (it wrote them)
          mergedFrags = wmeta.frags ++ meta.frags
          // the winner's stats are authoritative for buckets IT committed,
          // but this writer's adopted-legacy measurements must survive the
          // rebase (ADVICE r16 #4): a benign conflict would otherwise
          // re-commit legacy buckets stats-less — the one-round migration
          // silently not completing, and the listings re-paid next round.
          // ONLY for buckets the winner left at this writer's base gen,
          // though (ADVICE r17 #2): an adopted measurement describes the
          // gen this writer READ — if the winner rewrote that bucket
          // (old-binary racer, no stats), re-attaching the old gen's
          // file/byte stats to the winner's NEW gen would carry a wrong
          // measurement forward until the bucket's next rewrite; dropping
          // it leaves the bucket stats-less and re-measured, the honest
          // pre-adoption behavior
          carried = adoptedStats.filter { case (b, _) =>
            wstate.get(b) == base0.get(b) } ++
            readBucketStatsAt(fs, table, wv)
      }
    }
    sys.error("unreachable")
  }

  /** Latest committed (version, bucket → gen). */
  private def readManifest(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path)
      : (Int, Map[Int, Int]) = {
    val versions = committedVersions(fs, table)
    require(versions.nonEmpty, s"no committed manifest under ${manifestDir(table)}")
    val v = versions.max
    (v, readManifestAt(fs, table, v))
  }

  /** Every version still retained on disk (ascending) — the time-travel
    * window [[readTableAt]] accepts. */
  private def committedVersions(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path)
      : Seq[Int] = {
    val dir = manifestDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .filter(_.startsWith("manifest-v")).map(_.stripPrefix("manifest-v").toInt)
      .sorted
  }

  /** One specific committed manifest's bucket → gen map (metadata lines —
    * `#`-prefixed — are parsed by [[readMetaAt]]). */
  private def readManifestAt(
      fs: org.apache.hadoop.fs.FileSystem, table: org.apache.hadoop.fs.Path,
      version: Int): Map[Int, Int] =
    manifestLines(fs, table, version).filterNot(_.startsWith("#")).map { l =>
      // 2-field legacy lines and 4-field stats-bearing lines both parse
      val parts = l.split(','); parts(0).toInt -> parts(1).toInt
    }.toMap

  /** The retention a writer's sweep will ACTUALLY enforce on `tablePath`:
    * its own `retainVersions`, clamped by the table's persisted
    * takedown-grace policy (round 14 — a writer coordinating drain lag
    * with retention, like StreamingChangeFeed's backpressure guard, must
    * budget against this, not its own dial: a once-persisted grace
    * silently shrinks every later sweep, and a guard using the
    * un-clamped value would let undrained versions expire and wedge the
    * feed). */
  def effectiveRetention(spark: SparkSession, tablePath: String,
      retainVersions: Int): Int = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fsys = fs(spark, table)
    val (version, _) = readManifest(fsys, table)
    readMetaAt(fsys, table, version).takedownGrace
      .fold(retainVersions)(g =>
        math.min(retainVersions.toLong, g.toLong + 1L).toInt)
  }

  /** The versions of `tablePath` that are still time-travel-readable
    * (bounded by the writer's `retainVersions`). */
  def tableVersions(spark: SparkSession, tablePath: String): Seq[Int] = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    committedVersions(table.getFileSystem(spark.sparkContext.hadoopConfiguration), table)
  }

  /** The manifest-aware reader — the ONLY correct way to read the
    * incremental table (a bare `spark.read.parquet(tablePath)` would see
    * uncommitted or not-yet-GC'd generations): loads exactly the latest
    * manifest's `bucket=<b>/gen=<g>` dirs, with `basePath` so `bucket`
    * (and `gen`) stay partition columns and bucket filters still prune. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (version, state) = readManifest(fs, table)
    val meta = readMetaAt(fs, table, version)
    loadState(spark, tablePath, state, meta.schema, meta.mapping)
  }

  /** TIME TRAVEL: read `tablePath` exactly as it stood when `version` was
    * committed. Works for any version the writer's `retainVersions` still
    * keeps on disk (the sweep deletes expired manifests together with the
    * generations only they reference, so a retained manifest's paths are
    * guaranteed present). Each manifest is an immutable, self-contained
    * bucket → gen map — historical reads cost the same as current reads
    * and never block the writer, exactly a lake format's `VERSION AS OF`.
    * At 100 TB this is how a training run pins its input: record the
    * manifest version at kickoff and every re-read (resume, audit,
    * repro) sees byte-identical data regardless of later merges. */
  def readTableAt(spark: SparkSession, tablePath: String, version: Int): DataFrame = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readMetaAt(fs, table, version)
    loadState(spark, tablePath, readManifestAt(fs, table, version),
      meta.schema, meta.mapping)
  }

  /** `schema`: the version's committed LOGICAL schema (sidecar) — passing
    * it (a) skips footer inference at 10⁵-file scale, (b) fills columns
    * the generation predates with null (schema evolution), and (c) reads
    * narrow generations upcast under a widened type. `mapping` translates
    * logical to the on-disk PHYSICAL names for the read, and the result
    * is projected back to logical — rename support. None/empty falls
    * back to inference (pre-sidecar tables). Partition columns (bucket,
    * gen) are appended by directory discovery either way. */
  private def loadState(
      spark: SparkSession, tablePath: String, state: Map[Int, Int],
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      mapping: Map[String, String] = Map.empty): DataFrame = {
    val paths = state.toSeq.sorted.map { case (b, g) => s"$tablePath/bucket=$b/gen=$g" }
    val reader = spark.read.option("basePath", tablePath)
    val physicalSchema = schema.map(st => org.apache.spark.sql.types.StructType(
      st.fields.map(f => f.copy(name = mapping.getOrElse(f.name, f.name)))))
    val df = physicalSchema.fold(reader)(reader.schema).parquet(paths: _*)
    mapping.foldLeft(df) { case (d, (logical, physical)) =>
      if (logical != physical && d.columns.contains(physical))
        d.withColumnRenamed(physical, logical)
      else d
    }
  }

  /** Buckets whose generation differs between two committed versions —
    * the manifest diff that prices a CDC read. O(buckets) driver-side map
    * compare; no data touched. */
  def changedBucketsBetween(spark: SparkSession, tablePath: String,
      fromVersion: Int, toVersion: Int): Seq[Int] = {
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = readManifestAt(fs, table, fromVersion)
    val m2 = readManifestAt(fs, table, toVersion)
    (m1.keySet ++ m2.keySet).filter(b => m1.get(b) != m2.get(b)).toSeq.sorted
  }

  /** CHANGE DATA FEED: every row-level change between two committed
    * versions — `op` ∈ (`insert`, `update`) plus the post-image columns
    * (merge-upserts never delete, so there is no `delete` op to emit).
    *
    * The lake-native part is WHAT IT READS: the manifest diff names the
    * buckets whose generation changed, and only those gen dirs are opened
    * — for both versions. Buckets outside the diff CANNOT hold changes
    * (the bucket function is on the merge key, so a key's row lives in
    * one bucket across all versions), which makes the read's cost
    * ∝ changed buckets, not table size: a 10³-key batch against a
    * 10⁵-bucket 100 TB table answers "what changed?" by scanning ≈ 1 ‰
    * of the data. This is Delta's change-data-feed / Iceberg's
    * incremental-read contract, derived here from the same manifests that
    * already give time travel — no extra write-path bookkeeping at all.
    * Within the diff, rewritten-but-identical rows (neighbors of a
    * changed key sharing its bucket, or compaction's pure layout rewrites)
    * are filtered by a null-safe column compare, so a compact-only
    * version emits ZERO changes (MergeSpec pins this). The join shuffles
    * only the changed buckets' rows, hash-partitioned on the key.
    *
    * Contract (MergeSpec-pinned): applying the feed to the `from`
    * snapshot — overwrite-all-columns upsert of the post-images —
    * reproduces the `to` snapshot exactly.
    *
    * `withPreimage = true` additionally emits every data column's OLD
    * value as `pre_<c>` (null on inserts) — Delta CDF's
    * update_preimage, at zero extra I/O (the old side is already in the
    * join). Preimages are what turn the feed into a DELTA stream:
    * an aggregate view refreshes as agg + f(post) − f(pre) instead of
    * recomputing ([[mergeIvm]]), which is the whole point of CDC at
    * 100 TB. */
  def readChanges(spark: SparkSession, tablePath: String,
      fromVersion: Int, toVersion: Int, key: String,
      withPreimage: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = readManifestAt(fs, table, fromVersion)
    val m2 = readManifestAt(fs, table, toVersion)
    // a bucket changed if its generation moved OR it left the manifest
    // entirely (deleteWhere drops fully-deleted buckets)
    val changed = (m1.keySet ++ m2.keySet)
      .filter(b => m1.get(b) != m2.get(b))
    val dataCols = (c: DataFrame) =>
      c.columns.filterNot(n => n == key || n == "bucket" || n == "gen").toSeq
    def outCols(keyCol: Column, opCol: Column, cols: Seq[String],
        post: String => Column, pre: String => Column): Seq[Column] =
      keyCol.as(key) +: opCol.as("op") +: (cols.map(c => post(c).as(c)) ++
        (if (withPreimage) cols.map(c => pre(c).as(s"pre_$c")) else Seq.empty))
    // both sides read under the TO version's schema: a column added
    // between the versions reads as null on the old side, so evolution
    // surfaces as ordinary updates (null -> value) with null preimages
    val toMeta = readMetaAt(fs, table, toVersion)
    val toSchema = toMeta.schema
    val toMapping = toMeta.mapping
    if (changed.isEmpty) {
      val empty = loadState(spark, tablePath, m2, toSchema, toMapping).limit(0)
      return empty.select(outCols(col(key), lit("insert"),
        dataCols(empty), col, col): _*)
    }
    val newEntries = m2.filter { case (b, _) => changed.contains(b) }
    val oldEntries = m1.filter { case (b, _) => changed.contains(b) }
    def side(entries: Map[Int, Int], other: => DataFrame): DataFrame =
      if (entries.isEmpty) other.limit(0)
      else loadState(spark, tablePath, entries, toSchema, toMapping)
        .drop("bucket", "gen")
    lazy val newSide: DataFrame = side(newEntries, oldSide)
    lazy val oldSide: DataFrame = side(oldEntries, newSide)
    val cols = dataCols(newSide)
    val n = newSide.alias("n")
    val o = oldSide.alias("o")
    val differs = cols.map(c => !(col(s"n.$c") <=> col(s"o.$c")))
      .reduce(_ || _)
    // FULL outer: a key present old-side only is a DELETE — null
    // post-image columns, preimages carry the removed row (Delta CDF's
    // delete rows; what lets the maintainer tier cascade a takedown)
    n.join(o, col(s"n.$key") === col(s"o.$key"), "full_outer")
      .filter(col(s"o.$key").isNull || col(s"n.$key").isNull || differs)
      .select(outCols(coalesce(col(s"n.$key"), col(s"o.$key")),
        when(col(s"o.$key").isNull, "insert")
          .when(col(s"n.$key").isNull, "delete").otherwise("update"), cols,
        c => col(s"n.$c"), c => col(s"o.$c")): _*)
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

  /** The first `rounds` incremental batches unrolled as global full-outer
    * merges — the shared oracle body for the final table
    * ([[mergeIncrementalSql]], rounds = [[IncRounds]]) and the
    * time-travel read ([[mergeTimeTravelSql]], rounds =
    * [[TimeTravelVersion]]): version v of the incremental table IS by
    * construction the first v merges applied, so the historical read's
    * oracle is the same recursion stopped early. */
  /** The CTE chain `existing, f1..fr, m1..mr` shared by every oracle that
    * reasons about merge history: `m$r` is the table exactly as version
    * `r` commits it. */
  private def mergeCtesSql(rounds: Int): String =
    s""", existing AS (SELECT universeId, rootPlaceId, name, description,
       |                      gameplayDescription, playerCount
       |               FROM games WHERE universeId % 3 <> 1),
       |${(1 to rounds).map(freshRoundSql).mkString(",\n")},
       |${(1 to rounds).map { r =>
           val prev = if (r == 1) "existing" else s"m${r - 1}"
           s"""m$r AS (SELECT coalesce(e.universeId, f.universeId) AS universeId,
              |  CASE WHEN f.universeId IS NOT NULL THEN f.rootPlaceId ELSE e.rootPlaceId END AS rootPlaceId,
              |  CASE WHEN f.universeId IS NOT NULL THEN f.name ELSE e.name END AS name,
              |  coalesce(f.description, e.description) AS description,
              |  e.gameplayDescription AS gameplayDescription,
              |  CASE WHEN f.universeId IS NOT NULL THEN f.playerCount ELSE e.playerCount END AS playerCount
              |FROM $prev e FULL OUTER JOIN f$r f ON e.universeId = f.universeId)""".stripMargin
         }.mkString(",\n")}""".stripMargin

  private def unrolledMergeSql(rounds: Int): String = OracleViews.withGames(
    s"""${mergeCtesSql(rounds)}
       |SELECT * FROM m$rounds ORDER BY universeId""".stripMargin)

  val mergeIncrementalSql: String = unrolledMergeSql(IncRounds)

  /** The historical version `j1_merge_time_travel` reads — mid-history
    * (after round 2 of [[IncRounds]]), so the read provably ignores BOTH
    * a newer committed version and the initial state. */
  private val TimeTravelVersion = 2

  /** `j1_merge_time_travel`: the VERSION-AS-OF gate. Runs the same
    * [[IncRounds]]-round incremental merge with `retainVersions` covering
    * the whole history (a rebuild is skipped when a complete committed
    * history is already on disk — every version is immutable once
    * committed, so reuse is sound), then reads version
    * [[TimeTravelVersion]] via [[readTableAt]] and hash-compares it
    * against the oracle's first-two-merges unroll. Together with
    * `j1_merge_incremental` (latest version ≡ all merges) this pins the
    * full lake contract: every retained manifest is a consistent,
    * reproducible snapshot — the property a training run relies on when
    * it pins its input version. */
  /** Build (or reuse) the full-history incremental table both history
    * readers serve from — every version 0..[[IncRounds]] retained. Reuse
    * is sound: versions are immutable once committed, so a complete
    * on-disk history needs no rebuild. The path is keyed by the corpus
    * FINGERPRINT ([[graft.tools.IndexStore.statePath]] — ADVICE r11 #1):
    * regenerated fixture data or a second corpus sharing a basename gets
    * its own tree instead of silently serving a stale one, stale trees are
    * pruned, and the build is serialized under the store's per-path lock
    * so concurrent first-touchers cannot race the manifest writes. */
  private def ensureHistoryTable(spark: SparkSession, dir: String): String = {
    val tablePath = graft.tools.IndexStore.statePath(spark, dir, "merge-history/games")
    graft.tools.IndexStore.withPathLock(tablePath) {
      val table = new org.apache.hadoop.fs.Path(tablePath)
      val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (committedVersions(fs, table).toList != (0 to IncRounds).toList) {
        upsertIncrementalRounds(
          spark, tablePath,
          existingSnapshot(spark, dir),
          (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
          overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
          coalesceCols = Seq("description"),
          keepCols = Seq("gameplayDescription"),
          buckets = IncBuckets, retainVersions = IncRounds + 1)
      }
      tablePath
    }
  }

  def mergeTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureHistoryTable(spark, dir)
    readTableAt(spark, tablePath, TimeTravelVersion)
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeTimeTravelSql: String = unrolledMergeSql(TimeTravelVersion)

  /** The CDC window `j1_merge_changes` reads: version 1 → [[IncRounds]],
    * so the feed must merge changes ACROSS rounds (a key touched in
    * rounds 2 and 3 emits one row with round 3's post-image) while
    * excluding round 1's — the oracle compares the two snapshot CTEs
    * directly, which encodes exactly that. */
  private val ChangesFromVersion = 1

  /** `j1_merge_changes`: the CHANGE-DATA-FEED gate. Reads the row-level
    * diff between committed versions [[ChangesFromVersion]] and
    * [[IncRounds]] of the history table via [[readChanges]] (manifest-diff
    * bucket pruning + null-safe compare) and hash-compares it against the
    * oracle's direct diff of the corresponding unrolled-merge CTEs. The
    * pruning itself (only changed buckets' files opened, feed-applied-to-
    * v1 ≡ v3, compaction emits zero changes) is MergeSpec-pinned. */
  def mergeChanges(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureHistoryTable(spark, dir)
    readChanges(spark, tablePath, ChangesFromVersion, IncRounds, "universeId")
      .select(col("universeId"), col("op"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeChangesSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT n.universeId,
       |       CASE WHEN o.universeId IS NULL THEN 'insert' ELSE 'update' END AS op,
       |       n.rootPlaceId, n.name, n.description, n.gameplayDescription,
       |       n.playerCount
       |FROM m$IncRounds n LEFT JOIN m$ChangesFromVersion o
       |  ON n.universeId = o.universeId
       |WHERE o.universeId IS NULL
       |   OR n.rootPlaceId IS DISTINCT FROM o.rootPlaceId
       |   OR n.name IS DISTINCT FROM o.name
       |   OR n.description IS DISTINCT FROM o.description
       |   OR n.gameplayDescription IS DISTINCT FROM o.gameplayDescription
       |   OR n.playerCount IS DISTINCT FROM o.playerCount
       |ORDER BY n.universeId""".stripMargin)

  /** `j1_merge_compact`: the OPTIMIZE gate. Runs the same [[IncRounds]]
    * incremental rounds (each leaving a shuffle-partition's worth of files
    * per touched bucket), compacts every bucket to one file, and
    * hash-compares the post-compaction read against the SAME oracle as
    * `j1_merge_incremental` — compaction must be a pure layout change.
    * The COMPACT stats line records files before/after, so the
    * small-file-reduction claim is a printed measurement, not an
    * assertion. */
  def mergeCompact(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-merge-cpt/$base/games"
    upsertIncrementalRounds(
      spark, tablePath,
      // repartition(4) forces multi-file gen dirs at fixture size, so the
      // gate exercises the real rewrite path, not just the no-op branch
      // (the fixture's initial write would otherwise land 1 file/bucket)
      existingSnapshot(spark, dir).repartition(4),
      (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = IncBuckets)
    val st = compact(spark, tablePath)
    println(s"COMPACT version=${st.version} rewritten_buckets=${st.buckets} " +
      s"files_before=${st.filesBefore} files_after=${st.filesAfter}")
    readTable(spark, tablePath)
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  /** `j1_merge_ivm`: INCREMENTAL VIEW MAINTENANCE off the preimage feed.
    * The materialized view — per shard (`universeId % 10`): row count and
    * `sum(coalesce(playerCount, 0))` — is built ONCE by a direct
    * aggregate over version [[ChangesFromVersion]], then each later
    * version refreshes it from its change feed alone:
    *
    *   n_rows   += count(op = insert)
    *   total_pc += Σ coalesce(post, 0) − Σ coalesce(pre, 0)
    *
    * (merge never deletes, so there is no − count term). The maintained
    * view is hash-compared against the oracle's DIRECT aggregate over the
    * final merge state — the IVM correctness claim, exact because the
    * arithmetic is integral. Cost shape at 100 TB: each refresh
    * aggregates ONLY the feed's rows (∝ changes, already bucket-pruned by
    * [[readChanges]]) plus a |shards|-row join against the view — the
    * full-table aggregate is paid exactly once, at view creation. This is
    * what CDC preimages are FOR: without `pre_playerCount` the update
    * delta is uncomputable and the view would re-scan the table every
    * refresh. */
  private def ivmSharded(df: DataFrame): DataFrame =
    df.withColumn("shard", pmod(col("universeId"), lit(10L)))

  /** The view's creation aggregate — one full pass over a snapshot. */
  def ivmBaseAgg(snapshot: DataFrame): DataFrame =
    ivmSharded(snapshot).groupBy(col("shard")).agg(
      count(lit(1)).as("n_rows"),
      sum(coalesce(col("playerCount"), lit(0L))).as("total_pc"))

  /** Per-shard deltas from a preimage feed — the SAME expression tree the
    * streaming twin (StreamingIvmView) runs in complete mode, so batch
    * refresh ≡ live maintenance by construction. Round 13: the −f(pre)
    * DELETE term — a delete row subtracts one from the count, and its
    * null post-image already contributes 0 to the post sum while its
    * preimage is subtracted, so the sum term needs no branch. */
  def ivmDeltaAgg(changes: DataFrame): DataFrame =
    ivmSharded(changes).groupBy(col("shard")).agg(
      sum(when(col("op") === "insert", 1L)
        .when(col("op") === "delete", -1L).otherwise(0L)).as("d_rows"),
      (sum(coalesce(col("playerCount"), lit(0L))) -
        sum(coalesce(col("pre_playerCount"), lit(0L)))).as("d_pc"))

  // -------------------------------------------------------------------
  // NON-INVERTIBLE IVM (round-13 verdict #6): count/sum views refresh by
  // pure algebra (±1 row, ±f(pre)), but a DELETE of a group's current
  // MIN/MAX cannot be maintained incrementally — the new extremum is not
  // in the feed. Standard IVM practice: maintain candidates from the
  // feed; when an extremum-carrying row LEAVES a group (a delete/update
  // whose preimage ties the group's current extremum), mark the group
  // dirty and recompute ONLY those groups from the table. Clean groups
  // stay change-priced; the recompute prices the dirty groups' rows —
  // at 100 TB with group keys aligned to a clustered column that scan is
  // itself file-skippable.
  // -------------------------------------------------------------------

  /** The min/max view's creation aggregate — one full pass. */
  def ivmMinMaxBase(snapshot: DataFrame): DataFrame =
    ivmSharded(snapshot).groupBy(col("shard")).agg(
      max(col("playerCount")).as("mx_pc"),
      min(col("playerCount")).as("mn_pc"))

  /** Per-shard candidates and evictions from one preimage feed — the
    * SAME expression tree the streaming twin runs in complete mode.
    * `cand_*`: extrema over surviving post-images (inserts + update
    * posts); `evict_*`: extrema over departed preimages (deletes +
    * update pres). A cumulative (multi-version) feed is handled by the
    * same algebra: any departed candidate shows up in `evict_*`, so the
    * dirty test below catches it (see [[ivmMinMaxApply]]). */
  def ivmMinMaxDelta(changes: DataFrame): DataFrame =
    ivmSharded(changes).groupBy(col("shard")).agg(
      max(when(col("op") =!= "delete", col("playerCount"))).as("cand_mx"),
      min(when(col("op") =!= "delete", col("playerCount"))).as("cand_mn"),
      max(when(col("op") =!= "insert", col("pre_playerCount"))).as("evict_mx"),
      min(when(col("op") =!= "insert", col("pre_playerCount"))).as("evict_mn"),
      // deletes of NULL-valued rows are invisible to the eviction extrema
      // (max/min ignore null) but can still empty an all-null group — the
      // dirty test needs the count
      sum(when(col("op") === "delete", 1L).otherwise(0L)).as("n_del"))

  /** Fold one min/max delta into the view. A shard is DIRTY when a
    * departed preimage reaches the view's current extremum (`evict_mx >=
    * mx_pc` — the extremum row may have left; `>=` also covers a departed
    * later-round candidate exceeding it, which makes the fold correct for
    * cumulative feeds). Clean shards update as greatest/least(view,
    * candidates) — exact, because every departed row is then strictly
    * inside the kept range. Dirty shards recompute from `tableNow`
    * restricted to them (left-semi on the |dirty-shards| keys); a fully
    * deleted shard recomputes to no row and leaves the view, matching the
    * direct aggregate. */
  def ivmMinMaxApply(view: DataFrame, delta: DataFrame,
      tableNow: DataFrame): DataFrame = {
    val merged = view.alias("v").join(delta.alias("d"), Seq("shard"), "full_outer")
      .select(col("shard"),
        col("v.mx_pc").as("mx_pc"), col("v.mn_pc").as("mn_pc"),
        col("d.cand_mx").as("cand_mx"), col("d.cand_mn").as("cand_mn"),
        ((col("d.evict_mx").isNotNull && col("mx_pc").isNotNull &&
          col("d.evict_mx") >= col("mx_pc")) ||
         (col("d.evict_mn").isNotNull && col("mn_pc").isNotNull &&
          col("d.evict_mn") <= col("mn_pc")) ||
         // a NULL view extremum means the shard is view-absent OR an
         // all-null group — either way ANY departure (non-null eviction,
         // or a delete of a null-valued row, which the eviction extrema
         // can't see) may have emptied or reshaped it: recompute
         (col("mx_pc").isNull && (col("d.evict_mx").isNotNull ||
           col("d.evict_mn").isNotNull ||
           coalesce(col("d.n_del"), lit(0L)) > 0))).as("dirty"))
    val clean = merged.filter(!col("dirty"))
      .select(col("shard"),
        greatest(col("mx_pc"), col("cand_mx")).as("mx_pc"),
        least(col("mn_pc"), col("cand_mn")).as("mn_pc"))
    val dirtyShards = merged.filter(col("dirty")).select(col("shard"))
    val recomputed = ivmMinMaxBase(
      ivmSharded(tableNow).join(broadcast(dirtyShards), Seq("shard"), "left_semi")
        .drop("shard"))
    clean.unionByName(recomputed)
  }

  /** `j1_merge_ivm_minmax`: the non-invertible-IVM gate. Per-shard
    * min/max over playerCount, created at version [[ChangesFromVersion]]
    * and refreshed through every later feed INCLUDING the delete version
    * — the recompute-on-evict fallback must land it exactly on the
    * oracle's direct aggregate over the post-delete state (MergeSpec pins
    * a deterministic extremum eviction; the gate pins the end-to-end
    * algebra on the shared delete-history table). */
  def mergeIvmMinMax(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureDeleteHistoryTable(spark, dir)
    val base = ivmMinMaxBase(readTableAt(spark, tablePath, ChangesFromVersion))
    ((ChangesFromVersion + 1) to DeleteVersion).foldLeft(base)((view, v) =>
      ivmMinMaxApply(view,
        ivmMinMaxDelta(readChanges(spark, tablePath, v - 1, v, "universeId",
          withPreimage = true)),
        readTableAt(spark, tablePath, v)))
      .orderBy(col("shard"))
  }

  /** Fold one delta frame into the view (|shards|-row join). */
  def ivmApply(view: DataFrame, delta: DataFrame): DataFrame =
    view.join(delta, Seq("shard"), "full_outer")
      .select(col("shard"),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("total_pc"), lit(0L)) +
          coalesce(col("d_pc"), lit(0L))).as("total_pc"))

  def mergeIvm(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureHistoryTable(spark, dir)
    val base = ivmBaseAgg(readTableAt(spark, tablePath, ChangesFromVersion))
    val deltas = ((ChangesFromVersion + 1) to IncRounds).map(v =>
      ivmDeltaAgg(readChanges(spark, tablePath, v - 1, v, "universeId",
        withPreimage = true)))
    deltas.foldLeft(base)(ivmApply).orderBy(col("shard"))
  }

  val mergeIvmSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT universeId % 10 AS shard,
       |       count(*) AS n_rows,
       |       CAST(sum(coalesce(playerCount, 0)) AS BIGINT) AS total_pc
       |FROM m$IncRounds
       |GROUP BY 1
       |ORDER BY shard""".stripMargin)

  /** The point-read key set: present-at-every-fixture ids spanning several
    * buckets, plus one id (7) that is ABSENT at every fixture (7 % 3 = 1
    * and odd, so neither snapshot carries it, and no refresh round does) —
    * the no-false-negative side AND the prune-to-zero side in one probe. */
  private val PointIds = Seq(3L, 21L, 35L, 64L, 7L)

  /** `j1_merge_point_read`: the BLOOM-SKIPPING gate. Runs the incremental
    * rounds, clusters on playerCount with a universeId Bloom sidecar (the
    * min/max stats CANNOT prune this read — every file's universeId range
    * covers the probe ids; that is the point of the sidecar), then reads
    * `universeId IN (PointIds)` through [[readTableWhereIn]] — the pruned
    * rows must hash-match the oracle's filtered unrolled merge. The
    * POINTREAD line prints files kept/total; the file-count assertions
    * (including zero files for an absent key, and the stale-sidecar
    * fallback) live in MergeSpec. */
  def mergePointRead(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-merge-point/$base/games"
    upsertIncrementalRounds(
      spark, tablePath,
      existingSnapshot(spark, dir),
      (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = IncBuckets)
    cluster(spark, tablePath, "playerCount", filesPerBucket = 4,
      bloomCols = Seq("universeId"))
    val pruned = readTableWhereIn(spark, tablePath, "universeId", PointIds)
    val total = readTable(spark, tablePath).inputFiles.length
    println(s"POINTREAD files_kept=${pruned.inputFiles.length} files_total=$total")
    pruned
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergePointReadSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT * FROM m$IncRounds
       |WHERE universeId IN (${PointIds.mkString(", ")})
       |ORDER BY universeId""".stripMargin)

  /** The delete predicate the takedown gates use: 1-in-20 keys — sparse
    * (a takedown batch, not a truncation), hits updated keys (id 3 is a
    * round-3 re-crawl) and leaves every (universeId % 10) IVM shard
    * populated, so the maintained view's row set still matches a direct
    * GROUP BY. */
  private val DelMod = 20L
  private val DelRes = 3L
  private val DeleteVersion = IncRounds + 1

  /** Build (or reuse) the history-plus-delete table the takedown gates
    * serve from: the [[IncRounds]] merge history, then [[deleteWhere]]
    * (`universeId % DelMod = DelRes`) as version [[DeleteVersion]], every
    * version retained. Same fingerprint-keyed reuse rule as
    * [[ensureHistoryTable]]. */
  private def ensureDeleteHistoryTable(spark: SparkSession, dir: String): String = {
    val tablePath = graft.tools.IndexStore.statePath(spark, dir, "merge-history-del/games")
    graft.tools.IndexStore.withPathLock(tablePath) {
      val table = new org.apache.hadoop.fs.Path(tablePath)
      val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (committedVersions(fs, table).toList != (0 to DeleteVersion).toList) {
        upsertIncrementalRounds(
          spark, tablePath,
          existingSnapshot(spark, dir),
          (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
          overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
          coalesceCols = Seq("description"),
          keepCols = Seq("gameplayDescription"),
          buckets = IncBuckets, retainVersions = DeleteVersion + 1)
        val st = deleteWhere(spark, tablePath,
          col("universeId") % DelMod === DelRes,
          retainVersions = DeleteVersion + 1)
        println(s"MERGEDEL version=${st.version} touched=${st.touchedBuckets}" +
          s"/$IncBuckets deleted_rows=${st.deletedRows} " +
          s"rewritten_bytes=${st.rewrittenBytes} table_bytes=${st.tableBytes}")
      }
      tablePath
    }
  }

  /** `j1_merge_delete`: THE row-level-delete gate. Runs the merge history
    * plus a [[deleteWhere]] takedown, reads the final table, and
    * hash-compares it against the oracle's unrolled merges FILTERED by the
    * delete predicate — copy-on-write touched-bucket rewrite ≡ logical
    * DELETE, with untouched buckets never rewritten (MergeSpec pins the
    * file-level claim plus time travel across the delete and the
    * retention VACUUM of the deleted rows). */
  def mergeDelete(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureDeleteHistoryTable(spark, dir)
    readTable(spark, tablePath)
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeDeleteSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT * FROM m$IncRounds
       |WHERE NOT (universeId % $DelMod = $DelRes)
       |ORDER BY universeId""".stripMargin)

  /** `j1_merge_changes_delete`: the CDC-covers-deletes gate. Reads the
    * change feed across the delete version — every deleted key must
    * surface as `op = delete` with NULL post-image columns and its full
    * preimage (what the maintainer cascade consumes) — and hash-compares
    * it against the oracle's filtered pre-delete state. */
  def mergeChangesDelete(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureDeleteHistoryTable(spark, dir)
    readChanges(spark, tablePath, IncRounds, DeleteVersion, "universeId",
      withPreimage = true)
      .select(col("universeId"), col("op"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"),
        col("pre_rootPlaceId"), col("pre_name"), col("pre_description"),
        col("pre_gameplayDescription"), col("pre_playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeChangesDeleteSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT universeId, 'delete' AS op,
       |       CAST(NULL AS BIGINT) AS rootPlaceId,
       |       CAST(NULL AS VARCHAR) AS name,
       |       CAST(NULL AS VARCHAR) AS description,
       |       CAST(NULL AS VARCHAR) AS gameplayDescription,
       |       CAST(NULL AS BIGINT) AS playerCount,
       |       rootPlaceId AS pre_rootPlaceId,
       |       name AS pre_name,
       |       description AS pre_description,
       |       gameplayDescription AS pre_gameplayDescription,
       |       playerCount AS pre_playerCount
       |FROM m$IncRounds
       |WHERE universeId % $DelMod = $DelRes
       |ORDER BY universeId""".stripMargin)

  /** `j1_merge_ivm_delete`: the view-maintenance-under-deletes gate. The
    * per-shard view is created at version [[ChangesFromVersion]] and
    * refreshed through every later feed INCLUDING the delete version —
    * the −1-row / −f(pre) terms must land it exactly on the oracle's
    * direct aggregate over the post-delete state. */
  def mergeIvmDelete(spark: SparkSession, dir: String): DataFrame = {
    val tablePath = ensureDeleteHistoryTable(spark, dir)
    val base = ivmBaseAgg(readTableAt(spark, tablePath, ChangesFromVersion))
    val deltas = ((ChangesFromVersion + 1) to DeleteVersion).map(v =>
      ivmDeltaAgg(readChanges(spark, tablePath, v - 1, v, "universeId",
        withPreimage = true)))
    deltas.foldLeft(base)(ivmApply).orderBy(col("shard"))
  }

  val mergeIvmMinMaxSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT universeId % 10 AS shard,
       |       max(playerCount) AS mx_pc,
       |       min(playerCount) AS mn_pc
       |FROM m$IncRounds
       |WHERE NOT (universeId % $DelMod = $DelRes)
       |GROUP BY 1
       |ORDER BY shard""".stripMargin)

  val mergeIvmDeleteSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT universeId % 10 AS shard,
       |       count(*) AS n_rows,
       |       CAST(sum(coalesce(playerCount, 0)) AS BIGINT) AS total_pc
       |FROM m$IncRounds
       |WHERE NOT (universeId % $DelMod = $DelRes)
       |GROUP BY 1
       |ORDER BY shard""".stripMargin)

  /** The skipping window: wide enough to keep rows from every merge round
    * (the oracle must exercise the full policy mix), narrow enough that
    * most range-split files prune. */
  private val SkipLo = 10L
  private val SkipHi = 59L

  /** `j1_merge_skipping`: the DATA-SKIPPING gate. Runs the incremental
    * rounds, CLUSTERs the table on playerCount (range-split files +
    * per-file stats sidecar), then reads `playerCount BETWEEN
    * [[SkipLo]] AND [[SkipHi]]` through [[readTableWhere]] — the pruned
    * read's rows must hash-match the oracle's filtered unrolled merge,
    * which proves clustering changed LAYOUT ONLY and pruning dropped no
    * matching row. The SKIP stats line prints files kept/total so the
    * pruning is a printed measurement; the file-level assertion lives in
    * MergeSpec. */
  def mergeSkipping(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-merge-skip/$base/games"
    upsertIncrementalRounds(
      spark, tablePath,
      existingSnapshot(spark, dir),
      (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = IncBuckets)
    cluster(spark, tablePath, "playerCount", filesPerBucket = 4)
    val pruned = readTableWhere(spark, tablePath, "playerCount", SkipLo, SkipHi)
    val total = readTable(spark, tablePath).inputFiles.length
    println(s"SKIP files_kept=${pruned.inputFiles.length} files_total=$total")
    pruned
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeSkippingSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT * FROM m$IncRounds
       |WHERE playerCount BETWEEN $SkipLo AND $SkipHi
       |ORDER BY universeId""".stripMargin)

  /** The Z gate's two windows — each SELECTIVE on its own axis (~25–40 %),
    * jointly keeping ~30 rows at every fixture. Selectivity matters for
    * the control comparison, not just row count: z-order trades each
    * axis's locality for the conjunction's, so a z rectangle only beats
    * one-dimension clustering when both predicates are selective (at
    * 60 %-wide windows the measured fixture read was z 61 vs 1d 45 files
    * — the z curve's intervals overlap most files while the 1d layout's
    * single wide range still clips). That regime dependence is real lake
    * behavior, worth encoding in the gate's dial rather than hiding. */
  private val ZSkipPcLo = 150L
  private val ZSkipPcHi = 299L
  private val ZSkipIdLo = 50L
  private val ZSkipIdHi = 249L

  /** `j1_merge_skipping_z`: the Z-ORDER gate (round-11 verdict #5 —
    * one-dimension clustering prunes on playerCount only; real lake
    * tables skip on 2+ predicates). Runs the incremental rounds, clusters
    * on the INTERLEAVED-BITS key of (playerCount, universeId), reads the
    * two-predicate range through [[readTableWhereAll]] — the pruned rows
    * must hash-match the oracle's two-predicate filtered unrolled merge
    * (layout-only + no dropped row, the same proof shape as
    * `j1_merge_skipping`). The SKIPZ line also prices the CONTROL: the
    * same two-predicate read against the one-dimension playerCount
    * layout, whose universeId predicate cannot prune — files_kept_z vs
    * files_kept_1d is the measured multi-column win. */
  def mergeSkippingZ(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-merge-skipz/$base/games"
    upsertIncrementalRounds(
      spark, tablePath,
      existingSnapshot(spark, dir),
      (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = IncBuckets)
    val preds = Seq(("playerCount", ZSkipPcLo, ZSkipPcHi),
      ("universeId", ZSkipIdLo, ZSkipIdHi))
    // control first: one-dimension layout, same two-predicate read
    cluster(spark, tablePath, "playerCount", filesPerBucket = 4)
    val files1d = readTableWhereAll(spark, tablePath, preds).inputFiles.length
    clusterZ(spark, tablePath, Seq("playerCount", "universeId"), filesPerBucket = 4)
    val pruned = readTableWhereAll(spark, tablePath, preds)
    val total = readTable(spark, tablePath).inputFiles.length
    println(s"SKIPZ files_kept_z=${pruned.inputFiles.length} " +
      s"files_kept_1d=$files1d files_total=$total")
    pruned
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"), col("playerCount"))
      .orderBy(col("universeId"))
  }

  val mergeSkippingZSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT * FROM m$IncRounds
       |WHERE playerCount BETWEEN $ZSkipPcLo AND $ZSkipPcHi
       |  AND universeId BETWEEN $ZSkipIdLo AND $ZSkipIdHi
       |ORDER BY universeId""".stripMargin)

  /** The string-Z gate's windows: `name` is the documents' first four
    * words (lowercase), so a lexicographic ['ma','mz'] band is the
    * takedown-audit shape (every name under a prefix) at a few percent
    * selectivity; the numeric co-window keeps the mixed face from
    * degenerating to the string face. Collation note: BOTH engines
    * compare binary UTF-8 here (Spark UTF8_BINARY, DuckDB's default),
    * the same ordering the stats fragments store. */
  private val ZsNameLo = "ma"
  private val ZsNameHi = "mz"
  private val ZsPcLo = 0L
  private val ZsPcHi = 49L

  /** `j1_merge_skipping_zs`: the STRING-Z READ gate (round 18, verdict
    * r17 #2 — the round-17 string-Z layout and `readTableWhereMixed`
    * were spec-pinned but had no oracle row, unlike their numeric twin).
    * Runs the incremental rounds, Z-clusters on (name, playerCount) —
    * the string dimension rank-normalized via [[StringRankBucket]] —
    * then reads BOTH round-17 faces through the fragment-pruned path:
    * the takedown-shaped string WHERE ([[readTableWhereStrings]]) and
    * the mixed numeric+string WHERE ([[readTableWhereMixed]]), returned
    * as one tagged union so a single hash gate covers both. Layout is
    * result-invariant, so the oracle is the same unrolled merge with
    * the matching WHEREs — zero drift IS the claim, exactly
    * `j1_merge_skipping_z`'s proof shape. The SKIPZS line prices the
    * pruning (files kept per face vs total); the strictly-fewer-files
    * and control assertions live in MergeSpec. */
  def mergeSkippingZs(spark: SparkSession, dir: String): DataFrame = {
    val base = new java.io.File(dir).getName
    val tablePath =
      s"${System.getProperty("java.io.tmpdir")}/graft-merge-skipzs/$base/games"
    upsertIncrementalRounds(
      spark, tablePath,
      existingSnapshot(spark, dir),
      (1 to IncRounds).map(freshRound(spark, dir, _)), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"),
      buckets = IncBuckets)
    clusterZ(spark, tablePath, Seq("name", "playerCount"), filesPerBucket = 4)
    val str = readTableWhereStrings(spark, tablePath,
      Seq(("name", ZsNameLo, ZsNameHi)))
    val mixed = readTableWhereMixed(spark, tablePath,
      Seq(("playerCount", ZsPcLo, ZsPcHi)), Seq(("name", ZsNameLo, ZsNameHi)))
    val total = readTable(spark, tablePath).inputFiles.length
    println(s"SKIPZS files_kept_str=${str.inputFiles.length} " +
      s"files_kept_mixed=${mixed.inputFiles.length} files_total=$total")
    val outCols = Seq(col("universeId"), col("rootPlaceId"), col("name"),
      col("description"), col("gameplayDescription"), col("playerCount"))
    str.select(lit("str").as("face") +: outCols: _*)
      .unionByName(mixed.select(lit("mixed").as("face") +: outCols: _*))
      .orderBy(col("face"), col("universeId"))
  }

  val mergeSkippingZsSql: String = OracleViews.withGames(
    s"""${mergeCtesSql(IncRounds)}
       |SELECT 'str' AS face, universeId, rootPlaceId, name, description,
       |       gameplayDescription, playerCount
       |FROM m$IncRounds
       |WHERE name BETWEEN '$ZsNameLo' AND '$ZsNameHi'
       |UNION ALL
       |SELECT 'mixed' AS face, universeId, rootPlaceId, name, description,
       |       gameplayDescription, playerCount
       |FROM m$IncRounds
       |WHERE name BETWEEN '$ZsNameLo' AND '$ZsNameHi'
       |  AND playerCount BETWEEN $ZsPcLo AND $ZsPcHi
       |ORDER BY face, universeId""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_merge_upsert" -> mergeBase,
    "j1bc_merge_variants" -> mergeVariants,
    "j1_merge_incremental" -> mergeIncremental,
    "j1_merge_time_travel" -> mergeTimeTravel,
    "j1_merge_compact" -> mergeCompact,
    "j1_merge_changes" -> mergeChanges,
    "j1_merge_skipping" -> mergeSkipping,
    "j1_merge_skipping_z" -> mergeSkippingZ,
    "j1_merge_skipping_zs" -> mergeSkippingZs,
    "j1_merge_ivm" -> mergeIvm,
    "j1_merge_delete" -> mergeDelete,
    "j1_merge_changes_delete" -> mergeChangesDelete,
    "j1_merge_ivm_delete" -> mergeIvmDelete,
    "j1_merge_ivm_minmax" -> mergeIvmMinMax,
    "j1_merge_point_read" -> mergePointRead
  )

  val oracles: Map[String, String] = Map(
    "j1_merge_upsert" -> mergeBaseSql,
    "j1bc_merge_variants" -> mergeVariantsSql,
    "j1_merge_incremental" -> mergeIncrementalSql,
    "j1_merge_time_travel" -> mergeTimeTravelSql,
    // compaction is a pure layout change — the incremental oracle IS its
    // oracle (the f6 indexed-variant convention: shared oracle text)
    "j1_merge_compact" -> mergeIncrementalSql,
    "j1_merge_changes" -> mergeChangesSql,
    "j1_merge_skipping" -> mergeSkippingSql,
    "j1_merge_skipping_z" -> mergeSkippingZSql,
    "j1_merge_skipping_zs" -> mergeSkippingZsSql,
    "j1_merge_ivm" -> mergeIvmSql,
    "j1_merge_delete" -> mergeDeleteSql,
    "j1_merge_changes_delete" -> mergeChangesDeleteSql,
    "j1_merge_ivm_delete" -> mergeIvmDeleteSql,
    "j1_merge_ivm_minmax" -> mergeIvmMinMaxSql,
    "j1_merge_point_read" -> mergePointReadSql
  )
}
