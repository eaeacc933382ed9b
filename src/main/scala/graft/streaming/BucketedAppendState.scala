package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** Per-commit accounting of [[BucketedAppendState]]. */
final case class BucketedCommitStats(
    version: Long, touchedBuckets: Int, totalBuckets: Int,
    writtenBytes: Long, stateBytes: Long)

/** Manifest-committed, key-bucketed, APPEND-only copy-on-write state —
  * the vector-index maintainers' storage refit (round-11 verdict #1,
  * second half: the postings measurement confirmed written-bytes ∝
  * changes, so the NSW/IVF maintainers get the same swap). Their state
  * grows strictly by appends keyed by vector id — `Nsw.insertKnn` only
  * adds edges FROM new nodes and the symmetrize overlay is serve-time, so
  * a delta commit is even simpler than the postings store's
  * delete-insert: touched buckets = buckets of the delta's keys; each
  * touched bucket's new generation = its old rows plus the delta's.
  *
  * Layout (one manifest covering every keyed table, so a served
  * vectors/knn pair can never tear):
  *
  * {{{
  * root/<table>/bucket=<b>/gen=<g>/    keyed tables (key-hash buckets)
  * root/<table>-v<v>/                  small tables (rewritten whole)
  * root/_manifests/manifest-v<v>       "table,bucket,gen" lines; rename
  * }}}
  *
  * Small tables (IVF's K-row centroid frame) are declared `small` and
  * rewritten per version — driver-sized by design, the documented k-means
  * boundary. Corpus-sized retrains go through [[commitFull]]: every
  * bucket gets a new generation, priced honestly as the rare amortized
  * rewrite it is.
  *
  * Readers need no key map: [[readAt]] resolves keyed tables through the
  * manifest and small tables by directory — a serving process
  * ([[NswIndexServer]]) constructs this read-only. Version semantics,
  * replay no-ops, retention, and crash windows mirror
  * [[BucketedPostingsState]].
  */
final class BucketedAppendState(spark: SparkSession, rootDir: String,
    buckets: Int = 16, keyed: Map[String, String] = Map.empty,
    keepVersions: Int = 3,
    hooks: Merge.IncHooks = Merge.IncHooks.none) extends Serializable {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")

  private val root = new Path(rootDir)
  @transient private lazy val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manifestDir = new Path(root, "_manifests")
  private def genPath(table: String, b: Int, g: Long) =
    new Path(root, s"$table/bucket=$b/gen=$g")
  private def smallPath(table: String, v: Long) = new Path(root, s"$table-v$v")

  private def bucketOf(key: String) =
    pmod(xxhash64(col(key)), lit(buckets.toLong)).cast("int")

  // ------------------------------------------------------------- manifests

  def committedVersions: Seq[Long] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName).toSeq
      .filter(_.startsWith("manifest-v")).map(_.stripPrefix("manifest-v").toLong)
      .sorted

  def latest: Option[Long] = committedVersions.lastOption

  /** table → (bucket → gen) */
  private def readManifestAt(version: Long): Map[String, Map[Int, Long]] = {
    val p = new Path(manifestDir, s"manifest-v$version")
    require(fs.exists(p),
      s"state version $version is expired or never committed " +
        s"(retained: ${committedVersions.mkString(",")})")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(t, b, g) = l.split(','); (t, b.toInt, g.toLong)
    }.toSeq.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(r => r._2 -> r._3).toMap }
  }

  private def commitManifest(version: Long,
      state: Map[String, Map[Int, Long]]): Unit = {
    fs.mkdirs(manifestDir)
    val tmp = new Path(manifestDir, s".tmp-manifest-v$version")
    val out = fs.create(tmp, true)
    try out.write(state.toSeq.sortBy(_._1).flatMap { case (t, m) =>
      m.toSeq.sorted.map { case (b, g) => s"$t,$b,$g" } }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new Path(manifestDir, s"manifest-v$version")
    fs.delete(fin, false)
    require(fs.rename(tmp, fin), s"manifest commit failed: $fin")
  }

  // ----------------------------------------------------------------- reads

  def read(name: String): DataFrame =
    readAt(name, latest.getOrElse(sys.error(s"no committed state under $rootDir")))

  /** Keyed tables resolve through the manifest (explicit committed gen
    * paths); anything else is a small table at its version dir. */
  def readAt(name: String, version: Long): DataFrame = {
    val m = readManifestAt(version)
    m.get(name) match {
      case Some(state) if state.nonEmpty =>
        val paths = state.toSeq.sorted.map { case (b, g) =>
          s"$rootDir/$name/bucket=$b/gen=$g" }
        spark.read.option("basePath", s"$rootDir/$name").parquet(paths: _*)
          .drop("bucket", "gen")
      case _ =>
        spark.read.parquet(smallPath(name, version).toString)
    }
  }

  def versionsOf(name: String): Seq[Long] = committedVersions

  // ---------------------------------------------------------------- writes

  private def dirBytes(p: Path): Long =
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).map(st =>
      if (st.isDirectory) dirBytes(st.getPath) else st.getLen).sum

  private def writeKeyedGen(version: Long, table: String, key: String,
      rows: DataFrame, touched: Seq[Int], align: Boolean): Seq[Int] = {
    touched.foreach(b => fs.delete(genPath(table, b, version), true))
    val bucketed = rows.withColumn("bucket", bucketOf(key))
    (if (align) bucketed.repartition(col("bucket")) else bucketed)
      .withColumn("gen", lit(version))
      .write.mode("append").partitionBy("bucket", "gen")
      .parquet(s"$rootDir/$table")
    touched.filter(b => fs.exists(genPath(table, b, version)))
  }

  private def stats(version: Long, touchedPerTable: Map[String, Seq[Int]],
      committed: Map[String, Map[Int, Long]],
      smallWritten: Seq[String]): BucketedCommitStats = {
    val written = touchedPerTable.map { case (t, bs) =>
      bs.map(b => dirBytes(genPath(t, b, version))).sum }.sum +
      smallWritten.map(t => dirBytes(smallPath(t, version))).sum
    val total = committed.map { case (t, m) =>
      m.map { case (b, g) => dirBytes(genPath(t, b, g)) }.sum }.sum +
      smallWritten.map(t => dirBytes(smallPath(t, version))).sum
    val touched = touchedPerTable.values.map(_.length).sum
    BucketedCommitStats(version, touched, committed.values.map(_.size).sum,
      written, total)
  }

  /** Full write of every table at `version` — bootstrap and retrain-style
    * rewrites (corpus-sized by nature, amortized; aligned bulk load). */
  def commitFull(version: Long,
      tables: Map[String, DataFrame]): BucketedCommitStats = {
    val touchedPerTable = keyed.collect { case (t, key) if tables.contains(t) =>
      t -> writeKeyedGen(version, t, key, tables(t), (0 until buckets), align = true)
    }
    val smallWritten = tables.keys.filterNot(keyed.contains).toSeq
    smallWritten.foreach { t =>
      tables(t).write.mode("overwrite").parquet(smallPath(t, version).toString) }
    val committed = touchedPerTable.map { case (t, bs) =>
      t -> bs.map(_ -> version).toMap }
    hooks.beforeCommit(version.toInt)
    commitManifest(version, committed)
    hooks.afterCommit(version.toInt)
    sweepRetention(version)
    stats(version, touchedPerTable, committed, smallWritten)
  }

  /** One append-only delta commit: per keyed table, touched buckets =
    * buckets of the delta's keys; per touched bucket, new gen = old rows
    * ++ delta rows. Small tables in `deltas` are rewritten whole. Returns
    * None when `version` is already committed (replay no-op). */
  def commitAppend(version: Long,
      deltas: Map[String, DataFrame]): Option[BucketedCommitStats] = {
    if (latest.exists(_ >= version)) return None
    val current = readManifestAt(latest.getOrElse(
      sys.error(s"commitAppend before bootstrap under $rootDir")))
    val touchedPerTable = keyed.collect { case (t, key) if deltas.contains(t) =>
      val delta = deltas(t).withColumn("bucket", bucketOf(key))
      val touched = delta.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      val oldEntries = current.getOrElse(t, Map.empty)
        .filter { case (b, _) => touched.contains(b) }
      val oldRows =
        if (oldEntries.isEmpty) delta.drop("bucket").limit(0)
        else spark.read.option("basePath", s"$rootDir/$t")
          .parquet(oldEntries.toSeq.sorted.map { case (b, g) =>
            s"$rootDir/$t/bucket=$b/gen=$g" }: _*)
          .drop("bucket", "gen")
      val newRows = oldRows.unionByName(delta.drop("bucket"))
      t -> writeKeyedGen(version, t, key, newRows, touched, align = false)
    }
    val smallWritten = deltas.keys.filterNot(keyed.contains).toSeq
    smallWritten.foreach { t =>
      deltas(t).write.mode("overwrite").parquet(smallPath(t, version).toString) }
    val committed = current.map { case (t, m) =>
      t -> ((m -- touchedPerTable.getOrElse(t, Seq.empty)) ++
        touchedPerTable.getOrElse(t, Seq.empty).map(_ -> version))
    }
    hooks.beforeCommit(version.toInt)
    commitManifest(version, committed)
    hooks.afterCommit(version.toInt)
    sweepRetention(version)
    Some(stats(version, touchedPerTable, committed, smallWritten))
  }

  /** Keep the last `keepVersions` manifests, every generation they
    * reference, and their small-table dirs; delete the rest. */
  private def sweepRetention(version: Long): Unit = {
    val keepFrom = math.max(0L, version - keepVersions + 1)
    val kept = committedVersions.filter(v => v >= keepFrom && v <= version)
    val live: Set[(String, Int, Long)] = kept
      .flatMap(v => readManifestAt(v).toSeq.flatMap { case (t, m) =>
        m.toSeq.map { case (b, g) => (t, b, g) } }).toSet
    keyed.keys.foreach { t =>
      val tdir = new Path(root, t)
      if (fs.exists(tdir))
        fs.listStatus(tdir).filter(_.getPath.getName.startsWith("bucket="))
          .foreach { bs =>
            val b = bs.getPath.getName.stripPrefix("bucket=").toInt
            fs.listStatus(bs.getPath).filter(_.getPath.getName.startsWith("gen="))
              .foreach { gs =>
                val g = gs.getPath.getName.stripPrefix("gen=").toLong
                if (!live.contains((t, b, g))) fs.delete(gs.getPath, true)
              }
          }
    }
    // small tables: one dir per version, expired with their manifests
    val smallDir = "^(.+)-v(\\d+)$".r
    fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case smallDir(_, v) if v.toLong < keepFrom => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    fs.listStatus(manifestDir).map(_.getPath)
      .filter(p => p.getName.startsWith("manifest-v") &&
        p.getName.stripPrefix("manifest-v").toLong < keepFrom)
      .foreach(p => fs.delete(p, false))
  }
}
