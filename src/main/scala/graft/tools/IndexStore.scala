package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted index artifacts — the BATCH analogue of the streaming
  * indexes' [[graft.streaming.VersionedState]]: trained/built index
  * structures (graph edge tables, k-means centroids, PQ codebooks) live as
  * parquet tables keyed by the corpus they were built from, with an
  * explicit build step (`rebuild`, driven by the `index_build_*` queries)
  * and a read-through serve path (`readOrBuild`).
  *
  * Why this exists (round-7 verdict #1): with only in-memory sharing, every
  * suite run rebuilt every artifact, and the build cost was billed to
  * whichever query ran first alphabetically — `ann_nsw_nnd_search` paid the
  * NN-descent graph build that `ann_recall` then reused, so per-query bench
  * numbers moved ±150% between rounds while family sums stayed flat. With
  * the store, `index_build_*` bench entries pay (and name) the build cost,
  * and search queries only ever pay a parquet read. This is exactly how a
  * 100 TB deployment treats an index: a materialized table with its own
  * build pipeline, not a side effect of the first query to need it.
  *
  * Keying: `root/v{FormatVersion}/{corpus-basename}-{fingerprint}/{name}`,
  * where the fingerprint hashes the embeddings parquet's file listing
  * (names, sizes, mtimes) — regenerated test data invalidates artifacts
  * automatically. Dial values that parameterize a build (e.g. LSH planes)
  * belong in the artifact NAME; bump [[FormatVersion]] on algorithm
  * changes. A stale artifact that slips through cannot pass silently: the
  * DuckDB oracle rebuilds from scratch, so the hash compare catches it.
  *
  * Writes go to a temp dir and rename into place (same commit shape as
  * VersionedState), under a per-path JVM lock; readers only see committed
  * (`_SUCCESS`-bearing) dirs.
  */
object IndexStore {

  /** Bump when an index-building algorithm changes in a way the artifact
    * name doesn't encode. v2: `Pq.sizedDials` replaced the K-only sized
    * code budget — stored codebook artifacts for grown corpora now carry
    * a different (M, K) geometry. v3: `IvfKMeans.sizedCells` sizes the
    * coarse quantizer above fixture scale — the quantizer artifact name
    * carries the dial, but the cell-edge/residual-codebook artifacts
    * derived FROM it do not, so their stored content changed for grown
    * corpora. */
  val FormatVersion = 3

  private def root: String = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft-index-store")

  private val fingerprints = scala.collection.concurrent.TrieMap.empty[String, String]
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Cheap corpus fingerprint: MD5 over the file listings (name, length,
    * mtime) of the tables artifacts derive from — embeddings for the ANN
    * family, documents for the dedup family. Listing-only — no data read. */
  private def fingerprint(spark: SparkSession, dir: String): String =
    fingerprints.getOrElseUpdate(dir, {
      val hc = spark.sparkContext.hadoopConfiguration
      val listing = Seq("embeddings.parquet", "documents.parquet").map { table =>
        val p = new Path(s"$dir/$table")
        val fs = p.getFileSystem(hc)
        if (!fs.exists(p)) s"$table:absent"
        else fs.listStatus(p).sortBy(_.getPath.getName)
          .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
          .mkString(s"$table\n", "\n", "")
      }.mkString("\n")
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    })

  private[graft] def artifactPath(spark: SparkSession, dir: String, name: String): String = {
    val base = new Path(dir).getName
    s"$root/v$FormatVersion/$base-${fingerprint(spark, dir)}/$name"
  }

  /** Drop artifact dirs built from SUPERSEDED corpus versions: when the
    * data under `dir` changes, its fingerprint changes, and the old
    * `{basename}-{oldFp}` tree would otherwise live forever — the same
    * unbounded-growth defect class VersionedState's keep-last-K closes for
    * the streaming indexes. Called on every write; same-basename dirs with
    * a different fingerprint are deleted (the CURRENT corpus's artifacts,
    * across all names, are never touched). The basename IS the corpus
    * identity: two paths sharing a basename count as versions of one
    * logical corpus — exactly the sf-fixture layout. */
  private def pruneStaleFingerprints(spark: SparkSession, dir: String): Unit = {
    val base = new Path(dir).getName
    val current = fingerprint(spark, dir)
    val parent = new Path(s"$root/v$FormatVersion")
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(s"$base-") && n != s"$base-$current")
          fs.delete(st.getPath, true)
      }
  }

  private def committed(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Write `build` to a temp dir, then rename over `path`. Losing a
    * cross-process race is fine: the winner's artifact is byte-equivalent
    * (builds are deterministic), so the loser just discards its temp. */
  private def writeAtomic(spark: SparkSession, dir: String, path: String)
      (build: => DataFrame): Unit = {
    pruneStaleFingerprints(spark, dir)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + s".tmp-${java.lang.Thread.currentThread().getId}-${System.nanoTime()}")
    build.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dest = new Path(path)
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.mkdirs(dest.getParent)
    if (!fs.rename(tmp, dest)) {
      // lost a cross-process race — another writer committed; keep theirs
      fs.delete(tmp, true)
      if (!committed(spark, path)) sys.error(s"could not commit index artifact $path")
    }
  }

  private def withLock[T](path: String)(body: => T): T =
    locks.getOrElseUpdate(path, new Object).synchronized(body)

  /** Serve path: read the committed artifact, building (and persisting) it
    * first if absent — so standalone runs still work with no explicit
    * build step, and the first toucher leaves the artifact for the rest of
    * the process fleet. */
  /** Whether `name`'s artifact for the CURRENT fingerprint of `dir` is
    * already committed on disk — the Bench subset mode asks this before
    * timing a serve query without its `index_build_*` sibling, because an
    * absent artifact would make the serve line silently absorb a build. */
  private[graft] def isCommitted(spark: SparkSession, dir: String, name: String): Boolean =
    committed(spark, artifactPath(spark, dir, name))

  /** A fingerprint-keyed directory for state that is NOT a single
    * writeAtomic parquet artifact (e.g. Merge's manifest-committed history
    * table, whose commit discipline is its own manifests): same keying and
    * stale-fingerprint pruning as [[artifactPath]], so regenerated fixture
    * data can never serve a stale tree, and two corpora sharing a basename
    * land under different fingerprints (ADVICE r11 #1). */
  private[graft] def statePath(spark: SparkSession, dir: String, name: String): String = {
    pruneStaleFingerprints(spark, dir)
    artifactPath(spark, dir, name)
  }

  /** The store's per-path JVM lock, for callers managing their own commit
    * discipline under a [[statePath]] — concurrent builders of the same
    * state tree serialize exactly like concurrent artifact writers. */
  private[graft] def withPathLock[T](path: String)(body: => T): T = withLock(path)(body)

  def readOrBuild(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val path = artifactPath(spark, dir, name)
    withLock(path) {
      if (!committed(spark, path)) writeAtomic(spark, dir, path)(build)
      spark.read.parquet(path)
    }
  }

  /** Build path (the `index_build_*` queries): always rebuild and
    * overwrite, so a build bench entry measures a real build even when the
    * artifact already exists from a previous run. */
  def rebuild(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val path = artifactPath(spark, dir, name)
    withLock(path) {
      writeAtomic(spark, dir, path)(build)
      spark.read.parquet(path)
    }
  }

  // ------------------------------------------ driver-object artifacts
  //
  // Centroids and codebooks are K×Dim driver scalars (the documented
  // k-means/PQ driver boundary); persisted as tiny parquet tables and read
  // back with an id sort (the assignment kernels sort by id themselves, so
  // row order never affects results — parquet doubles round-trip exactly).

  private def centroidsDf(spark: SparkSession, c: Seq[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    c.map { case (id, v) => (id, v.toSeq) }.toDF("cluster", "cv")
  }

  private def collectCentroids(df: DataFrame): Seq[(Int, Array[Double])] =
    df.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq.sortBy(_._1)

  def readOrBuildCentroids(spark: SparkSession, dir: String, name: String)
      (build: => Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] =
    collectCentroids(readOrBuild(spark, dir, name)(centroidsDf(spark, build)))

  def rebuildCentroids(spark: SparkSession, dir: String, name: String)
      (build: => Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] =
    collectCentroids(rebuild(spark, dir, name)(centroidsDf(spark, build)))

  private def codebooksDf(spark: SparkSession, cbs: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    import spark.implicits._
    cbs.zipWithIndex.flatMap { case (cb, m) =>
      cb.map { case (code, v) => (m, code, v.toSeq) }
    }.toDF("m", "code", "cv")
  }

  private def collectCodebooks(df: DataFrame): Seq[Seq[(Int, Array[Double])]] = {
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    (0 to rows.map(_._1).max).map(m =>
      rows.filter(_._1 == m).map { case (_, code, v) => (code, v) }.sortBy(_._1).toSeq)
  }

  def readOrBuildCodebooks(spark: SparkSession, dir: String, name: String)
      (build: => Seq[Seq[(Int, Array[Double])]]): Seq[Seq[(Int, Array[Double])]] =
    collectCodebooks(readOrBuild(spark, dir, name)(codebooksDf(spark, build)))

  def rebuildCodebooks(spark: SparkSession, dir: String, name: String)
      (build: => Seq[Seq[(Int, Array[Double])]]): Seq[Seq[(Int, Array[Double])]] =
    collectCodebooks(rebuild(spark, dir, name)(codebooksDf(spark, build)))
}
