package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnRecall, Components, Curation, Dedup, Enrich, Events, Filtering, Graph, IndexBuild, Ivfadc, IvfKMeans, Ivfpq, Jobs, Merge, Multimodal, Nsw, Pq, Profile, Quality, Relational, Similarity, Sketches, Sources, TextAnalysis, TextSearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a (queries, oracles) pair; this object
  * concatenates them. Every query takes (spark, sfDir) and returns a
  * DataFrame whose column names match its DuckDB oracle exactly (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 minimum end-to-end slice: embeddings scan → cosine ×
    * popularity → top-k → broadcast join decoration. */
  def entry(spark: SparkSession): DataFrame =
    Similarity.similarSearch(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Sketches.queries, Sketches.oracles),
      (Profile.queries, Profile.oracles),
      (Similarity.queries, Similarity.oracles),
      (TextSearch.queries, TextSearch.oracles),
      (Merge.queries, Merge.oracles),
      (Quality.queries, Quality.oracles),
      (Dedup.queries, Dedup.oracles),
      (Components.queries, Components.oracles),
      (Graph.queries, Graph.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Curation.queries, Curation.oracles),
      (Filtering.queries, Filtering.oracles),
      (Events.queries, Events.oracles),
      (Enrich.queries, Enrich.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Sources.queries, Sources.oracles),
      (Jobs.queries, Jobs.oracles),
      (IvfKMeans.queries, IvfKMeans.oracles),
      (Pq.queries, Pq.oracles),
      (Ivfpq.queries, Ivfpq.oracles),
      (Ivfadc.queries, Ivfadc.oracles),
      (Nsw.queries, Nsw.oracles),
      (IndexBuild.queries, IndexBuild.oracles),
      (AnnRecall.queries, AnnRecall.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** PRICED but not oracle-gated (round 18, verdict r17 #6): the
    * real-decode operators' correctness gates are their stub twins
    * (`dedup_phash` / `dedup_audio` hash-gate the identical banding +
    * verify pipeline) plus the golden-signature specs (MultimodalSpec's
    * analytic decode properties); these entries price the REAL codec
    * paths — ImageIO PNG decode → dHash, javax.sound WAV decode →
    * Goertzel band energies — over [[graft.tools.MediaFixture]]'s
    * deterministic generated blobs. Kept OUT of [[queries]] so the
    * driver's correctness set stays 100 % hash-gated; only Bench runs
    * these (a decode-bound entry is also a CPU-bound canary next to the
    * xorshift calibration markers). */
  def benchOnlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "benchonly_dedup_phash_real" -> ((s, _) =>
      Multimodal.phashDedupImages(s,
        graft.tools.MediaFixture.ensure() + "/images")),
    "benchonly_dedup_audio_wav" -> ((s, _) =>
      Multimodal.audioDedupWav(s,
        graft.tools.MediaFixture.ensure() + "/audio")))
}
