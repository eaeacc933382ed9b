package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Merge, TextSearch}

/** Incremental inverted-index maintenance under streaming game ingest —
  * the streaming twin of `index_build_postings` + `f6_text_search_indexed`,
  * completing the index-maintainer family (NSW graph:
  * [[StreamingNswIndex]], IVF quantizer: [[StreamingIvfIndex]], now the
  * text postings). Freshly gathered game rows arrive continuously; the
  * searchable snapshot AND its posting-list index advance together, so
  * indexed serving never waits on a corpus-wide re-tokenization.
  *
  * Per micro-batch (the incremental contract):
  *
  *   - the batch merges into the games snapshot under the J1 policy
  *     (identical to [[StreamingUpsert]] — gather fields overwrite,
  *     enrichment fields persist);
  *   - ONLY the batch's touched docs are re-tokenized, through the same
  *     [[graft.operators.TextSearch.postingsOf]] definition the batch
  *     artifact uses (one tokenizer ⇒ streamed ≡ rebuilt postings is a
  *     set equality, pinned in StreamingPostingsSpec). Tokenizing from
  *     the MERGED rows, not the raw batch, matters: a batch row with a
  *     null description keeps the old enrichment text, so its postings
  *     must keep the old description's words too;
  *   - the touched docs' PREVIOUS postings are anti-joined away (an
  *     updated doc's stale words must stop matching — the delete half of
  *     the upsert), the fresh postings appended, and the dictionary
  *     refreshed as the distinct words of the result.
  *
  * Per-batch compute is batch-sized (tokenize |batch| docs + one
  * anti-join against the postings state); the corpus-sized costs are the
  * copy-on-write table rewrite — [[VersionedState]]'s documented
  * trade, a lakehouse MERGE commit at scale — and the dictionary
  * distinct, one map-side-combined agg over narrow (word) rows per
  * commit, paid at commit time so serve-time stays dictionary-scan +
  * postings equi-join.
  *
  * Storage is [[VersionedState]]: retry-safe overwrite writes at
  * batchId-derived versions, an atomic commit pointer, keep-last-K
  * retention. Postings are range-partitioned by `word` before write, the
  * same layout discipline as the stored batch artifact (word-ordered row
  * groups ⇒ min/max pruning on equi-lookups).
  */
class StreamingPostingsIndex(spark: SparkSession, baseDir: String, initial: DataFrame,
    keepVersions: Int = 3) extends Serializable {

  private val state = new VersionedState(spark, baseDir, keepVersions)
  if (state.latest.isEmpty) commitTables(0L, initial, TextSearch.postingsOf(initial))

  private def commitTables(version: Long, games: DataFrame, postings: DataFrame): Unit =
    state.commit(version, Map(
      "games" -> games,
      "postings" -> postings.repartitionByRange(col("word"))
        .sortWithinPartitions(col("word")),
      "dictionary" -> postings.select(col("word")).distinct()))

  def currentGames(): DataFrame = state.read("games")
  def currentPostings(): DataFrame = state.read("postings")
  def currentDictionary(): DataFrame = state.read("dictionary")

  /** Merge one micro-batch into the snapshot and its index: J1 upsert of
    * the rows, delete-then-insert of the touched docs' postings. A batch
    * whose version is already committed (foreachBatch replay after a
    * post-commit failure) is a no-op — re-running it would read the very
    * dirs it overwrites. */
  def upsertBatch(batch: Dataset[Row], batchId: Long): Unit = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return
    if (batch.isEmpty) return
    val merged = Merge.mergeUpsert(
      currentGames(), batch.toDF(), "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"))
    val touched = batch.toDF().select(col("universeId")).distinct()
    val freshPostings = TextSearch.postingsOf(
      merged.join(touched, Seq("universeId"), "left_semi"))
    val kept = currentPostings().join(touched, Seq("universeId"), "left_anti")
    commitTables(target, merged, kept.unionByName(freshPostings))
  }

  /** Attach to a stream of fresh game rows; one upsert per micro-batch. */
  def start(freshStream: DataFrame, checkpointDir: String): StreamingQuery =
    freshStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => upsertBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Index-served search against the committed snapshot — the SAME
    * frames-based core as `f6_text_search_indexed`
    * ([[graft.operators.TextSearch.searchIndexedFrames]]), so streamed
    * serving inherits the batch query's semantics and its oracle, row for
    * row. All three tables are pinned to ONE observed version
    * ([[VersionedState.readAt]]): a writer advancing the pointer
    * mid-query can never produce a torn games/postings pair. */
  def searchCurrent(normalizedQuery: String, limit: Int): DataFrame = {
    val v = state.latest.getOrElse(sys.error(s"no committed index under $baseDir"))
    TextSearch.searchIndexedFrames(
      state.readAt("games", v), state.readAt("postings", v),
      state.readAt("dictionary", v), normalizedQuery, limit)
  }

  /** Surviving versions of the postings table — for retention tests. */
  def postingsVersions(): Seq[Long] = state.versionsOf("postings")
}
