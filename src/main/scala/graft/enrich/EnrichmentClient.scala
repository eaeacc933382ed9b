package graft.enrich

/** Pluggable boundary for the reference's external-service calls (SURVEY
  * §2.8): the OpenAI-compatible chat/embeddings APIs (reference:
  * src/lib/commands/generateGameplayDescriptions.ts:99-158,
  * generateEmbeddings.ts:53-96) and the Roblox batch-details API
  * (src/lib/commands/roblox.ts:16-61).
  *
  * One instance per executor partition inside `mapPartitions`; implementers
  * must be Serializable. Tests and the zero-egress environment use
  * [[StubEnrichmentClient]]; a production impl would wrap an HTTP client
  * pool plus [[Retry]].
  */
trait EnrichmentClient extends Serializable {
  /** Batch embed (the reference batches 10 texts per request — S14). */
  def embed(texts: Seq[String]): Seq[Array[Double]]

  /** LLM gameplay analysis for one game (E1/S13). */
  def analyze(name: String, description: String, playerCount: Option[Long]): LlmAnalysis

  /** Batch game details (the reference batches 50 ids per request — S8). */
  def gameDetails(ids: Seq[Long]): Seq[GameDetail]
}

/** The LLM's JSON-Schema-constrained output
  * (reference: prompts/localAnalysis.json:3-47). */
final case class LlmAnalysis(
    gameplaySummary: String,
    genreTags: Seq[String],
    gameFeatures: Seq[String])

/** One row of the Roblox details response
  * (reference: src/lib/commands/roblox.ts:10-14). */
final case class GameDetail(id: Long, description: Option[String], playing: Option[Long])

/** Deterministic offline stub. The embedding formula
  * `v_j = ((h32(text) · j) mod 1000) / 1000, j = 1..dim` is mirrored in the
  * DuckDB oracle so the whole mapPartitions path is hash-checked end-to-end;
  * a real client swaps in without touching the operators. */
class StubEnrichmentClient(val dim: Int = 8) extends EnrichmentClient {

  override def embed(texts: Seq[String]): Seq[Array[Double]] =
    texts.map { t =>
      val h = StubEnrichmentClient.h32(t)
      Array.tabulate(dim)(j => ((h * (j + 1)) % 1000L) / 1000.0)
    }

  override def analyze(name: String, description: String, playerCount: Option[Long]): LlmAnalysis = {
    val toks = description.toLowerCase.split("\\s+").toSeq
    LlmAnalysis(
      gameplaySummary = toks.take(6).mkString(" "),
      genreTags = toks.take(2),
      gameFeatures = if (playerCount.exists(_ > 100)) Seq("multiplayer") else Seq.empty)
  }

  override def gameDetails(ids: Seq[Long]): Seq[GameDetail] =
    ids.map(id => GameDetail(id, Some(s"detail $id"), Some(id % 500)))
}

object StubEnrichmentClient {
  /** Same portable 32-bit hash the SQL oracles use: first 8 hex of md5. */
  def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }
}
