package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.OracleParity.pround

/** Text-analysis operators for a training-data pipeline: language ID
  * (stopword-vote heuristic), quality scoring (length / punctuation /
  * stopword ratios), token counting (whitespace + BPE-ish regex pieces) and
  * document fingerprinting (rolling polynomial hash).
  *
  * Everything is a single narrow projection over one `documents` scan —
  * map-only, no shuffle, fully codegen'd (higher-order functions + regexes,
  * no UDFs) — so at 100 TB these run at parquet-scan speed.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(lower(c), "\\s+")

  /** Language-ID stopword lists (tiny on purpose — a real deployment would
    * plug in fastText-style n-gram tables through the same column shape). */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "了", "是")
  )

  private def voteCount(t: Column, words: Seq[String]): Column =
    size(filter(t, w => w.isin(words: _*)))

  /** Deterministic argmax with fixed priority order; all-zero → 'unknown'. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = toks(col("text"))
    val votes = stopwords.map { case (l, ws) => l -> voteCount(t, ws) }
    val scored = d.select(col("doc_id") +: col("lang") +:
      votes.map { case (l, c) => c.as(s"v_$l") }: _*)
    val langs = stopwords.map(_._1)
    val pred = langs.foldRight(lit("unknown")) { (l, els) =>
      val c = col(s"v_$l")
      val isMax = langs.filter(_ != l).map(o => c >= col(s"v_$o")).reduce(_ && _)
      when(c > 0 && isMax, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted", pred)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  val langIdSql: String = {
    val voteExprs = stopwords.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w IN ($inList))) AS v_$l"
    }.mkString(",\n         ")
    val langs = stopwords.map(_._1)
    val cases = langs.map { l =>
      val isMax = langs.filter(_ != l).map(o => s"v_$l >= v_$o").mkString(" AND ")
      s"WHEN v_$l > 0 AND $isMax THEN '$l'"
    }.mkString("\n              ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |         $voteExprs
       |  FROM documents),
       |pred AS (
       |  SELECT lang,
       |         CASE $cases
       |              ELSE 'unknown' END AS predicted
       |  FROM scored)
       |SELECT lang, predicted, count(*) AS n
       |FROM pred GROUP BY lang, predicted
       |ORDER BY lang, predicted""".stripMargin
  }

  /** Un-rounded quality score over an arbitrary text column — shared with
    * [[Components]]' keep-best survivor policy, which scores the dedup
    * corpus rather than the raw documents table. */
  private[operators] def qualityCol(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val sw = voteCount(t, stopwords.flatMap(_._2)).cast("double")
    val meanLen = (length(text) - (size(t) - 1)).cast("double") / nTok
    least(lit(1.0), nTok / 50.0) * 0.3 +
      least(lit(1.0), sw / nTok * 5.0) * 0.4 +
      least(lit(1.0), meanLen / 8.0) * 0.3
  }

  /** The same score as a DuckDB CTE: `(SELECT doc_id, q FROM ...)` over
    * whatever relation `from` names (must expose doc_id + text). */
  private[operators] def qualitySqlOver(from: String): String = {
    val allSw = stopwords.flatMap(_._2).map(w => s"'$w'").mkString(", ")
    s"""(SELECT doc_id,
       |        floor((least(1.0, n_tok / 50.0) * 0.3
       |            + least(1.0, sw / n_tok * 5.0) * 0.4
       |            + least(1.0, mean_len / 8.0) * 0.3) * 10000 + 0.5) / 10000.0 AS q
       | FROM (
       |   SELECT doc_id,
       |          len(toks)::DOUBLE AS n_tok,
       |          len(list_filter(toks, w -> w IN ($allSw)))::DOUBLE AS sw,
       |          (length(text) - (len(toks) - 1))::DOUBLE / len(toks)::DOUBLE AS mean_len
       |   FROM (SELECT doc_id, text,
       |                string_split_regex(lower(text), '\\s+') AS toks
       |         FROM $from)))""".stripMargin
  }

  /** Quality score ∈ [0,1]: 0.3·min(1, tokens/50) + 0.4·stopword-ratio·5 +
    * 0.3·min(1, mean_token_len/8), clamped — the standard cheap-heuristics
    * blend (length, function-word density, word shape). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tokens"),
        pround(qualityCol(col("text")), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String = {
    val allSw = stopwords.flatMap(_._2).map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         string_split_regex(lower(text), '\\s+') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         len(toks)::DOUBLE AS n_tok,
       |         len(list_filter(toks, w -> w IN ($allSw)))::DOUBLE AS sw,
       |         (length(text) - (len(toks) - 1))::DOUBLE / len(toks)::DOUBLE AS mean_len
       |  FROM t)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       |  floor((least(1.0, n_tok / 50.0) * 0.3
       |      + least(1.0, sw / n_tok * 5.0) * 0.4
       |      + least(1.0, mean_len / 8.0) * 0.3) * 10000 + 0.5) / 10000.0 AS quality_score
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  /** Token counts: whitespace tokens + BPE-ish pieces (letter runs, digit
    * runs, punctuation runs — the pre-tokenizer split every BPE uses). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
          .cast("long").as("bpe_pieces"))
      .orderBy(col("doc_id"))
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(string_split_regex(lower(text), '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_pieces
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Rolling polynomial fingerprint over the token stream:
    * h = fold(h*131 + h32(token)) mod 1e9+7 — order-sensitive, so
    * reordered-but-equal token multisets fingerprint differently. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val hashed = transform(toks(col("text")),
      w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val fp = aggregate(hashed, lit(0L), (acc, x) => (acc * 131L + x) % 1000000007L)
    d.select(col("doc_id"), fp.as("fingerprint")).orderBy(col("doc_id"))
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(0::BIGINT,
      |      list_transform(string_split_regex(lower(text), '\s+'),
      |        w -> CAST('0x' || substring(md5(w), 1, 8) AS BIGINT))),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_lang_id" -> langId,
    "ta_quality_score" -> qualityScore,
    "ta_token_count" -> tokenCount,
    "ta_fingerprint" -> fingerprint
  )

  val oracles: Map[String, String] = Map(
    "ta_lang_id" -> langIdSql,
    "ta_quality_score" -> qualityScoreSql,
    "ta_token_count" -> tokenCountSql,
    "ta_fingerprint" -> fingerprintSql
  )
}
