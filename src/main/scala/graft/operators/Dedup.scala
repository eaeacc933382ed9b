package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.{ArrayExpressions, VectorFunctions}
import graft.functions.OracleParity.pround

/** Large-scale training-data deduplication operators — the pipeline ops a
  * 100 TB corpus needs beyond the reference's own surface:
  *
  *   - exact dedup: hash-groupBy on content digest (one shuffle on a
  *     64-bit-ish key; map-side partial counts);
  *   - MinHash + LSH: shingle → k minhashes → bands → bucket-join →
  *     verified Jaccard. Candidate generation is an equi-join on
  *     (band, signature) — a SHUFFLE JOIN ON A SHORT KEY, never an O(n²)
  *     cross join; verification cost is proportional to candidates only;
  *   - SimHash: 60-bit signature; candidates block on 15-bit chunks
  *     (pigeonhole: hamming ≤ 8 ⟹ at least one of 4 chunks equal...
  *     approximately — chunk blocking is the standard recall/cost trade);
  *   - n-gram Jaccard: brute-force verified similarity inside
  *     (lang, source) blocks — the bounded-block pattern;
  *   - embedding cosine near-dup: same-cell (label) blocking, the IVF
  *     coarse-quantizer pattern.
  *
  * All hashing is md5-derived so the DuckDB oracle can reproduce it
  * bit-for-bit; at production scale you'd swap in xxhash64 via the same
  * column expressions.
  */
object Dedup {

  /** Portable 32-bit content hash: first 8 hex chars of md5 as a long. */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The dedup fixture corpus: the documents table plus an exact "re-crawl"
    * copy of every 4th doc and a near-duplicate (3 appended tokens) of
    * every 5th — emulating real crawl duplication, since the fixture's 500
    * texts are all distinct. */
  def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"), col("lang"), col("source"))
    d.unionByName(
        d.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"), col("lang"), col("source")))
      .unionByName(
        d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(col("text"), lit(" near dup tail")).as("text"), col("lang"), col("source")))
  }

  val corpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, lang, source FROM documents WHERE doc_id % 4 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' near dup tail', lang, source
      |  FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  // ---------------------------------------------------------------- exact

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("kept_doc_id"))
      .filter(col("n_copies") > 1)
      .orderBy(col("text_hash"))

  val dedupExactSql: String =
    s"""WITH $corpusSql
       |SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS kept_doc_id
       |FROM corpus
       |GROUP BY md5(text)
       |HAVING count(*) > 1
       |ORDER BY text_hash""".stripMargin

  // ---------------------------------------------------------- minhash+LSH

  private val NumHashes = 16
  private val NumBands = 4
  private val RowsPerBand = NumHashes / NumBands
  private val MinhashPrime = 2147483647L
  /** (a, b) per hash function; a small enough that a*h32 never overflows. */
  private val seeds: Seq[(Long, Long)] =
    (0 until NumHashes).map(j => (2L * j + 3L, 1000003L * j))

  /** doc_id + sorted distinct md5-hashed 3-word shingle set, built by the
    * fused [[graft.functions.HashedWordNGrams]] kernel — one primitive pass
    * per document instead of five interpreted array transforms, and an
    * 8-byte hash per shingle on the wire instead of a ~20-byte string. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir).select(
      col("doc_id"),
      ArrayExpressions.hashedWordNGrams(split(lower(col("text")), "\\s+"), 3).as("hs"))

  private val shingledSql: String =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(
      |           list_transform(generate_series(1, len(toks) - 2),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
      |           s -> CAST('0x' || substring(md5(s), 1, 8) AS BIGINT))) AS hs
      |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM corpus)
      |)""".stripMargin

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // shingles arrive pre-hashed; all 16 affine minhashes come from a
    // single codegen'd pass over the hash array. The signature set feeds
    // three plan branches (banding + both verify sides): persist it — the
    // at-scale form is a materialized signatures table (see NOTES.md).
    val sh = shingled(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .withColumn("mharr", ArrayExpressions.affineMinHash(
        col("hs"), seeds.map(_._1), seeds.map(_._2), MinhashPrime))
    val mhCols = seeds.indices.map(j => element_at(col("mharr"), j + 1).as(s"mh_$j"))
    val withMh = sh.select(col("doc_id") +: col("hs") +: mhCols: _*)
    val bandStructs = (0 until NumBands).map { k =>
      val sig = md5(concat_ws(",",
        (0 until RowsPerBand).map(i => col(s"mh_${k * RowsPerBand + i}").cast("string")): _*))
      struct(lit(k).as("band"), sig.as("sig"))
    }
    val banded = withMh
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val sa = sh.select(col("doc_id").as("a_id"), col("hs").as("sa"))
    val sb = sh.select(col("doc_id").as("b_id"), col("hs").as("sb"))
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("inter", ArrayExpressions.sortedLongIntersectCount(col("sa"), col("sb")))
      .withColumn("jacc",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jacc") >= 0.5)
      .select(col("a_id"), col("b_id"), pround(col("jacc"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupMinhashLshSql: String = {
    val mhExprs = seeds.zipWithIndex.map { case ((a, b), j) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $MinhashPrime)) AS mh_$j"
    }.mkString(",\n")
    val bandSelects = (0 until NumBands).map { k =>
      val cols = (0 until RowsPerBand).map(i => s"mh_${k * RowsPerBand + i}").mkString(", ")
      s"SELECT doc_id, $k AS band, md5(array_to_string([$cols], ',')) AS sig FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $corpusSql,
       |$shingledSql,
       |mh AS (SELECT doc_id,
       |$mhExprs
       |FROM sh),
       |banded AS (
       |  $bandSelects
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM banded x
       |  JOIN banded y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
       |)
       |SELECT a_id, b_id,
       |  floor(jacc * 10000 + 0.5) / 10000.0 AS jaccard
       |FROM (
       |  SELECT a_id, b_id,
       |         len(list_intersect(sa.hs, sb.hs))::DOUBLE
       |           / (len(sa.hs) + len(sb.hs)
       |              - len(list_intersect(sa.hs, sb.hs))) AS jacc
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = a_id
       |  JOIN sh sb ON sb.doc_id = b_id)
       |WHERE jacc >= 0.5
       |ORDER BY a_id, b_id""".stripMargin
  }

  // -------------------------------------------------------------- simhash

  private val SimhashBits = 60
  private val ChunkBits = 15
  private val NumChunks = 4
  private val HammingMax = 8

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // one codegen'd pass per document over its token-hash array — replaces
    // a 60-way explode (56M intermediate rows at sf0.1) plus two shuffles
    val sims = corpus(spark, dir)
      .select(col("doc_id"),
        ArrayExpressions.simHash60(
          ArrayExpressions.hashedWords60(split(lower(col("text")), "\\s+"))).as("simhash"))
    val chunks = sims
      .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(NumChunks - 1))).as("k"))
      .withColumn("chunk", expr(s"shiftright(simhash, $ChunkBits * k) & ${(1 << ChunkBits) - 1}"))
    val cand = chunks.as("x")
      .join(chunks.as("y"),
        col("x.k") === col("y.k") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .filter(col("hamming") <= HammingMax)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupSimhashSql: String =
    s"""WITH $corpusSql,
       |tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w FROM corpus),
       |th AS (
       |  SELECT doc_id, CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) AS h FROM tok),
       |bits AS (
       |  SELECT doc_id, b.bit,
       |         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, ${SimhashBits - 1})) AS bit) b
       |  GROUP BY doc_id, b.bit),
       |sims AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id),
       |chunks AS (
       |  SELECT doc_id, simhash, k.k AS k,
       |         (simhash >> ($ChunkBits * k.k)) & ${(1 << ChunkBits) - 1} AS chunk
       |  FROM sims CROSS JOIN (SELECT unnest(generate_series(0, ${NumChunks - 1})) AS k) k),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
       |                  x.simhash AS sa, y.simhash AS sb
       |  FROM chunks x
       |  JOIN chunks y ON x.k = y.k AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
       |SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sa, sb)) <= $HammingMax
       |ORDER BY a_id, b_id""".stripMargin

  // ------------------------------------------------------- n-gram jaccard

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // both self-join sides consume the same hashed-gram projection; persist
    // rather than recompute the corpus scan + kernel twice
    val grams = corpus(spark, dir).select(
      col("doc_id"), col("lang"), col("source"),
      ArrayExpressions.hashedWordNGrams(split(lower(col("text")), "\\s+"), 2).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val x = grams.select(col("doc_id").as("a_id"), col("lang"), col("source"), col("grams").as("ga"))
    val y = grams.select(col("doc_id").as("b_id"), col("lang"), col("source"), col("grams").as("gb"))
    x.join(y, Seq("lang", "source"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", ArrayExpressions.sortedLongIntersectCount(col("ga"), col("gb")))
      .withColumn("jacc",
        col("inter").cast("double") / (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jacc") >= 0.3)
      .select(col("a_id"), col("b_id"), pround(col("jacc"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupNgramJaccardSql: String =
    s"""WITH $corpusSql,
       |grams AS (
       |  SELECT doc_id, lang, source,
       |         list_distinct(list_transform(
       |           list_transform(generate_series(1, len(toks) - 1),
       |             i -> toks[i] || ' ' || toks[i+1]),
       |           s -> CAST('0x' || substring(md5(s), 1, 8) AS BIGINT))) AS grams
       |  FROM (SELECT doc_id, lang, source,
       |               string_split_regex(lower(text), '\\s+') AS toks FROM corpus))
       |SELECT a_id, b_id, floor(jacc * 10000 + 0.5) / 10000.0 AS jaccard
       |FROM (
       |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
       |         len(list_intersect(x.grams, y.grams))::DOUBLE
       |           / (len(x.grams) + len(y.grams)
       |              - len(list_intersect(x.grams, y.grams))) AS jacc
       |  FROM grams x
       |  JOIN grams y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id)
       |WHERE jacc >= 0.3
       |ORDER BY a_id, b_id""".stripMargin

  // ------------------------------------------- embedding cosine near-dup

  /** Same-label blocking = the IVF coarse-cell pattern: only vectors in the
    * same cell are compared, so cost is Σ_cell |cell|² instead of N². */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"), col("label"))
    val pert = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          i => element_at(col("v"), i) + lit(0.0078125) * (i % 3 - 1).cast("double")).as("v"),
        col("label"))
    val all = e.unionByName(pert)
    val x = all.select(col("vec_id").as("a_id"), col("v").as("va"), col("label"))
    val y = all.select(col("vec_id").as("b_id"), col("v").as("vb"), col("label"))
    x.join(y, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("va"), col("vb")))
      .filter(col("cos") >= 0.99)
      .select(col("a_id"), col("b_id"), col("label"), pround(col("cos"), 4).as("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupEmbeddingCosineSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
      |pert AS (
      |  SELECT vec_id + 100000 AS vec_id,
      |         list_transform(generate_series(1, 64),
      |           i -> v[i] + 0.0078125 * ((i % 3) - 1)) AS v,
      |         label
      |  FROM e WHERE vec_id % 10 = 0),
      |allv AS (SELECT * FROM e UNION ALL SELECT * FROM pert),
      |pairs AS (
      |  SELECT x.vec_id AS a_id, y.vec_id AS b_id, x.label AS label,
      |         list_dot_product(x.v, y.v)
      |           / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cos
      |  FROM allv x
      |  JOIN allv y ON x.label = y.label AND x.vec_id < y.vec_id)
      |SELECT a_id, b_id, label, floor(cos * 10000 + 0.5) / 10000.0 AS cosine
      |FROM pairs WHERE cos >= 0.99
      |ORDER BY a_id, b_id""".stripMargin

  // --------------------------------------------------- IVF-style ANN scan

  /** ANN scale path: restrict the scan to the query's coarse cell (label),
    * then exact cosine + per-query top-k — the IVF search shape. */
  def annIvfLabel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("label"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("label"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("neighbor_id"))
    c.join(broadcast(q), Seq("label"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorFunctions.cosineSimilarity(col("ne"), col("qe")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        pround(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val annIvfLabelSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe, label
      |           FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |         list_dot_product(e.embedding::DOUBLE[], q.qe)
      |           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |              * sqrt(list_dot_product(q.qe, q.qe))) AS cos
      |  FROM embeddings e
      |  JOIN q ON e.label = q.label
      |  WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, floor(cos * 10000 + 0.5) / 10000.0 AS cosine
      |FROM ranked WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine,
    "ann_ivf_label" -> annIvfLabel
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineSql,
    "ann_ivf_label" -> annIvfLabelSql
  )
}
