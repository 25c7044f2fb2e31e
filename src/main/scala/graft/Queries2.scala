package graft

import graft.pipeline.{Dedup, Sampling, SimSearch, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch 2: training-data pipeline operators (dedup / similarity search /
  * text analysis) with DuckDB oracles. Vector math oracles are generated
  * with fold-identical semantics (DuckDB list_reduce ≡ Spark aggregate, both
  * left-fold in index order) so doubles match bitwise.
  */
object Queries2 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---- exact dedup ----
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactStats(t(spark, dir, "documents"), "text")

  val sqlDedupExact: String =
    """SELECT count(*) AS n_docs,
              count(DISTINCT md5(text)) AS n_distinct,
              count(*) - count(DISTINCT md5(text)) AS n_dups
       FROM documents"""

  // ---- n-gram Jaccard near-dup ----
  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .orderBy("a", "b")

  val sqlDedupJaccard: String =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       sh AS (SELECT doc_id, unnest(
                CASE WHEN len(tk) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
                       i -> array_to_string(tk[i:i+2], ' ')))
                  ELSE [array_to_string(tk, ' ')] END) AS s
              FROM toks),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                 FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a, b, round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
       FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
       WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
       ORDER BY a, b"""

  // ---- MinHash LSH candidates ----
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(t(spark, dir, "documents"), "doc_id", "text",
        numBands = 8, shingleN = 3)
      .orderBy("a", "b")

  val sqlDedupMinhash: String =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       sh AS (SELECT doc_id,
                CASE WHEN len(tk) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
                       i -> array_to_string(tk[i:i+2], ' ')))
                  ELSE [array_to_string(tk, ' ')] END AS s
              FROM toks),
       bands AS (SELECT doc_id, r.band,
                  list_min(list_transform(s, x -> md5(CAST(r.band AS VARCHAR) || ':' || x))) AS h
                 FROM sh CROSS JOIN range(0, 8) r(band))
       SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       FROM bands x JOIN bands y ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id
       ORDER BY a, b"""

  // ---- LSH-candidate + exact-verify Jaccard (the SCALE path: candidate
  // generation bounded by band buckets instead of quadratic shingle
  // co-occurrence; every emitted score is the exact n-gram Jaccard) ----
  def qDedupJaccardLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsLsh(t(spark, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.5, numBands = 8)
      .orderBy("a", "b")

  val sqlDedupJaccardLsh: String =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       shs AS (SELECT doc_id,
                CASE WHEN len(tk) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
                       i -> array_to_string(tk[i:i+2], ' ')))
                  ELSE [array_to_string(tk, ' ')] END AS s
              FROM toks),
       bands AS (SELECT doc_id, r.band,
                  list_min(list_transform(s, x -> md5(CAST(r.band AS VARCHAR) || ':' || x))) AS h
                 FROM shs CROSS JOIN range(0, 8) r(band)),
       cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM bands x JOIN bands y
                  ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id),
       sh AS (SELECT doc_id, unnest(s) AS s FROM shs),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT c.a, c.b, count(*) AS i
                 FROM cand c
                 JOIN sh x ON x.doc_id = c.a
                 JOIN sh y ON y.doc_id = c.b AND y.s = x.s
                 GROUP BY c.a, c.b),
       verified AS (SELECT a, b,
                      round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
                    FROM inter JOIN sizes sa ON a = sa.doc_id
                               JOIN sizes sb ON b = sb.doc_id)
       SELECT a, b, jaccard FROM verified WHERE jaccard >= 0.5
       ORDER BY a, b"""

  // ---- SimHash fingerprints ----
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash16(t(spark, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("k", "doc_id")
      .orderBy("doc_id")

  val sqlDedupSimhash: String = {
    val sums = (1 to 16).map(i =>
      s"sum(CASE WHEN substr(md5(t),$i,1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s_$i")
      .mkString(", ")
    val bits = (1 to 16).map(i => s"CASE WHEN s_$i >= 0 THEN ${1L << (i - 1)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id)
        SELECT doc_id, $bits AS simhash FROM sums ORDER BY doc_id"""
  }

  // ---- deterministic stratified sampling (md5-of-key order) ----
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedExact(t(spark, dir, "documents"), "lang", "doc_id", 5)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val sqlSampleStratified: String =
    """SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r
         FROM documents) WHERE r <= 5 ORDER BY doc_id"""

  // ---- benchmark contamination (train/test overlap by fingerprint) ----
  // corpus/bench OVERLAP on doc_id 25..49 (positive path trivially
  // contaminated) and are DISJOINT on 0..24 (contaminated only via a real
  // cross-split duplicate) — so the oracle exercises both join outcomes
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.contamination(
        docs.filter(col("doc_id") >= 25),
        docs.filter(col("doc_id") < 50), "doc_id", "text")
      .orderBy("bench_id")
  }

  val sqlContamination: String =
    """WITH f AS (SELECT doc_id,
                    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
                  FROM documents),
       b AS (SELECT doc_id AS bench_id, fp FROM f WHERE doc_id < 50)
       SELECT bench_id, fp FROM b
       WHERE fp IN (SELECT fp FROM f WHERE doc_id >= 25)
       ORDER BY bench_id"""

  // ---- dedup clusters: connected components over near-dup pairs ----
  def qDedupGroups(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupGroups(
        Dedup.jaccardPairsLsh(t(spark, dir, "documents"), "doc_id", "text",
          shingleN = 3, threshold = 0.5, numBands = 8).select("a", "b"))
      .orderBy("canonical")

  // oracle: transitive closure via recursive CTE over the same
  // LSH-candidate + exact-verify jaccard pairs (the scale path feeds the
  // clustering end-to-end); component id = min reachable id
  val sqlDedupGroups: String =
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       shs AS (SELECT doc_id,
                CASE WHEN len(tk) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
                       i -> array_to_string(tk[i:i+2], ' ')))
                  ELSE [array_to_string(tk, ' ')] END AS s
              FROM toks),
       bands AS (SELECT doc_id, r.band,
                  list_min(list_transform(s, x -> md5(CAST(r.band AS VARCHAR) || ':' || x))) AS h
                 FROM shs CROSS JOIN range(0, 8) r(band)),
       cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM bands x JOIN bands y
                  ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id),
       sh AS (SELECT doc_id, unnest(s) AS s FROM shs),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT c.a, c.b, count(*) AS i
                 FROM cand c
                 JOIN sh x ON x.doc_id = c.a
                 JOIN sh y ON y.doc_id = c.b AND y.s = x.s
                 GROUP BY c.a, c.b),
       verified AS (SELECT a, b,
                      round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
                    FROM inter JOIN sizes sa ON a = sa.doc_id
                               JOIN sizes sb ON b = sb.doc_id),
       prs AS (SELECT a, b FROM verified WHERE jaccard >= 0.5),
       und AS (SELECT a AS u, b AS v FROM prs UNION SELECT b, a FROM prs),
       reach(u, v) AS (
         SELECT u, v FROM und
         UNION
         SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
       comp AS (SELECT u AS id, least(u, min(v)) AS comp FROM reach GROUP BY u)
       SELECT comp AS canonical, count(*) AS n_members
       FROM comp GROUP BY comp ORDER BY canonical"""

  // ---- 64-bit SimHash near-dup (banded Hamming join — the scale path) ----
  def qDedupSimhash64(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup64(t(spark, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
      .orderBy("a", "b")

  // oracle: all-pairs Hamming ≤ 3 over the same md5-digit 64-bit code —
  // equivalent to the banded join by the pigeonhole guarantee (4 bands,
  // ≤3 differing bits leave ≥1 band untouched); all-pairs is fine at
  // oracle scale
  val sqlDedupSimhash64: String = {
    val sums = (0 until 64).map { b =>
      val i = b / 4 + 1
      val m = 1 << (b % 4)
      s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(t),$i,1)) - 1) & $m) <> 0 THEN 1 ELSE -1 END) AS s_$b"
    }.mkString(", ")
    val bits = (0 until 64).map(b =>
      s"CASE WHEN s_$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id),
        codes AS (SELECT doc_id, $bits AS simhash FROM sums)
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        FROM codes x JOIN codes y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
        ORDER BY a, b"""
  }

  // ---- embedding fold helpers for oracle SQL ----
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"

  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  // ---- embedding cosine near-dup via random-hyperplane LSH ----
  private val planes = SimSearch.hyperplanes(numPlanes = 8, dim = 64, seed = 42L)

  def qEmbedNearDupLsh(spark: SparkSession, dir: String): DataFrame =
    SimSearch.lshNearDup(t(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, numPlanes = 8, dim = 64, seed = 42L)
      .orderBy("a", "b")

  val sqlEmbedNearDupLsh: String = {
    val bucketTerms = planes.zipWithIndex.map { case (h, i) =>
      val arr = h.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"CASE WHEN ${duckDot("embedding", arr)} >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH withb AS (SELECT vec_id, embedding, $bucketTerms AS bucket FROM embeddings)
        SELECT x.vec_id AS a, y.vec_id AS b,
               round(${duckCos("x.embedding", "y.embedding")}, 6) AS sim
        FROM withb x JOIN withb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE round(${duckCos("x.embedding", "y.embedding")}, 6) >= 0.4
        ORDER BY a, b"""
  }

  // ---- brute-force cosine top-k (ANN baseline) ----
  def qAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    SimSearch.bruteTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  val sqlAnnTopK: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     ${duckCos("q.qv", "c.embedding")} AS sim
                   FROM embeddings c CROSS JOIN q
                   WHERE c.vec_id <> q.query_id),
        ranked AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC) AS rank
                   FROM scored)
        SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""

  // ---- IVF top-k (the ANN scale path), oracle-checked ----
  // Fixed deterministic ±1 centroids so the model is a data-independent
  // literal reproducible in SQL; k-means TRAINING quality is covered by the
  // recall test in PipelineSpec — this query gates the IVF plan semantics
  // (cell argmax, nProbe probing, equi-join, in-cell exact rank).
  private val ivfCentroids = SimSearch.hyperplanes(numPlanes = 8, dim = 64, seed = 7L)
  private val ivfModel = SimSearch.IvfModel(ivfCentroids)

  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    SimSearch.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, ivfModel, nProbe = 2)
      .orderBy("query_id", "rank")
  }

  val sqlAnnIvf: String = {
    // per-row (cell score, index) structs — EXACT same fp expression as
    // Spark's cosine(vec, centroid) fold; ties resolve to the larger index
    // (Spark's array_max over struct(s, i))
    val structs = ivfCentroids.zipWithIndex.map { case (c, i) =>
      val arr = c.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"{'i': $i, 's': ${duckCos("embedding", arr)}}"
    }.mkString(",\n             ")
    s"""WITH scores AS (
          SELECT vec_id, embedding, u.i AS i, u.s AS s
          FROM embeddings, UNNEST([$structs]) AS t(u)),
        corpus_cells AS (
          SELECT vec_id AS neighbor_id, embedding AS cv, i AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY s DESC, i DESC) AS rn FROM scores) WHERE rn = 1),
        probe_cells AS (
          SELECT vec_id AS query_id, embedding AS qv, i AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY s DESC, i DESC) AS rn FROM scores WHERE vec_id < 10)
          WHERE rn <= 2),
        scored AS (
          SELECT p.query_id, c.neighbor_id, ${duckCos("p.qv", "c.cv")} AS sim
          FROM corpus_cells c JOIN probe_cells p ON c.cell = p.cell
          WHERE c.neighbor_id <> p.query_id),
        ranked AS (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""
  }

  // ---- text analysis battery ----
  def qTextBattery(spark: SparkSession, dir: String): DataFrame =
    TextStats.battery(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val sqlTextBattery: String = {
    def score(ws: Seq[String]): String =
      ws.map(w => s"len(list_filter(string_split(text,' '), x -> x = '$w'))").mkString(" + ")
    val s = TextStats.langProfiles.map { case (l, ws) => l -> s"(${score(ws)})" }.toMap
    s"""SELECT doc_id,
          length(text) AS n_chars,
          len(string_split(text,' ')) AS n_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
          len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
          len(regexp_extract_all(text, '[0-9]')) AS n_digits,
          CASE WHEN ${s("en")} >= ${s("de")} AND ${s("en")} >= ${s("es")}
                 AND ${s("en")} >= ${s("fr")} AND ${s("en")} >= ${s("zh")} THEN 'en'
               WHEN ${s("de")} >= ${s("es")} AND ${s("de")} >= ${s("fr")}
                 AND ${s("de")} >= ${s("zh")} THEN 'de'
               WHEN ${s("es")} >= ${s("fr")} AND ${s("es")} >= ${s("zh")} THEN 'es'
               WHEN ${s("fr")} >= ${s("zh")} THEN 'fr'
               ELSE 'zh' END AS lang_pred,
          md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
        FROM documents ORDER BY doc_id"""
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_dedup_exact" -> ((qDedupExact _, sqlDedupExact)),
    "q_dedup_jaccard" -> ((qDedupJaccard _, sqlDedupJaccard)),
    "q_dedup_groups" -> ((qDedupGroups _, sqlDedupGroups)),
    "q_sample_stratified" -> ((qSampleStratified _, sqlSampleStratified)),
    "q_contamination" -> ((qContamination _, sqlContamination)),
    "q_dedup_minhash" -> ((qDedupMinhash _, sqlDedupMinhash)),
    "q_dedup_jaccard_lsh" -> ((qDedupJaccardLsh _, sqlDedupJaccardLsh)),
    "q_dedup_simhash" -> ((qDedupSimhash _, sqlDedupSimhash)),
    "q_dedup_simhash64" -> ((qDedupSimhash64 _, sqlDedupSimhash64)),
    "q_embed_neardup_lsh" -> ((qEmbedNearDupLsh _, sqlEmbedNearDupLsh)),
    "q_ann_topk" -> ((qAnnTopK _, sqlAnnTopK)),
    "q_ann_ivf" -> ((qAnnIvf _, sqlAnnIvf)),
    "q_text_battery" -> ((qTextBattery _, sqlTextBattery))
  )
}
