package graft.queries

import graft.functions.TextFunctions._
import graft.io.Sources
import graft.operators.{AsofJoin, Dedup, FuzzyJoin, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over the `documents` / `embeddings`
  * harness tables: deduplication (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash), embedding similarity search (brute-force + hyperplane LSH),
  * text analysis (language ID, quality, tokens, fingerprints), and
  * binary-column metadata. Each query has a DuckDB oracle mirroring the
  * exact expression tree (md5-derived hashes, integer-quantized vector
  * math) so results hash-match across engines.
  */
object PipelineQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** documents ∪ perturbed copies (first token dropped, doc_id + 1000000):
    * guarantees the near-dup detectors have true positives to find at any
    * scale factor, with the same construction mirrored in the oracle. */
  private[queries] def nearDupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        expr("substr(text, instr(text, ' ') + 1)").as("text")))

  private val corpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 1000000 AS doc_id,
              substr(text, instr(text, ' ') + 1) AS text FROM documents"""

  /** Shingle CTE: 3-gram shingles hashed to 60-bit longs *inside* the
    * comprehension — mirrors `Dedup.hash60` so both engines shuffle/join
    * (long, long) pairs instead of shingle strings. */
  private val shingleSql =
    s"""toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
       sh AS (
         SELECT DISTINCT doc_id AS sid,
                unnest([('0x' ||
                         substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15)
                        )::BIGINT
                        for i in range(1, len(tk) - 1)]) AS h
         FROM toks WHERE len(tk) >= 3)"""

  // --- q25: exact dedup via content digest -----------------------------
  def q25DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(nearDupCorpus(t(s, dir, "documents")), "doc_id", "text")
      .orderBy("text_hash")

  val q25Sql: String =
    s"""WITH corpus AS ($corpusSql)
       SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_copies,
              min(doc_id) AS keep_id
       FROM corpus GROUP BY 1 ORDER BY text_hash"""

  // --- q26: n-gram Jaccard near-dup pairs ------------------------------
  /** maxDocFreq=1000: shingles in >1000 of the ~10k docs are boilerplate
    * and would each contribute postings² candidate pairs — the cap bounds
    * per-shingle join work at corpus scale (mirrored in the oracle). */
  def q26DedupJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(nearDupCorpus(t(s, dir, "documents")),
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 1000L,
        eager = true)
      .orderBy("id_a", "id_b")

  val q26Sql: String =
    s"""WITH corpus AS ($corpusSql),
       $shingleSql,
       keep AS (SELECT h FROM sh GROUP BY h HAVING count(*) <= 1000),
       shc AS (SELECT sh.sid, sh.h FROM sh JOIN keep USING (h)),
       sizes AS (SELECT sid, count(*) AS n_sh FROM shc GROUP BY 1),
       inter AS (
         SELECT x.sid AS id_a, y.sid AS id_b, count(*) AS n_common
         FROM shc x JOIN shc y ON x.h = y.h AND x.sid < y.sid
         GROUP BY 1, 2),
       scored AS (
         SELECT id_a, id_b,
                CAST(n_common AS DOUBLE) /
                  CAST(a.n_sh + b.n_sh - n_common AS DOUBLE) AS jaccard
         FROM inter
         JOIN sizes a ON a.sid = id_a
         JOIN sizes b ON b.sid = id_b)
       SELECT * FROM scored WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""

  // --- q248: directed n-gram containment near-dup pairs ----------------
  /** [[Dedup.containmentPairs]] over the perturbed corpus: Broder
    * CONTAINMENT |sh(sub) ∩ sh(super)| / |sh(sub)| ≥ 0.9, the detector
    * for subset-shaped duplication (a document embedded in a longer
    * one) that symmetric Jaccard structurally under-scores — the
    * perturbed copies here are literal shingle-subsets of their
    * originals, so every (perturbed → original) direction scores 1.0
    * regardless of length ratio. Same capped-postings candidate
    * machinery and cost bound as q26; only the scoring divides by one
    * side. */
  def q248Containment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(nearDupCorpus(t(s, dir, "documents")),
        "doc_id", "text", n = 3, threshold = 0.9, maxDocFreq = 1000L,
        eager = true)
      .orderBy("sub_id", "super_id")

  val q248Sql: String =
    s"""WITH corpus AS ($corpusSql),
       $shingleSql,
       keep AS (SELECT h FROM sh GROUP BY h HAVING count(*) <= 1000),
       shc AS (SELECT sh.sid, sh.h FROM sh JOIN keep USING (h)),
       sizes AS (SELECT sid, count(*) AS n_sh FROM shc GROUP BY 1),
       inter AS (
         SELECT x.sid AS id_a, y.sid AS id_b, count(*) AS n_common
         FROM shc x JOIN shc y ON x.h = y.h AND x.sid < y.sid
         GROUP BY 1, 2),
       directed AS (
         SELECT id_a AS sub_id, id_b AS super_id, n_common FROM inter
         UNION ALL
         SELECT id_b AS sub_id, id_a AS super_id, n_common FROM inter),
       scored AS (
         SELECT sub_id, super_id,
                CAST(n_common AS DOUBLE) / CAST(s.n_sh AS DOUBLE)
                  AS containment
         FROM directed d JOIN sizes s ON s.sid = d.sub_id)
       SELECT * FROM scored WHERE containment >= 0.9
       ORDER BY sub_id, super_id"""

  // --- q27: MinHash + LSH candidate pairs ------------------------------
  def q27DedupMinHash(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashCandidates(nearDupCorpus(t(s, dir, "documents")),
        "doc_id", "text", n = 3, numPerm = 16, rowsPerBand = 4,
        eager = true)
      .orderBy("id_a", "id_b")

  val q27Sql: String =
    s"""WITH corpus AS ($corpusSql),
       $shingleSql,
       perms AS (SELECT unnest(range(0, 16)) AS perm),
       sig AS (
         SELECT sid, perm,
                min(((2 * perm + 1) * (h % 2147483647) +
                     (7919 * perm + 13)) % 2147483647) AS sig
         FROM sh CROSS JOIN perms GROUP BY 1, 2),
       band AS (
         SELECT sid, perm // 4 AS band,
                md5(min(CASE WHEN perm % 4 = 0 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 1 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 2 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 3 THEN sig END)::VARCHAR)
                  AS band_key
         FROM sig GROUP BY 1, 2),
       cand AS (
         SELECT DISTINCT x.sid AS id_a, y.sid AS id_b
         FROM band x
         JOIN band y ON x.band = y.band AND x.band_key = y.band_key
                    AND x.sid < y.sid)
       SELECT id_a, id_b,
              CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                AS DOUBLE) / 16 AS est_jaccard
       FROM cand
       JOIN sig sa ON sa.sid = id_a
       JOIN sig sb ON sb.sid = id_b AND sb.perm = sa.perm
       GROUP BY 1, 2 ORDER BY id_a, id_b"""

  // --- q63: near-dup clusters (pairs → connected components) -----------
  /** The end of the dedup pipeline: MinHash candidate pairs at
    * est_jaccard ≥ 0.5 become duplicate CLUSTERS via connected
    * components, and every document maps to its cluster representative
    * (min doc_id) — the row a dedup job would keep. Oracle: recursive
    * min-reachability CTE over the same pair list. */
  def q63DupClusters(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(t(s, dir, "documents"))
    val pairs = Dedup.minHashCandidates(corpus, "doc_id", "text",
        n = 3, numPerm = 16, rowsPerBand = 4, eager = true)
      .filter(col("est_jaccard") >= 0.5)
    Dedup.connectedComponents(corpus.select("doc_id"), "doc_id",
        pairs, "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val q63Sql: String =
    s"""WITH RECURSIVE corpus AS ($corpusSql),
       $shingleSql,
       perms AS (SELECT unnest(range(0, 16)) AS perm),
       sig AS (
         SELECT sid, perm,
                min(((2 * perm + 1) * (h % 2147483647) +
                     (7919 * perm + 13)) % 2147483647) AS sig
         FROM sh CROSS JOIN perms GROUP BY 1, 2),
       band AS (
         SELECT sid, perm // 4 AS band,
                md5(min(CASE WHEN perm % 4 = 0 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 1 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 2 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 3 THEN sig END)::VARCHAR)
                  AS band_key
         FROM sig GROUP BY 1, 2),
       cand AS (
         SELECT DISTINCT x.sid AS id_a, y.sid AS id_b
         FROM band x
         JOIN band y ON x.band = y.band AND x.band_key = y.band_key
                    AND x.sid < y.sid),
       est AS (
         SELECT id_a, id_b,
                CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                  AS DOUBLE) / 16 AS est_jaccard
         FROM cand
         JOIN sig sa ON sa.sid = id_a
         JOIN sig sb ON sb.sid = id_b AND sb.perm = sa.perm
         GROUP BY 1, 2),
       pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
       sym AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
       reach(src, dst) AS (
         SELECT doc_id, doc_id FROM corpus
         UNION
         SELECT r.src, s.b FROM reach r JOIN sym s ON s.a = r.dst)
       SELECT src AS doc_id, min(dst) AS cluster_rep
       FROM reach GROUP BY 1 ORDER BY 1"""

  // --- q28: SimHash fingerprints ---------------------------------------
  def q28DedupSimHash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash16(t(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("sid", "doc_id")
      .orderBy("doc_id")

  val q28Sql: String =
    """WITH tc AS (
         SELECT doc_id AS sid, tok, count(*) AS cnt
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY 1, 2),
       bits AS (SELECT unnest(range(0, 16)) AS bit),
       votes AS (
         SELECT sid, bit,
                sum(cnt * ((CAST(floor(
                  (instr('0123456789abcdef',
                         substr(md5(tok), (bit // 4) + 1, 1)) - 1)
                  / pow(2, bit % 4)) AS BIGINT) % 2) * 2 - 1)) AS votes
         FROM tc CROSS JOIN bits GROUP BY 1, 2)
       SELECT sid AS doc_id,
              CAST(sum(CASE WHEN votes > 0 THEN CAST(pow(2, bit) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS simhash
       FROM votes GROUP BY 1 ORDER BY doc_id"""

  // --- q29: brute-force cosine top-k -----------------------------------
  def q29CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .orderBy("qid", "rank")
  }

  val q29Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       p AS (
         SELECT q.vec_id AS qid, d.vec_id AS did,
                list_sum([q.e[i] * d.e[i]
                          for i in generate_series(1, len(q.e))]) AS dot,
                q.nn AS qq, d.nn AS dd
         FROM n q CROSS JOIN n d WHERE q.vec_id < 10),
       sc AS (
         SELECT qid, did,
                CAST(dot AS DOUBLE) /
                  (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(dd AS DOUBLE)))
                  AS cosine
         FROM p),
       r AS (
         SELECT qid, did, cosine,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, did ASC) AS INTEGER) AS rank
         FROM sc)
       SELECT * FROM r WHERE rank <= 5 ORDER BY qid, rank"""

  // --- q30: ANN via hyperplane LSH buckets -----------------------------
  def q30AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb,
        numPlanes = 6, k = 3)
      .select("qid", "did", "cosine", "rank")
      .orderBy("qid", "rank")
  }

  val q30Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) for x in embedding] AS e
         FROM embeddings),
       proj AS (
         SELECT v.vec_id, pl.p,
                list_sum([v.e[i] *
                  (2 * instr('0123456789abcdef',
                     substr(md5(pl.p || '-' || (i - 1)), 1, 1)) - 17)
                  for i in generate_series(1, len(v.e))]) AS proj
         FROM v CROSS JOIN (SELECT unnest(range(0, 6)) AS p) pl),
       buck AS (
         SELECT vec_id,
                CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY 1),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       sc AS (
         SELECT q.vec_id AS qid, d.vec_id AS did,
                CAST(list_sum([qn.e[i] * dn.e[i]
                       for i in generate_series(1, len(qn.e))]) AS DOUBLE) /
                  (sqrt(CAST(qn.nn AS DOUBLE)) * sqrt(CAST(dn.nn AS DOUBLE)))
                  AS cosine
         FROM buck q
         JOIN buck d ON q.bucket = d.bucket
         JOIN n qn ON qn.vec_id = q.vec_id
         JOIN n dn ON dn.vec_id = d.vec_id
         WHERE q.vec_id < 10),
       r AS (
         SELECT qid, did, cosine,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, did ASC) AS INTEGER) AS rank
         FROM sc)
       SELECT * FROM r WHERE rank <= 3 ORDER BY qid, rank"""

  // --- q62: multi-probe LSH ANN ----------------------------------------
  /** Same bucketing as q30, but each query also probes the numPlanes
    * buckets at Hamming distance 1 — recall up without more buckets. */
  def q62AnnMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopKMultiProbe(emb.filter(col("vec_id") < 10), emb,
        numPlanes = 6, k = 3)
      .orderBy("qid", "rank")
  }

  val q62Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       proj AS (
         SELECT v.vec_id, pl.p,
                list_sum([v.e[i] *
                  (2 * instr('0123456789abcdef',
                     substr(md5(pl.p || '-' || (i - 1)), 1, 1)) - 17)
                  for i in generate_series(1, len(v.e))]) AS proj
         FROM v CROSS JOIN (SELECT unnest(range(0, 6)) AS p) pl),
       buck AS (
         SELECT vec_id,
                CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY 1),
       probes AS (
         SELECT vec_id AS qid,
                unnest([bucket] ||
                       [xor(bucket, CAST(pow(2, p) AS BIGINT))
                        for p in range(0, 6)]) AS bucket
         FROM buck WHERE vec_id < 10),
       cand AS (
         SELECT DISTINCT p.qid, d.vec_id AS did
         FROM probes p JOIN buck d ON p.bucket = d.bucket),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       sc AS (
         SELECT c.qid, c.did,
                CAST(list_sum([qn.e[i] * dn.e[i]
                       for i in generate_series(1, len(qn.e))]) AS DOUBLE) /
                  (sqrt(CAST(qn.nn AS DOUBLE)) * sqrt(CAST(dn.nn AS DOUBLE)))
                  AS cosine
         FROM cand c
         JOIN n qn ON qn.vec_id = c.qid
         JOIN n dn ON dn.vec_id = c.did),
       r AS (
         SELECT qid, did, cosine,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, did ASC) AS INTEGER) AS rank
         FROM sc)
       SELECT * FROM r WHERE rank <= 3 ORDER BY qid, rank"""

  // --- q31: language ID (marker-word heuristic) ------------------------
  def q31LangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  val q31Sql: String =
    """WITH s AS (
         SELECT doc_id, lang,
           len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh_n,
           len(regexp_extract_all(lower(text),
             '\b(the|and|of|is|to|in|that|it)\b')) AS s_en,
           len(regexp_extract_all(lower(text),
             '\b(der|die|das|und|ist|nicht|ein|zu)\b')) AS s_de,
           len(regexp_extract_all(lower(text),
             '\b(le|la|les|et|est|une|que|dans)\b')) AS s_fr,
           len(regexp_extract_all(lower(text),
             '\b(el|los|las|y|es|una|que|en)\b')) AS s_es
         FROM documents),
       g AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS gmax FROM s)
       SELECT doc_id, lang,
         CASE WHEN zh_n > 0 THEN 'zh'
              WHEN gmax = 0 THEN 'unknown'
              WHEN s_en = gmax THEN 'en'
              WHEN s_de = gmax THEN 'de'
              WHEN s_fr = gmax THEN 'fr'
              WHEN s_es = gmax THEN 'es'
              ELSE 'unknown' END AS pred_lang
       FROM g ORDER BY doc_id"""

  // --- q32: quality scoring --------------------------------------------
  def q32TextQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        wsTokenCount(col("text")).cast("long").as("n_tokens"),
        typeTokenRatio(col("text")).as("type_token_ratio"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        punctRatio(col("text")).as("punct_ratio"),
        avgTokenLen(col("text")).as("avg_token_len"),
        // score projected ONCE; the label derives from the column so the
        // regex battery inside qualityScore runs once per row
        qualityScore(col("text")).as("__score"))
      .select(col("doc_id"), col("n_tokens"), col("type_token_ratio"),
        col("stopword_ratio"), col("punct_ratio"), col("avg_token_len"),
        col("__score").cast("long").as("quality_score"),
        qualityLabel(col("__score")).as("quality_label"))
      .orderBy("doc_id")

  val q32Sql: String =
    """WITH f AS (
         SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS type_token_ratio,
           CAST(len(regexp_extract_all(lower(text),
             '\b(the|a|and|of|is|der|die|und|le|la|et|el|los|y)\b'))
             AS DOUBLE) /
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) /
             CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) /
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
         FROM documents),
       sc AS (
         SELECT *,
           (CASE WHEN n_tokens BETWEEN 20 AND 2000 THEN 2
                 WHEN n_tokens BETWEEN 5 AND 19 THEN 1 ELSE -1 END) +
           (CASE WHEN type_token_ratio >= 0.4 THEN 2
                 WHEN type_token_ratio >= 0.2 THEN 1 ELSE 0 END) +
           (CASE WHEN stopword_ratio >= 0.05 THEN 1 ELSE 0 END) +
           (CASE WHEN punct_ratio > 0.2 THEN -2
                 WHEN punct_ratio > 0.1 THEN -1 ELSE 0 END)
             AS quality_score
         FROM f)
       SELECT doc_id, n_tokens, type_token_ratio, stopword_ratio,
              punct_ratio, avg_token_len,
              CAST(quality_score AS BIGINT) AS quality_score,
              CASE WHEN quality_score >= 4 THEN 'high'
                   WHEN quality_score >= 2 THEN 'medium'
                   WHEN quality_score >= 0 THEN 'low'
                   ELSE 'garbage' END AS quality_label
       FROM sc ORDER BY doc_id"""

  // --- q33: token counting ---------------------------------------------
  def q33TokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        regexTokenCount(col("text")).cast("long").as("re_tokens"),
        estBpeTokens(col("text")).as("est_bpe_tokens"))
      .orderBy("doc_id")

  val q33Sql: String =
    """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS BIGINT)
           AS re_tokens,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
       FROM documents ORDER BY doc_id"""

  // --- q34: document fingerprints --------------------------------------
  def q34Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        fingerprint(col("text")).as("fp"),
        sortedFingerprint(col("text")).as("fp_sorted"))
      .orderBy("doc_id")

  val q34Sql: String =
    """SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         md5(array_to_string(list_sort(list_distinct(string_split(
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))),
           ' ')) AS fp_sorted
       FROM documents ORDER BY doc_id"""

  // --- q153: Unicode canonicalization (native codegen'd expression) ----
  /** The canonicalization pass corpus prep runs before any hash-based
    * dedup: NFC composition + root-locale lowercase + ASCII-whitespace
    * collapse + trim, as ONE native Catalyst expression
    * ([[graft.plans.NormalizeText]], whole-stage-codegen'd via
    * defineCodeGen — no UDF boxing, no per-rule regex re-scans). Every
    * document is decorated with a deliberately messy marker (DECOMPOSED
    * é and ï, tab/CR/LF, padding runs) so the oracle — which replays
    * the same pipeline as DuckDB's `nfc_normalize` → `lower` →
    * `regexp_replace('\s+')` → `trim` — only hash-matches if both
    * engines compose the combining marks to the identical codepoints
    * and collapse the identical separator set. Composed-vs-decomposed
    * inputs fingerprinting identically is exactly the property that
    * makes q34's md5 dedup sound on real-world text. */
  def q153TextNormalize(s: SparkSession, dir: String): DataFrame = {
    // DECOMPOSED combining marks (e + U+0301, I + U+0308), mirrored
    // codepoint-for-codepoint by the oracle's chr() concatenation --
    // both engines must COMPOSE them to hash-match
    val marker = "  Cafe\u0301 \t NAI\u0308VE\r\n"
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.plans.TextNormalize.normalizeText(
          concat(col("text"), lit(marker))).as("norm"))
      .select(col("doc_id"),
        length(col("norm")).cast("long").as("n_chars"),
        md5(col("norm")).as("fp"))
      .orderBy("doc_id")
  }

  val q153Sql: String =
    """WITH n AS (
         SELECT doc_id,
                trim(regexp_replace(lower(nfc_normalize(
                  text || '  Cafe' || chr(769) || ' ' || chr(9) ||
                  ' NAI' || chr(776) || 'VE' || chr(13) || chr(10))),
                  '\s+', ' ', 'g')) AS norm
         FROM documents)
       SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_chars,
              md5(norm) AS fp
       FROM n ORDER BY doc_id"""

  // --- q154: exact repeated-span detection (substring-level dedup) -----
  /** Exact-substring deduplication at SPAN granularity (Lee et al.
    * 2022, arXiv:2107.06499 — "Deduplicating Training Data Makes
    * Language Models Better"): any 8-token window occurring ≥2 times in
    * the corpus (across documents OR repeated within one) marks every
    * token it covers, and training pipelines drop or down-weight the
    * marked spans. This is the member of the dedup family the others
    * miss: q25 needs whole-doc equality, q26/q27 flag whole near-dup
    * docs, q78 needs sentence boundaries — boilerplate licenses,
    * navigation chrome and copied paragraphs INSIDE otherwise-unique
    * docs only fall to span-level exact matching.
    *
    * Spark shape (suffix arrays are the single-node tool; shingle
    * aggregation is the distributed one): windows enumerate MAP-SIDE
    * from each doc's token array (explode of a transform over
    * sequence — no self-join), one count-only hash aggregation keyed
    * on the window string finds repeats (partial map-side combine; a
    * count is skew-proof where q26's postings needed capping), one
    * semi-join back tags repeated occurrences, and coverage is an
    * explode of ≤8×|repeated occurrences| positions reduced per doc.
    * At 100 TB the exchange would key on a 128-bit digest of the
    * window instead of its text (collision-free in practice, ~3×
    * smaller shuffle); the oracle keys on the text so the compare
    * stays engine-exact. Output per doc: total tokens, tokens covered
    * by some repeated span — the corpus's span-duplication census. */
  def q154SpanDedup(s: SparkSession, dir: String): DataFrame = {
    val K = 8
    val t0 = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
    val sh = t0.filter(size(col("arr")) >= K)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(arr) - ${K - 1}),
            i -> struct(i AS start,
                        concat_ws(' ', slice(arr, i, $K)) AS s))"""))
        .as("w"))
      .select(col("doc_id"), col("w.start").as("start"), col("w.s").as("s"))
    val dup = sh.groupBy("s").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("s")
    val cov = sh.join(dup, Seq("s"), "left_semi")
      .select(col("doc_id"),
        explode(expr(s"sequence(start, start + ${K - 1})")).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_masked"))
    t0.select(col("doc_id"), size(col("arr")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
      .orderBy("doc_id")
  }

  val q154Sql: String =
    """WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
       sh AS (
         SELECT doc_id, i AS start,
                array_to_string(arr[i:i+7], ' ') AS s
         FROM t, unnest(generate_series(1, len(arr) - 7)) AS u(i)
         WHERE len(arr) >= 8),
       dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
       cov AS (
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked FROM (
           SELECT DISTINCT sh.doc_id, g.p
           FROM sh JOIN dup USING (s),
                unnest(generate_series(sh.start, sh.start + 7)) AS g(p))
         GROUP BY doc_id)
       SELECT t.doc_id, CAST(len(t.arr) AS BIGINT) AS n_tokens,
              CAST(coalesce(cov.n_masked, 0) AS BIGINT) AS n_masked
       FROM t LEFT JOIN cov USING (doc_id)
       ORDER BY t.doc_id"""

  // --- q35: binary-column (multimodal) metadata ------------------------
  /** Multimodal plumbing surface: opaque binary payload + typed metadata.
    * The decode step is a deterministic fake (real image/audio libs are
    * not in this environment — see graft.multimodal); the Spark-side
    * schema/expression plumbing is real. */
  def q35BinaryMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash"))
      .select(col("doc_id"), col("n_bytes"), col("content_hash"),
        (col("n_bytes") % 640).as("fake_width"),
        (col("n_bytes") % 480).as("fake_height"),
        expr("n_bytes div 100").as("fake_n_frames"))
      .orderBy("doc_id")

  val q35Sql: String =
    """WITH b AS (
         SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_hash
         FROM documents)
       SELECT doc_id, n_bytes, content_hash,
              n_bytes % 640 AS fake_width,
              n_bytes % 480 AS fake_height,
              n_bytes // 100 AS fake_n_frames
       FROM b ORDER BY doc_id"""

  // --- q47: multimodal decode pipeline (Dataset mapPartitions path) ----
  /** Binary payloads → per-object features through the partition-local
    * decode stage (deterministic fake decoder — see graft.multimodal). */
  def q47MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.multimodal.Multimodal
      .toBinary(t(s, dir, "documents"))
      .as[graft.multimodal.MediaRecord]
    graft.multimodal.Multimodal.extractFeatures(media)
      .toDF()
      .orderBy("doc_id")
  }

  // --- q163: image perceptual-hash dedup (real decode path) ------------
  /** Re-encode-robust image dedup: every document is materialized as a
    * REAL PNG (deterministic synthesis —
    * [[graft.multimodal.Multimodal.synthImage]] — with duplicates
    * planted by content key: docs ≡0 mod 7 carry their predecessor
    * id's pixels), decoded through javax.imageio, perceptually hashed
    * ([[graft.multimodal.Multimodal.dHash]]: area-resample to 9×8,
    * 64-bit gradient-sign fingerprint), and grouped by hash. Same
    * mapPartitions batch-decode stage as q47 (binary codecs are the
    * sanctioned mapPartitions case); the grouping afterwards is one
    * hash-agg on a LONG — at corpus scale the heavy part is the
    * embarrassingly-parallel decode, the exchange carries only
    * (doc_id, phash).
    *
    * The oracle can't decode pixels, and doesn't need to: duplicate
    * topology is a pure function of doc_id (the planted content key),
    * so it groups by that key directly. The hash compare then proves
    * the DECODED-PIXEL path recovered exactly the planted duplicate
    * structure — equal-content images collide, distinct-content images
    * don't (64 noise-independent bits make cross-content collisions
    * birthday-negligible, and the check is deterministic at fixed
    * data). */
  def q163ImagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // decode cost >> scan cost and the corpus may sit in few files:
    // fan the synth+decode stage out explicitly — one narrow exchange
    // of (id, seed) buys full-core parallelism for the expensive stage
    val seeds = t(s, dir, "documents")
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, col("doc_id") - 1)
          .otherwise(col("doc_id")).cast("string")).as("seed"))
      .repartition(s.sparkContext.defaultParallelism)
    val hashed = seeds.as[(Long, String)]
      .mapPartitions(_.map { case (id, seed) =>
        (id, graft.multimodal.Multimodal.dHash(
          graft.multimodal.Multimodal.synthImage(seed)))
      })
      .toDF("doc_id", "phash")
    hashed
      .withColumn("group_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("phash")))
      .select(col("doc_id"), col("group_size"),
        (col("group_size") > 1).as("is_dup"))
      .orderBy("doc_id")
  }

  val q163Sql: String =
    """WITH c AS (
         SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN doc_id - 1
                     ELSE doc_id END AS canon
         FROM documents)
       SELECT doc_id,
              CAST(count(*) OVER (PARTITION BY canon) AS BIGINT)
                AS group_size,
              count(*) OVER (PARTITION BY canon) > 1 AS is_dup
       FROM c ORDER BY doc_id"""

  // --- q275: thumbnail pipeline (real resize) + phash dedup ------------
  /** The full thumbnail ingest path, end-to-end REAL: synthesize each
    * document's PNG (planted duplicates as in q163), bilinear-resize
    * to an 8-px bound ([[graft.multimodal.Multimodal.resizeImage]] —
    * ImageIO decode → Graphics2D → PNG encode), then perceptually
    * hash the THUMBNAIL bytes. Proves two production properties at
    * once: the resize stage emits the contracted dimensions for every
    * row, and dHash survives the downscale — equal-content sources
    * still collide after resizing, so near-dup detection can run on
    * thumbnails (64× fewer pixels to move at corpus scale, the reason
    * thumbnail-stage dedup exists). Same fan-out discipline as q163:
    * one narrow (id, seed) exchange buys full-core parallelism for
    * the decode-resize-encode stage; the exchange after carries only
    * (id, dims, hash). */
  def q275ThumbDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seeds = t(s, dir, "documents")
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, col("doc_id") - 1)
          .otherwise(col("doc_id")).cast("string")).as("seed"))
      .repartition(s.sparkContext.defaultParallelism)
    val hashed = seeds.as[(Long, String)]
      .mapPartitions(_.map { case (id, seed) =>
        val thumb = graft.multimodal.Multimodal.resizeImage(
          graft.multimodal.Multimodal.synthImage(seed), 8)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(thumb))
        (id, img.getWidth.toLong, img.getHeight.toLong,
          graft.multimodal.Multimodal.dHash(thumb))
      })
      .toDF("doc_id", "thumb_w", "thumb_h", "phash")
    hashed
      .withColumn("group_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("phash")))
      .select(col("doc_id"), col("thumb_w"), col("thumb_h"),
        col("group_size"), (col("group_size") > 1).as("is_dup"))
      .orderBy("doc_id")
  }

  val q275Sql: String =
    """WITH c AS (
         SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN doc_id - 1
                     ELSE doc_id END AS canon
         FROM documents)
       SELECT doc_id, CAST(8 AS BIGINT) AS thumb_w,
              CAST(8 AS BIGINT) AS thumb_h,
              CAST(count(*) OVER (PARTITION BY canon) AS BIGINT)
                AS group_size,
              count(*) OVER (PARTITION BY canon) > 1 AS is_dup
       FROM c ORDER BY doc_id"""

  // --- q280: rendezvous (HRW) sharding + rebalance delta ----------------
  /** Highest-random-weight (rendezvous) shard assignment for the
    * corpus, and the property that justifies it: growing 8 → 9 shards
    * moves EXACTLY the documents whose new shard-9 score wins —
    * ~1/9 of the corpus in expectation — while modulo sharding would
    * reshuffle ~8/9 of everything. Each doc's shard =
    * argmax over shards of md5(doc_id:shard) (first 15 hex chars as
    * the 60-bit score, exactly the [[Dedup.hash60]] hashing the
    * oracle mirrors); assignment is a pure per-row expression — zero
    * shuffle, no coordination state, any executor computes the same
    * routing, which is why HRW is the sharding tier under the q164
    * balanced-shards packer. Output: per (old_shard) row count and
    * how many of its docs move under the 9th shard. */
  def q280RendezvousShards(s: SparkSession, dir: String): DataFrame = {
    def score(n: Int) = (0 until n).map(i =>
      struct(Dedup.hash60(concat(col("doc_id").cast("string"),
        lit(s":$i"))).as("h"), lit(i.toLong).as("shard")))
    val docs = t(s, dir, "documents").select("doc_id")
      .withColumn("shard8", greatest(score(8): _*).getField("shard"))
      .withColumn("shard9", greatest(score(9): _*).getField("shard"))
    docs.groupBy("shard8")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L))
          .as("n_moved"))
      .orderBy("shard8")
  }

  val q280Sql: String =
    """WITH sc AS (
         SELECT doc_id,
                [(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                    CAST(i AS VARCHAR)), 1, 15))::BIGINT, i)
                 for i in range(0, 9)] AS scores
         FROM documents),
       a AS (
         SELECT doc_id,
                list_max(scores[1:8])[2] AS shard8,
                list_max(scores)[2] AS shard9
         FROM sc)
       SELECT CAST(shard8 AS BIGINT) AS shard8,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved
       FROM a GROUP BY 1 ORDER BY 1"""

  // --- q281: vocabulary growth curve (Heaps' law report) ----------------
  /** Distinct-vocabulary size as the corpus grows — the types-vs-tokens
    * curve (Heaps' law) a tokenizer/vocab budget is sized from. The
    * naive form recounts distinct tokens at every checkpoint (C full
    * passes); the rewrite: ONE pass computes each token's FIRST doc of
    * appearance (min doc_id per token), a second counts tokens and
    * first-appearances per checkpoint bucket, and a cumulative window
    * over the C-row result turns both into running totals — the
    * checkpoint count never multiplies the scan. */
  def q281VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val bucket = (col("doc_id") / 100L).cast("long") * 100L
    val tokensPer = tok.groupBy(bucket.as("ckpt"))
      .agg(count(lit(1)).as("toks"))
    val firstPer = tok.groupBy("w").agg(min("doc_id").as("fd"))
      .groupBy(((col("fd") / 100L).cast("long") * 100L).as("ckpt"))
      .agg(count(lit(1)).as("news"))
    val w = Window.orderBy("ckpt")
      .rowsBetween(Window.unboundedPreceding, 0)
    tokensPer.join(firstPer, Seq("ckpt"), "left")
      .select(col("ckpt"),
        sum("toks").over(w).as("cum_tokens"),
        sum(coalesce(col("news"), lit(0L))).over(w).as("vocab_size"))
      .orderBy("ckpt")
  }

  val q281Sql: String =
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS w
         FROM documents),
       tp AS (
         SELECT (doc_id // 100) * 100 AS ckpt,
                CAST(count(*) AS BIGINT) AS toks
         FROM tok GROUP BY 1),
       fp AS (
         SELECT (fd // 100) * 100 AS ckpt,
                CAST(count(*) AS BIGINT) AS news
         FROM (SELECT w, min(doc_id) AS fd FROM tok GROUP BY 1)
         GROUP BY 1),
       j AS (SELECT tp.ckpt, toks, coalesce(news, 0) AS news
             FROM tp LEFT JOIN fp ON tp.ckpt = fp.ckpt)
       SELECT CAST(ckpt AS BIGINT) AS ckpt,
              CAST(sum(toks) OVER (ORDER BY ckpt
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
              CAST(sum(news) OVER (ORDER BY ckpt
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
       FROM j ORDER BY ckpt"""

  // --- q289: class-contrastive distinctive terms (c-TF-IDF) -------------
  /** The five most DISTINCTIVE tokens per source — class-based TF-IDF
    * (the BERTopic c-TF-IDF idea): a token scores high for a source
    * when its in-source rate dwarfs its elsewhere rate. Score =
    * (tf_s·T_other) / ((tf_other+1)·T_s) with every product an exact
    * BIGINT and ONE double division at the end (the q261 discipline —
    * identical operand ints + identical op order ⇒ bit-equal doubles
    * in both engines); +1 smooths tokens absent elsewhere. Shape: one
    * token pass reduces map-side to |source × token| rows, per-token
    * totals join back (token-keyed, never a corpus rescan), top-5 per
    * source compiles to WindowGroupLimit. q131 ranks tokens within a
    * DOCUMENT against the corpus; this ranks them within a CLASS
    * against the other classes — the "what makes this slice
    * different" report a mixture audit (q155) reaches for next. */
  def q289DistinctiveTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val tf = tok.groupBy("source", "w").agg(count(lit(1)).as("tf"))
    val perSource = tok.groupBy("source").agg(count(lit(1)).as("ts"))
    val perToken = tf.groupBy("w").agg(sum("tf").as("tf_all"))
    val totals = perSource.agg(sum("ts").as("t_all"))
    val scored = tf
      .join(perSource, "source")
      .join(perToken, "w")
      .crossJoin(broadcast(totals))
      .select(col("source"), col("w"), col("tf"),
        ((col("tf") * (col("t_all") - col("ts"))).cast("double") /
          (((col("tf_all") - col("tf")) + 1L) * col("ts")).cast("double"))
          .as("score"))
    val wR = Window.partitionBy("source")
      .orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rk", row_number().over(wR))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("w").as("token"), col("tf"), col("score"))
      .orderBy("source", "rk")
  }

  val q289Sql: String =
    """WITH tok AS (
         SELECT source, unnest(string_split(text, ' ')) AS w
         FROM documents),
       tf AS (
         SELECT source, w, CAST(count(*) AS BIGINT) AS tf
         FROM tok GROUP BY 1, 2),
       per_source AS (
         SELECT source, CAST(count(*) AS BIGINT) AS ts
         FROM tok GROUP BY 1),
       per_token AS (
         SELECT w, CAST(sum(tf) AS BIGINT) AS tf_all
         FROM tf GROUP BY 1),
       totals AS (SELECT CAST(sum(ts) AS BIGINT) AS t_all
                  FROM per_source),
       scored AS (
         SELECT source, w, tf,
                CAST(tf * (t_all - ts) AS DOUBLE) /
                  CAST(((tf_all - tf) + 1) * ts AS DOUBLE) AS score
         FROM tf
         JOIN per_source USING (source)
         JOIN per_token USING (w)
         CROSS JOIN totals),
       ranked AS (
         SELECT source, w, tf, score,
                row_number() OVER (PARTITION BY source
                  ORDER BY score DESC, w ASC) AS rk
         FROM scored)
       SELECT source, CAST(rk AS BIGINT) AS rk, w AS token, tf, score
       FROM ranked WHERE rk <= 5 ORDER BY source, rk"""

  // --- q292: pairwise source-divergence matrix (TVD) --------------------
  /** Total-variation distance between EVERY pair of sources' token
    * distributions — the mixture-health matrix (which slices are
    * near-duplicates of each other, which are outliers) one step up
    * from q126's two-period drift scalar. Exact rational core: TVD =
    * ½·Σ_w |p_a(w) − p_b(w)| = ½·Σ_w |tf_aw·T_b − tf_bw·T_a| / (T_a·T_b),
    * so the numerator accumulates as exact BIGINTs over a FULL OUTER
    * join per pair and divides once. Shape: one token pass to
    * |source × token| rows, the pair fan-out joins token-keyed
    * (each token contributes its |sources-present|² pairs — bounded
    * by the 20-source universe, never corpus-shaped), absent tokens'
    * contribution folds in CLOSED FORM (Σ_{a only} tf·T_b = T_a·T_b −
    * Σ_common …), so the outer join is never materialized. */
  def q292SourceTvdMatrix(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val tok = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val tf = tok.groupBy("source", "w").agg(count(lit(1)).as("n"))
    val tot = tf.groupBy("source").agg(sum("n").as("t"))
    val a = tf.join(tot, "source")
      .select(col("source").as("sa"), col("w"),
        col("n").cast(dec).as("na"), col("t").cast(dec).as("ta"))
    val b = tf.join(tot, "source")
      .select(col("source").as("sb"), col("w"),
        col("n").cast(dec).as("nb"), col("t").cast(dec).as("tb"))
    a.join(b, Seq("w")).filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(
        sum(abs(col("na") * col("tb") - col("nb") * col("ta")))
          .as("sabs"),
        sum("na").as("ca"), sum("nb").as("cb"),
        max("ta").as("ta"), max("tb").as("tb"),
        count(lit(1)).as("common_tokens"))
      .select(col("sa"), col("sb"), col("common_tokens"),
        ((col("sabs") +
          (col("ta") - col("ca")) * col("tb") +
          (col("tb") - col("cb")) * col("ta")).cast("double") /
          (lit(2).cast(dec) * col("ta") * col("tb")).cast("double"))
          .as("tvd"))
      .orderBy("sa", "sb")
  }

  val q292Sql: String =
    """WITH tok AS (
         SELECT source, unnest(string_split(text, ' ')) AS w
         FROM documents),
       tf AS (
         SELECT source, w, CAST(count(*) AS BIGINT) AS n
         FROM tok GROUP BY 1, 2),
       tot AS (
         SELECT source, CAST(sum(n) AS BIGINT) AS t
         FROM tf GROUP BY 1),
       j AS (
         SELECT a.source AS sa, b.source AS sb,
                CAST(a.n AS DECIMAL(38,0)) AS na,
                CAST(b.n AS DECIMAL(38,0)) AS nb,
                CAST(ta.t AS DECIMAL(38,0)) AS ta,
                CAST(tb.t AS DECIMAL(38,0)) AS tb
         FROM tf a
         JOIN tf b ON a.w = b.w AND a.source < b.source
         JOIN tot ta ON ta.source = a.source
         JOIN tot tb ON tb.source = b.source),
       g AS (
         SELECT sa, sb,
                sum(abs(na * tb - nb * ta)) AS sabs,
                sum(na) AS ca, sum(nb) AS cb,
                max(ta) AS ta, max(tb) AS tb,
                CAST(count(*) AS BIGINT) AS common_tokens
         FROM j GROUP BY 1, 2)
       SELECT sa, sb, common_tokens,
              CAST(sabs + (ta - ca) * tb + (tb - cb) * ta AS DOUBLE) /
                CAST(CAST(2 AS DECIMAL(38,0)) * ta * tb AS DOUBLE)
                AS tvd
       FROM g ORDER BY sa, sb"""

  // --- q167: sorted-neighborhood near-dup pairs ------------------------
  /** The sorted-neighborhood method (Hernández & Stolfo, SIGMOD 1995)
    * as a dedup blocking tier: sort the corpus by a blocking key (here
    * the 40-char text prefix, tie-broken by doc_id into a total
    * order), then verify ONLY each record against its w−1 successors
    * in sort order — candidate count is (w−1)·|D|, never |D|², and the
    * expensive edit-distance verification runs on 120-char probes.
    * Complements the existing blocking tiers (q26 shingle inverted
    * index, q27 MinHash bands, q93 prefix-filtered token join): SNM is
    * the method of choice when near-dups share long PREFIXES (crawl
    * re-scrapes, versioned boilerplate), and a production pipeline
    * multi-passes it with different keys.
    *
    * Scale shape: the global sort rank is
    * [[graft.operators.Ranking.globalRowNumber]] — range-partitioned,
    * no single-partition window — and the neighbor pairing is ONE
    * equi-join on the rank (the left side explodes each row to its
    * w−1 successor ranks), so the whole operator is two rank shuffles
    * plus a verification pass; no range-condition nested loop. */
  def q167SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val w = 4        // compare each record to its 3 successors
    val maxDist = 24 // ≤20% of the 120-char probe
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        substring(col("text"), 1, 40).as("bkey"),
        substring(col("text"), 1, 120).as("probe"))
    val ranked = graft.operators.Ranking.globalRowNumber(
        docs, Seq(col("bkey").asc, col("doc_id").asc), "rn")
      .select(col("doc_id"), col("probe"), col("rn"))
    val probes = ranked
      .select(col("doc_id").as("doc_a"), col("probe").as("probe_a"),
        explode(array((1 until w).map(d => col("rn") + d): _*))
          .as("rn_b"))
    probes
      .join(ranked.select(col("rn").as("rn_b"),
          col("doc_id").as("doc_b"), col("probe").as("probe_b")),
        "rn_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("probe_a"), col("probe_b")).as("dist"))
      .filter(col("dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  val q167Sql: String =
    """WITH r AS (
         SELECT doc_id, substr(text, 1, 120) AS probe,
                row_number() OVER (ORDER BY substr(text, 1, 40), doc_id)
                  AS rn
         FROM documents)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(levenshtein(a.probe, b.probe) AS INTEGER) AS dist
       FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
       WHERE levenshtein(a.probe, b.probe) <= 24
       ORDER BY doc_a, doc_b"""

  // --- q168: audio fingerprint dedup (real decode path) ----------------
  /** Re-encode-robust AUDIO dedup — the q163 flow with the audio
    * codec stack: every document materializes as a real WAV
    * ([[graft.multimodal.Multimodal.synthWav]], duplicates planted by
    * content key: docs ≡0 mod 11 carry their predecessor's PCM),
    * decodes through javax.sound.sampled, and fingerprints by RMS
    * energy contour ([[graft.multimodal.Multimodal.audioFingerprint]]:
    * 65 windows, 64 adjacent-pair bits). The mapPartitions batch
    * decode is the sanctioned binary-codec stage; the exchange carries
    * only (doc_id, fingerprint) longs. The oracle derives the planted
    * duplicate topology from the content key — the hash compare proves
    * the decoded-PCM path recovered it exactly (container-level byte
    * differences cannot split a group, distinct contents do not
    * collide in 64 noise-independent bits). */
  def q168AudioFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seeds = t(s, dir, "documents")
      .select(col("doc_id"),
        md5(when(col("doc_id") % 11 === 0, col("doc_id") - 1)
          .otherwise(col("doc_id")).cast("string")).as("seed"))
      .repartition(s.sparkContext.defaultParallelism) // q163 fan-out note
    val hashed = seeds.as[(Long, String)]
      .mapPartitions(_.map { case (id, seed) =>
        (id, graft.multimodal.Multimodal.audioFingerprint(
          graft.multimodal.Multimodal.synthWav(seed)))
      })
      .toDF("doc_id", "afp")
    hashed
      .withColumn("group_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("afp")))
      .select(col("doc_id"), col("group_size"),
        (col("group_size") > 1).as("is_dup"))
      .orderBy("doc_id")
  }

  val q168Sql: String =
    """WITH c AS (
         SELECT doc_id,
                CASE WHEN doc_id % 11 = 0 THEN doc_id - 1
                     ELSE doc_id END AS canon
         FROM documents)
       SELECT doc_id,
              CAST(count(*) OVER (PARTITION BY canon) AS BIGINT)
                AS group_size,
              count(*) OVER (PARTITION BY canon) > 1 AS is_dup
       FROM c ORDER BY doc_id"""

  // --- q169: banded Hamming near-dup join over perceptual hashes -------
  /** NEAR-duplicate pairing over 64-bit perceptual hashes — the tier
    * q163's exact-equality grouping cannot reach: docs ≡0 mod 13 carry
    * a PERTURBED re-encode of their predecessor's image
    * ([[graft.multimodal.Multimodal.perturbImage]]: one pixel nudged),
    * so their dHash is near but NOT equal. Pairing is
    * [[graft.operators.Dedup.hammingNearPairs]] — 8 contiguous 8-bit
    * chunks, pigeonhole-exact recall for Hamming ≤ 7, equi-join on
    * (chunk, value), bit_count verify per candidate — never the
    * &#124;D&#124;² compare. The oracle derives the planted pair
    * topology from the content key: the hash compare proves the
    * decode → perturb → dHash → banded-join path recovered exactly the
    * planted near-pairs (cross-content accidental pairs need Hamming
    * ≤ 7 between independent 64-bit noise — probability ~3·10⁻¹¹ per
    * pair, and the check is deterministic at fixed data). */
  def q169PhashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seeds = t(s, dir, "documents")
      .select(col("doc_id"),
        md5(when(col("doc_id") % 13 === 0, col("doc_id") - 1)
          .otherwise(col("doc_id")).cast("string")).as("seed"),
        (col("doc_id") % 13 === 0).as("pert"))
      .repartition(s.sparkContext.defaultParallelism) // q163 fan-out note
    val hashed = seeds.as[(Long, String, Boolean)]
      .mapPartitions(_.map { case (id, seed, pert) =>
        val png = graft.multimodal.Multimodal.synthImage(seed)
        val bytes =
          if (pert) graft.multimodal.Multimodal.perturbImage(png)
          else png
        (id, graft.multimodal.Multimodal.dHash(bytes))
      })
      .toDF("doc_id", "phash")
    graft.operators.Dedup
      .hammingNearPairs(hashed, "doc_id", "phash", maxDist = 7)
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")
  }

  val q169Sql: String =
    """SELECT doc_id - 1 AS id_a, doc_id AS id_b
       FROM documents
       WHERE doc_id % 13 = 0 AND doc_id > 0
       ORDER BY id_a, id_b"""

  val q47Sql: String =
    """WITH b AS (
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                     WHEN doc_id % 3 = 1 THEN 'audio/wav'
                     ELSE 'video/mp4' END AS mime,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_hash
         FROM documents)
       SELECT doc_id, mime, n_bytes, content_hash,
              CAST(n_bytes % 640 AS INTEGER) AS width,
              CAST(n_bytes % 480 AS INTEGER) AS height,
              CAST(n_bytes % 3000 AS DOUBLE) / 10.0 AS duration_s
       FROM b ORDER BY doc_id"""

  // --- q48: IVF approximate nearest neighbors --------------------------
  def q48IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb,
        numCentroids = 16, nProbe = 2, k = 3)
      .orderBy("qid", "rank")
  }

  val q48Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       cents AS (
         SELECT vec_id AS cid, e AS ce, nn AS cn FROM n
         ORDER BY vec_id LIMIT 16),
       corpus_assign AS (
         SELECT did, cid FROM (
           SELECT d.vec_id AS did, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS crank
           FROM n d CROSS JOIN cents c)
         WHERE crank <= 1),
       probe_assign AS (
         SELECT qid, cid FROM (
           SELECT q.vec_id AS qid, c.cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    (CAST(list_sum([q.e[i] * c.ce[i]
                       for i in generate_series(1, len(q.e))]) AS DOUBLE) /
                     (sqrt(CAST(q.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS crank
           FROM n q CROSS JOIN cents c WHERE q.vec_id < 10)
         WHERE crank <= 2),
       scored AS (
         SELECT p.qid, a.did,
                CAST(list_sum([qn.e[i] * dn.e[i]
                       for i in generate_series(1, len(qn.e))]) AS DOUBLE) /
                  (sqrt(CAST(qn.nn AS DOUBLE)) * sqrt(CAST(dn.nn AS DOUBLE)))
                  AS cosine
         FROM probe_assign p
         JOIN corpus_assign a ON p.cid = a.cid
         JOIN n qn ON qn.vec_id = p.qid
         JOIN n dn ON dn.vec_id = a.did),
       agg AS (SELECT qid, did, max(cosine) AS cosine FROM scored
               GROUP BY 1, 2),
       r AS (SELECT qid, did, cosine,
                    CAST(row_number() OVER (PARTITION BY qid
                      ORDER BY cosine DESC, did ASC) AS INTEGER) AS rank
             FROM agg)
       SELECT * FROM r WHERE rank <= 3 ORDER BY qid, rank"""

  // --- q64: k-means centroid training for IVF --------------------------
  /** Two Lloyd iterations from first-8-by-id seeds, then the cluster
    * occupancy of the trained index — the production centroid-training
    * step in front of q48's IVF probing. Deterministic/portable: fixed
    * iterations, integer-quantized centroids, (cosine desc, cid asc)
    * assignment tie-break. */
  def q64KmeansIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansClusterSizes(t(s, dir, "embeddings"),
        k = 8, iters = 2)
      .orderBy("cid")

  val q64Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       c0 AS (SELECT vec_id AS cid, e AS ce, nn AS cn FROM n
              ORDER BY vec_id LIMIT 8),
       a1 AS (
         SELECT did, e, nn, cid FROM (
           SELECT d.vec_id AS did, d.e, d.nn, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS r
           FROM n d CROSS JOIN c0 c) WHERE r = 1),
       m1 AS (
         SELECT cid, t.i AS dim, avg(e[t.i]) AS m
         FROM a1, unnest(generate_series(1, len(e))) AS t(i)
         GROUP BY cid, t.i),
       c1 AS (
         SELECT cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT cid, list(CAST(round(m) AS BIGINT) ORDER BY dim) AS ce
           FROM m1 GROUP BY cid)),
       a2 AS (
         SELECT did, e, nn, cid FROM (
           SELECT d.vec_id AS did, d.e, d.nn, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS r
           FROM n d CROSS JOIN c1 c) WHERE r = 1),
       m2 AS (
         SELECT cid, t.i AS dim, avg(e[t.i]) AS m
         FROM a2, unnest(generate_series(1, len(e))) AS t(i)
         GROUP BY cid, t.i),
       c2 AS (
         SELECT cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT cid, list(CAST(round(m) AS BIGINT) ORDER BY dim) AS ce
           FROM m2 GROUP BY cid)),
       afin AS (
         SELECT did, cid FROM (
           SELECT d.vec_id AS did, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS r
           FROM n d CROSS JOIN c2 c) WHERE r = 1)
       SELECT cid, CAST(count(*) AS BIGINT) AS n_members
       FROM afin GROUP BY cid ORDER BY cid"""

  // --- q69: n-gram repetition quality signals (Gopher-style) -----------
  /** The repetition rules large-corpus filters apply (Rae et al. 2021,
    * "Gopher", §A1.1): fraction of duplicated 2-grams / 3-grams per
    * document, and the pass/fail gate at the paper's thresholds. All
    * expression-level (shingle arrays + array_distinct) — zero shuffle,
    * whole-stage codegen, one pass over the corpus. */
  def q69Repetition(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("__tk"))
      .select(col("doc_id"),
        Dedup.shinglesOfTokens(col("__tk"), 2).as("__g2"),
        Dedup.shinglesOfTokens(col("__tk"), 3).as("__g3"))
      .select(col("doc_id"),
        dupGramFrac(col("__g2")).as("dup_2gram_frac"),
        dupGramFrac(col("__g3")).as("dup_3gram_frac"))
      .withColumn("repetition_pass",
        col("dup_2gram_frac") <= 0.2 && col("dup_3gram_frac") <= 0.18)
      .orderBy("doc_id")
  }

  val q69Sql: String =
    """WITH tk AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       g AS (
         SELECT doc_id,
           CASE WHEN len(t) >= 2 THEN
             [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
           ELSE [] END AS g2,
           CASE WHEN len(t) >= 3 THEN
             [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
           ELSE [] END AS g3
         FROM tk),
       f AS (
         SELECT doc_id,
           CASE WHEN len(g2) > 0 THEN
             1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) /
                   CAST(len(g2) AS DOUBLE) ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0 THEN
             1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) /
                   CAST(len(g3) AS DOUBLE) ELSE 0.0 END AS dup_3gram_frac
         FROM g)
       SELECT doc_id, dup_2gram_frac, dup_3gram_frac,
              (dup_2gram_frac <= 0.2 AND dup_3gram_frac <= 0.18)
                AS repetition_pass
       FROM f ORDER BY doc_id"""

  // --- q73: train/benchmark decontamination ----------------------------
  /** Benchmark decontamination — the n-gram-collision filter every
    * serious training corpus runs before training (the 13-gram overlap
    * rule of Brown et al. 2020 "GPT-3" §C / Raffel et al. 2020 "C4";
    * 5-grams here, sized to the synthetic docs): documents from one
    * held-out source (`src0`) play the benchmark set, and every OTHER
    * document is flagged with the number of distinct token 5-grams it
    * shares with any benchmark document.
    *
    * Scale shape: a benchmark suite is tiny next to a 100 TB training
    * corpus, so its distinct gram set BROADCASTS — the training side
    * streams through one broadcast hash join and aggregates per doc; no
    * shuffle of the corpus's gram stream, no all-pairs comparison. */
  def q73Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("__tk"))
      .select(col("doc_id"), col("source"),
        explode(Dedup.shinglesOfTokens(col("__tk"), 5)).as("g"))
    val bench = grams.filter(col("source") === "src0")
      .select("g").distinct()
    grams.filter(col("source") =!= "src0")
      .join(broadcast(bench), Seq("g"))
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  val q73Sql: String =
    """WITH tk AS (
         SELECT doc_id, source, string_split(text, ' ') AS t
         FROM documents),
       grams AS (
         SELECT doc_id, source, g
         FROM (SELECT doc_id, source,
                 CASE WHEN len(t) >= 5 THEN
                   [array_to_string(t[i:i+4], ' ')
                    for i in range(1, len(t) - 3)]
                 ELSE [] END AS gs
               FROM tk), unnest(gs) AS u(g)),
       bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
       SELECT gr.doc_id,
              CAST(count(DISTINCT gr.g) AS BIGINT) AS n_shared_grams
       FROM grams gr JOIN bench b USING (g)
       WHERE gr.source <> 'src0'
       GROUP BY gr.doc_id ORDER BY gr.doc_id"""

  // --- q74: per-source quota sampling ----------------------------------
  /** Domain-contribution capping — no single source may contribute more
    * than K documents (the per-domain quota rule corpus mixers apply so
    * one crawl domain cannot dominate the training mix). Selection is
    * deterministic: rank docs within each source by a 60-bit content
    * hash of their id ([[Dedup.hash60]] — engine-identical, re-run
    * stable) and keep the first K.
    *
    * Scale shape: `row_number <= K` over a partitioned window compiles
    * to WindowGroupLimit in Spark 4 — each map task keeps only its own
    * top-K per source BEFORE the exchange, so the shuffle carries
    * O(sources × K) rows, not the corpus. */
  def q74QuotaSample(s: SparkSession, dir: String): DataFrame = {
    val k = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(Dedup.hash60(col("doc_id").cast("string")).asc,
        col("doc_id").asc)
    t(s, dir, "documents")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("kept_chars"))
      .orderBy("source")
  }

  val q74Sql: String =
    """WITH ranked AS (
         SELECT source, n_chars, row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      ::BIGINT, doc_id) AS rk
         FROM documents)
       SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
              CAST(sum(n_chars) AS BIGINT) AS kept_chars
       FROM ranked WHERE rk <= 20
       GROUP BY source ORDER BY source"""

  // --- q75: PII detection + redaction ----------------------------------
  /** PII scrubbing — the redaction pass privacy-conscious corpus builders
    * run before training (emails and IPv4 addresses here; the same shape
    * extends to phone numbers, SSNs, keys). The harness documents are
    * synthetic word soup with no real PII, so each document plants one
    * deterministic email and one IPv4 derived from its own doc_id
    * (mirrored exactly in the oracle) — the detector then has true
    * positives to find, and the md5 of the redacted text proves both
    * engines rewrote the same spans the same way.
    *
    * Scale shape: a pure expression pass (regexp_extract_all /
    * regexp_replace inside whole-stage codegen) — zero shuffle beyond the
    * output sort. Cross-engine note: Spark compiles the patterns with
    * java.util.regex, DuckDB with RE2, so the patterns stay inside the
    * common-semantics subset (character classes, bounded repetition,
    * \b anchors — no backreferences, no lookaround). */
  def q75PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val planted = concat(col("text"),
      lit(" reach user"), col("doc_id").cast("string"),
      lit("@mail.example.com from 10."),
      (col("doc_id") % 250).cast("string"), lit("."),
      ((col("doc_id") * 7) % 250).cast("string"), lit(".42"))
    t(s, dir, "documents")
      .select(col("doc_id"), planted.as("__p"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("__p"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("__p"), lit(ipRe), lit(0)))
          .cast("long").as("n_ips"),
        md5(regexp_replace(
          regexp_replace(col("__p"), emailRe, "<EMAIL>"),
          ipRe, "<IP>")).as("redacted_hash"))
      .orderBy("doc_id")
  }

  val q75Sql: String =
    """WITH planted AS (
         SELECT doc_id,
                text || ' reach user' || CAST(doc_id AS VARCHAR) ||
                '@mail.example.com from 10.' ||
                CAST(doc_id % 250 AS VARCHAR) || '.' ||
                CAST((doc_id * 7) % 250 AS VARCHAR) || '.42' AS p
         FROM documents)
       SELECT doc_id,
              CAST(len(regexp_extract_all(p,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(p,
                '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
              md5(regexp_replace(regexp_replace(p,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'))
                AS redacted_hash
       FROM planted ORDER BY doc_id"""

  // --- q76: BM25 keyword retrieval -------------------------------------
  /** BM25-ranked keyword retrieval over the corpus (Robertson et al.,
    * TREC-3 "Okapi at TREC-3", 1994): tf saturation (k1 = 1.2) and
    * document-length normalization (b = 0.75) exactly as published; the
    * idf factor uses the unlogged Robertson–Sparck-Jones odds ratio
    * (N − df + 0.5)/(df + 0.5) rather than its logarithm, because ln is
    * the one non-correctly-rounded IEEE operation in the formula — two
    * engines' libm may differ in the last ulp, and a differential test
    * on raw doubles must stay bit-exact. Rare-term weighting, tf
    * saturation and length normalization — the parts of BM25 that do the
    * ranking work — are preserved; every arithmetic op (+, ×, ÷) is
    * IEEE-correctly-rounded and evaluated in the same written order in
    * both engines.
    *
    * Scale shape: term frequencies come from expression-level
    * `filter(tokens)` counts — no explode of the corpus, no per-term
    * shuffle. The corpus-wide stats (N, avgdl, per-term df) reduce to ONE
    * broadcast row, scoring is map-side, and the final top-k compiles to
    * TakeOrderedAndProject — each task keeps its own top 10, the driver
    * merges 32×10 rows, the corpus is never globally sorted. */
  def q76Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "window", "hash")
    val base = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("__tk"))
      .select(col("doc_id") +:
        size(col("__tk")).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (tm, i) =>
          size(filter(col("__tk"), x => x === lit(tm)))
            .cast("double").as(s"tf$i") }: _*)
    val statAggs =
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i"))
    val stats = base.agg(count(lit(1)).cast("double").as("n"),
      statAggs: _*)
    val perTerm = terms.indices.map { i =>
      ((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5)) *
        (col(s"tf$i") * 2.2) /
        (col(s"tf$i") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), perTerm.reduce(_ + _).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  val q76Sql: String =
    """WITH d AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       f AS (
         SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl,
                CAST(len(list_filter(tk, x -> x = 'spark')) AS DOUBLE) AS tf0,
                CAST(len(list_filter(tk, x -> x = 'window')) AS DOUBLE) AS tf1,
                CAST(len(list_filter(tk, x -> x = 'hash')) AS DOUBLE) AS tf2
         FROM d),
       st AS (
         SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
                sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
                sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
                sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
         FROM f),
       sc AS (
         SELECT doc_id,
                (n - df0 + 0.5) / (df0 + 0.5) * (tf0 * 2.2) /
                  (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
                (n - df1 + 0.5) / (df1 + 0.5) * (tf1 * 2.2) /
                  (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
                (n - df2 + 0.5) / (df2 + 0.5) * (tf2 * 2.2) /
                  (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
         FROM f CROSS JOIN st)
       SELECT doc_id, score FROM sc WHERE score > 0
       ORDER BY score DESC, doc_id LIMIT 10"""

  // --- q77: int8 scalar quantization of embeddings ---------------------
  /** Int8 scalar quantization of the embedding column — the 4× index
    * compression every large ANN deployment applies before serving
    * (per-vector min/max scaling to 256 codes, as in FAISS
    * ScalarQuantizer.QT_8bit). Emits per-vector quantization quality:
    * the code-space occupancy and the worst absolute reconstruction
    * error in quantized (×10⁶) units.
    *
    * Scale shape: per-row array expressions end-to-end (transform /
    * zip_with / array_min / array_max) — zero shuffle beyond the output
    * sort, and the natural pre-pass to [[Similarity]]'s IVF serving path
    * at a memory budget. Determinism: inputs are the same ×10⁶-quantized
    * longs the whole vector family uses; every downstream op is integer
    * arithmetic or a single correctly-rounded double division, so the
    * doubles hash-match across engines bit-exactly. */
  def q77QuantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val e = col("__e")
    val span = (col("mx") - col("mn")).cast("double")
    val codes = transform(e, x =>
      round((x - col("mn")).cast("double") * 255.0 / span).cast("long"))
    val maxErr = array_max(zip_with(e, col("__q"), (x, q) =>
      abs(col("mn") + (q * (col("mx") - col("mn"))).cast("double") / 255.0
        - x.cast("double"))))
    t(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("__e"))
      .select(col("vec_id"), e,
        array_min(e).as("mn"), array_max(e).as("mx"))
      .select(col("vec_id"), e, col("mn"), col("mx"),
        when(col("mx") === col("mn"), array(lit(0L)))
          .otherwise(codes).as("__q"))
      .select(col("vec_id"), col("mn"), col("mx"),
        size(array_distinct(col("__q"))).cast("long").as("n_codes"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(round(maxErr).cast("long")).as("max_err_q"))
      .orderBy("vec_id")
  }

  val q77Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       mm AS (
         SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v),
       q AS (
         SELECT vec_id, e, mn, mx,
                CASE WHEN mx = mn THEN [CAST(0 AS BIGINT)] ELSE
                  [CAST(round(CAST(x - mn AS DOUBLE) * 255.0 /
                     CAST(mx - mn AS DOUBLE)) AS BIGINT) for x in e]
                END AS qs
         FROM mm)
       SELECT vec_id, mn, mx,
              CAST(len(list_distinct(qs)) AS BIGINT) AS n_codes,
              CASE WHEN mx = mn THEN CAST(0 AS BIGINT) ELSE
                CAST(round(list_max(
                  [abs(mn + CAST(qs[i] * (mx - mn) AS DOUBLE) / 255.0 -
                       CAST(e[i] AS DOUBLE))
                   for i in generate_series(1, len(e))])) AS BIGINT)
              END AS max_err_q
       FROM q ORDER BY vec_id"""

  // --- q78: sentence-level (chunk) dedup with document reassembly ------
  /** C4-style duplicate-span removal (Raffel et al. 2020 §2.2 dedup
    * three-sentence spans; Lee et al. 2021 "Deduplicating Training Data"
    * removes exact substrings): every 8-token chunk that occurs anywhere
    * earlier in the corpus (first occurrence = smallest (doc_id, pos)) is
    * deleted, and each document is REASSEMBLED from its surviving chunks
    * in order — the whole-document dedup family (q25-q28) can only drop
    * documents; this rewrites them. True positives are planted: a copy of
    * each ≥24-token document carrying its first three chunks verbatim
    * plus a fresh tail, mirrored in the oracle. Chunk-boundary alignment
    * means a SHIFTED duplicate span is invisible here — that is inherent
    * to fixed chunking (C4 has the same blind spot) and is what the
    * shingle-based detectors (q26/q27) exist for.
    *
    * Scale shape: two narrow shuffles. Keep-first is `row_number() = 1`
    * over (chunk-hash → (doc_id, pos)) — Spark 4 compiles the rank
    * filter to WindowGroupLimit, so each map task forwards ONE candidate
    * per chunk-hash and the exchange carries (hash, id, pos) triples,
    * never text. Reassembly shuffles surviving chunk text once, grouped
    * by doc_id — rewriting documents cannot shuffle less than the
    * surviving content itself. */
  def q78SentenceDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(size(split(col("text"), " ")) >= 24)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(concat_ws(" ", slice(split(col("text"), " "), 1, 24)),
            lit(" zz yy xx")).as("text")))
    val chunks = corpus
      .select(col("doc_id"), split(col("text"), " ").as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L),
            ceil(size(col("__tk")).cast("double") / 8.0).cast("long") - 1),
          i => concat_ws(" ",
            slice(col("__tk"), (i * 8 + 1).cast("int"), lit(8)))))
          .as(Seq("pos", "chunk")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("doc_id", "pos")
    chunks.withColumn("h", Dedup.hash60(col("chunk")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk")))).as("clean_hash"))
      .orderBy("doc_id")
  }

  val q78Sql: String =
    """WITH corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id,
                array_to_string(string_split(text, ' ')[1:24], ' ') ||
                ' zz yy xx' AS text
         FROM documents WHERE len(string_split(text, ' ')) >= 24),
       tk AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM corpus
         WHERE len(string_split(text, ' ')) > 0),
       ch AS (
         SELECT doc_id, u.i AS pos,
                array_to_string(t[(u.i*8+1):(u.i*8+8)], ' ') AS chunk
         FROM tk, unnest(generate_series(0,
                CAST(ceil(CAST(len(t) AS DOUBLE) / 8.0) AS BIGINT) - 1))
              AS u(i)),
       keep AS (
         SELECT doc_id, pos, chunk FROM (
           SELECT doc_id, pos, chunk, row_number() OVER (
             PARTITION BY ('0x' || substr(md5(chunk), 1, 15))::BIGINT
             ORDER BY doc_id, pos) AS rn
           FROM ch) WHERE rn = 1)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              md5(array_to_string(list(chunk ORDER BY pos), ' '))
                AS clean_hash
       FROM keep GROUP BY doc_id ORDER BY doc_id"""

  // --- q67: IVF serving over TRAINED centroids -------------------------
  /** The two halves of the production ANN story composed: q64's k-means
    * training (2 Lloyd iterations, k=8) produces the centroid index, and
    * q48's IVF probing serves queries from those trained cells. Oracle:
    * q64's centroid CTEs (through c2) feeding q48's probe CTEs. */
  def q67IvfTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val trained = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    Similarity.ivfTopKWith(emb.filter(col("vec_id") < 10), emb, trained,
        nProbe = 2, k = 3)
      .orderBy("qid", "rank")
  }

  val q67Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       c0 AS (SELECT vec_id AS cid, e AS ce, nn AS cn FROM n
              ORDER BY vec_id LIMIT 8),
       a1 AS (
         SELECT did, e, nn, cid FROM (
           SELECT d.vec_id AS did, d.e, d.nn, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS r
           FROM n d CROSS JOIN c0 c) WHERE r = 1),
       m1 AS (
         SELECT cid, t.i AS dim, avg(e[t.i]) AS m
         FROM a1, unnest(generate_series(1, len(e))) AS t(i)
         GROUP BY cid, t.i),
       c1 AS (
         SELECT cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT cid, list(CAST(round(m) AS BIGINT) ORDER BY dim) AS ce
           FROM m1 GROUP BY cid)),
       a2 AS (
         SELECT did, e, nn, cid FROM (
           SELECT d.vec_id AS did, d.e, d.nn, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS r
           FROM n d CROSS JOIN c1 c) WHERE r = 1),
       m2 AS (
         SELECT cid, t.i AS dim, avg(e[t.i]) AS m
         FROM a2, unnest(generate_series(1, len(e))) AS t(i)
         GROUP BY cid, t.i),
       c2 AS (
         SELECT cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT cid, list(CAST(round(m) AS BIGINT) ORDER BY dim) AS ce
           FROM m2 GROUP BY cid)),
       corpus_assign AS (
         SELECT did, cid FROM (
           SELECT d.vec_id AS did, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS crank
           FROM n d CROSS JOIN c2 c)
         WHERE crank <= 1),
       probe_assign AS (
         SELECT qid, cid FROM (
           SELECT q.vec_id AS qid, c.cid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    (CAST(list_sum([q.e[i] * c.ce[i]
                       for i in generate_series(1, len(q.e))]) AS DOUBLE) /
                     (sqrt(CAST(q.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS crank
           FROM n q CROSS JOIN c2 c WHERE q.vec_id < 10)
         WHERE crank <= 2),
       scored AS (
         SELECT p.qid, a.did,
                CAST(list_sum([qn.e[i] * dn.e[i]
                       for i in generate_series(1, len(qn.e))]) AS DOUBLE) /
                  (sqrt(CAST(qn.nn AS DOUBLE)) * sqrt(CAST(dn.nn AS DOUBLE)))
                  AS cosine
         FROM probe_assign p
         JOIN corpus_assign a ON p.cid = a.cid
         JOIN n qn ON qn.vec_id = p.qid
         JOIN n dn ON dn.vec_id = a.did),
       agg AS (SELECT qid, did, max(cosine) AS cosine FROM scored
               GROUP BY 1, 2),
       r AS (SELECT qid, did, cosine,
                    CAST(row_number() OVER (PARTITION BY qid
                      ORDER BY cosine DESC, did ASC) AS INTEGER) AS rank
             FROM agg)
       SELECT * FROM r WHERE rank <= 3 ORDER BY qid, rank"""

  // --- q49: session windows (30-min gap) over events -------------------
  /** Spark's `session_window`; the oracle reproduces it as the classic
    * gap-and-islands rewrite (new session when the gap ≥ 30 min). */
  def q49SessionWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val q49Sql: String =
    """WITH m AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       g AS (
         SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
         FROM m)
       SELECT user_id,
              min(ts) AS session_start,
              max(ts) + INTERVAL 30 MINUTE AS session_end,
              CAST(count(*) AS BIGINT) AS n_events,
              sum(value) AS sum_value
       FROM g GROUP BY user_id, sid
       ORDER BY user_id, session_start"""

  // --- q79: SCD2 history derivation ------------------------------------
  /** Type-2 slowly-changing-dimension history from an event stream
    * (Kimball & Ross, The Data Warehouse Toolkit, ch. 5): per user,
    * consecutive events with the SAME state collapse, and each state
    * CHANGE opens a history row with `valid_from` = its timestamp and
    * `valid_to` = the next change's timestamp (null = current row). The
    * reference's star model is insert-only snapshots; this is the
    * standard versioned-dimension derivation it cannot express.
    *
    * Scale shape: one shuffle on the entity key; both window passes
    * (change detection via lag, interval close via lead) share the same
    * (user_id → ts, event_id) sort order, so Catalyst plans ONE exchange
    * + sort and the second Window rides the first's ordering. The
    * change-collapse filter runs BEFORE the lead pass, so the second
    * window sees only transition rows. */
  def q79Scd2History(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      // change_event_id doubles as provenance AND the deterministic sort
      // tie-break: two changes can share a (µs-truncated) valid_from,
      // and a non-unique ORDER BY would let the two engines emit tied
      // rows in different orders
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("event_id").as("change_event_id"))
      .orderBy("user_id", "valid_from", "change_event_id")
  }

  val q79Sql: String =
    """WITH marked AS (
         SELECT user_id, ts, event_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev
         FROM events),
       changes AS (
         SELECT user_id, ts, event_id, event_type FROM marked
         WHERE prev IS NULL OR prev <> event_type)
       SELECT user_id, event_type, ts AS valid_from,
              lead(ts) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS valid_to,
              (lead(ts) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) IS NULL) AS is_current,
              event_id AS change_event_id
       FROM changes ORDER BY user_id, valid_from, change_event_id"""

  // --- q80: funnel conversion ------------------------------------------
  /** Event-funnel analysis: of the users who ever signed up, how many
    * later purchased, and how long did conversion take. First-touch
    * attribution: the earliest signup is the anchor, the first purchase
    * at-or-after it the conversion. The product-analytics staple over
    * exactly this event-log shape.
    *
    * Scale shape: anchor and conversion both come from ONE window pass
    * over the same (user_id → ts, event_id) order — signup anchor as a
    * running conditional min, conversion via the change-collapse-free
    * min over qualifying purchases in a second aggregation on the same
    * exchange. The final rollup reduces per-user rows to one summary
    * row; the event log is never shuffled twice. */
  def q80Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val perUser = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      // running first-signup anchor, available at every later event
      .withColumn("__signup",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts")))
          .as("signup_ts"),
        min(when(col("event_type") === "purchase" &&
            col("__signup").isNotNull && col("ts") >= col("__signup"),
          col("ts"))).as("conv_ts"))
      .filter(col("signup_ts").isNotNull)
    perUser.agg(
      count(lit(1)).as("n_signup_users"),
      sum(when(col("conv_ts").isNotNull, 1L).otherwise(0L))
        .as("n_converted"),
      sum(when(col("conv_ts").isNotNull,
          unix_timestamp(col("conv_ts")) - unix_timestamp(col("signup_ts")))
        .otherwise(0L)).as("conv_seconds_total"))
  }

  val q80Sql: String =
    """WITH anchored AS (
         SELECT user_id, ts, event_type,
                min(CASE WHEN event_type = 'signup' THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS anchor
         FROM events),
       per_user AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'signup' THEN ts END)
                  AS signup_ts,
                min(CASE WHEN event_type = 'purchase'
                         AND anchor IS NOT NULL AND ts >= anchor
                         THEN ts END) AS conv_ts
         FROM anchored GROUP BY user_id)
       SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
              CAST(sum(CASE WHEN conv_ts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted,
              CAST(sum(CASE WHEN conv_ts IS NOT NULL THEN
                  date_diff('second', signup_ts, conv_ts) ELSE 0 END)
                AS BIGINT) AS conv_seconds_total
       FROM per_user WHERE signup_ts IS NOT NULL"""

  // --- q81: training-sequence packing ----------------------------------
  /** Sequence packing — the step that turns a filtered corpus into
    * fixed-length training contexts (GPT-style pretraining concatenates
    * documents and splits at the context boundary; packing efficiency
    * drives tokens-per-step). Documents are packed per SOURCE shard in
    * deterministic doc_id order: a running token cumsum assigns each
    * document the context bin where it STARTS (straddling the boundary,
    * as concatenation does), bin = (cumsum − n_tok) div 512. Emits per
    * (source, bin): documents started and their token mass.
    *
    * Scale shape: packing is a prefix-scan, which is sequential per
    * packing unit — so the unit is the shard (source here; (source,
    * shard) at corpus scale), making the scan embarrassingly parallel
    * across shards: ONE exchange on source, the window cumsum runs
    * inside each shard, and the per-bin rollup partial-aggregates before
    * its (tiny) exchange. All arithmetic is integer-exact; `div` is
    * integer division in both engines. */
  def q81PackSequences(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .select(col("source"), col("n_tok"),
        expr("(__cum - n_tok) div 512").as("bin_id"))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens_sum"))
      .orderBy("source", "bin_id")
  }

  val q81Sql: String =
    """WITH d AS (
         SELECT source, doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         FROM documents),
       c AS (
         SELECT source, n_tok,
                sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum
         FROM d)
       SELECT source, CAST((cum - n_tok) // 512 AS BIGINT) AS bin_id,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS tokens_sum
       FROM c GROUP BY source, bin_id ORDER BY source, bin_id"""

  // --- q82: incremental dedup against a persisted signature index ------
  /** The daily-increment dedup flow: the corpus's MinHash signatures are
    * built ONCE, persisted as a parquet index, and each incoming batch
    * probes that index — never re-shingling the corpus. The batch here
    * is a perturbed copy of the `src0` documents (first token dropped,
    * doc_id + 1000000), so every batch doc has a true near-dup to find;
    * the oracle rebuilds both sides from the raw table, proving the
    * persisted index is lossless. Output per batch doc: candidate count
    * and the best signature-estimated Jaccard.
    *
    * Scale shape: the whole point of the index. Probing shuffles only
    * (sid, band, band_key) triples from the index side plus the batch's
    * own bands — O(index + batch) narrow rows, not O(corpus text); the
    * signature fetch for the estimate joins only the candidates'
    * signature rows. At 100 TB the index is bucketed by band_key so the
    * probe co-locates without any index-side shuffle at all. */
  def q82IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_mhidx_")
      .toString
    try {
      val docs = t(s, dir, "documents")
      Dedup.minHashSignatures(
          Dedup.docShingles(docs, "doc_id", "text", 3), 16)
        .write.mode("overwrite").parquet(s"$root/minhash_index")
      val index = s.read.parquet(s"$root/minhash_index")
      val inc = docs.filter(col("source") === "src0")
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substr(text, instr(text, ' ') + 1)").as("text"))
      val incSigs = Dedup.minHashSignatures(
        Dedup.docShingles(inc, "doc_id", "text", 3), 16)
      val cand = Dedup.lshBands(incSigs, 16, 4).as("x")
        .join(Dedup.lshBands(index, 16, 4).as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key"))
        .select(col("x.sid").as("new_id"), col("y.sid").as("idx_id"))
        .distinct()
      val out = cand
        .join(incSigs.select(col("sid").as("new_id"),
          col("sig").as("sig_n")), "new_id")
        .join(index.select(col("sid").as("idx_id"),
          col("sig").as("sig_i")), "idx_id")
        .select(col("new_id"),
          (aggregate(
            zip_with(col("sig_n"), col("sig_i"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / 16)
            .as("est_jaccard"))
        .groupBy(col("new_id").as("doc_id"))
        .agg(count(lit(1)).as("n_candidates"),
          max(col("est_jaccard")).as("best_est"))
        .orderBy("doc_id")
      // materialize BEFORE the finally deletes the index files the lazy
      // plan would otherwise read after they are gone; the per-batch
      // summary is tiny (one row per batch doc) by construction
      s.createDataFrame(java.util.Arrays.asList(out.collect(): _*),
        out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q82Sql: String =
    """WITH idx_tk AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       idx_sh AS (
         SELECT DISTINCT doc_id AS sid,
                unnest([('0x' ||
                         substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15)
                        )::BIGINT
                        for i in range(1, len(tk) - 1)]) AS h
         FROM idx_tk WHERE len(tk) >= 3),
       perms AS (SELECT unnest(range(0, 16)) AS perm),
       idx_sig AS (
         SELECT sid, perm,
                min(((2 * perm + 1) * (h % 2147483647) +
                     (7919 * perm + 13)) % 2147483647) AS sig
         FROM idx_sh CROSS JOIN perms GROUP BY 1, 2),
       idx_band AS (
         SELECT sid, perm // 4 AS band,
                md5(min(CASE WHEN perm % 4 = 0 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 1 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 2 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 3 THEN sig END)::VARCHAR)
                  AS band_key
         FROM idx_sig GROUP BY 1, 2),
       inc AS (
         SELECT doc_id + 1000000 AS doc_id,
                substr(text, instr(text, ' ') + 1) AS text
         FROM documents WHERE source = 'src0'),
       inc_tk AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM inc),
       inc_sh AS (
         SELECT DISTINCT doc_id AS sid,
                unnest([('0x' ||
                         substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15)
                        )::BIGINT
                        for i in range(1, len(tk) - 1)]) AS h
         FROM inc_tk WHERE len(tk) >= 3),
       inc_sig AS (
         SELECT sid, perm,
                min(((2 * perm + 1) * (h % 2147483647) +
                     (7919 * perm + 13)) % 2147483647) AS sig
         FROM inc_sh CROSS JOIN perms GROUP BY 1, 2),
       inc_band AS (
         SELECT sid, perm // 4 AS band,
                md5(min(CASE WHEN perm % 4 = 0 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 1 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 2 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 3 THEN sig END)::VARCHAR)
                  AS band_key
         FROM inc_sig GROUP BY 1, 2),
       cand AS (
         SELECT DISTINCT x.sid AS new_id, y.sid AS idx_id
         FROM inc_band x
         JOIN idx_band y ON x.band = y.band AND x.band_key = y.band_key),
       est AS (
         SELECT new_id, idx_id,
                CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                  AS DOUBLE) / 16 AS est_jaccard
         FROM cand
         JOIN inc_sig sa ON sa.sid = new_id
         JOIN idx_sig sb ON sb.sid = idx_id AND sb.perm = sa.perm
         GROUP BY 1, 2)
       SELECT new_id AS doc_id, CAST(count(*) AS BIGINT) AS n_candidates,
              max(est_jaccard) AS best_est
       FROM est GROUP BY 1 ORDER BY doc_id"""

  // --- q83: corpus report card -----------------------------------------
  /** The corpus composition dashboard every pipeline run publishes: ONE
    * scan computes every per-document signal this library ships —
    * quality score (q32), language-ID agreement (q31), Gopher repetition
    * gate (q69), token mass — and rolls them up per (source, lang).
    * Composability is the point: the signals are library functions, so
    * the report is a projection + one groupBy, not a fleet of separate
    * jobs re-reading 100 TB once per metric.
    *
    * Determinism discipline: only INTEGER counts are aggregated (count,
    * token sum, boolean gates) — averaging per-doc doubles would make
    * the result depend on partial-sum order across partitions. The one
    * ratio column is a single division of two exact longs, correctly
    * rounded, identical in both engines. */
  def q83CorpusReport(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents")
      .select(col("source"), col("lang"), col("text"),
        split(col("text"), " ").as("__tk"))
      .select(col("source"), col("lang"),
        wsTokenCount(col("text")).cast("long").as("n_tok"),
        (qualityScore(col("text")) >= 2).as("q_ok"),
        (langId(col("text")) === col("lang")).as("l_ok"),
        (dupGramFrac(Dedup.shinglesOfTokens(col("__tk"), 2)) <= 0.2 &&
          dupGramFrac(Dedup.shinglesOfTokens(col("__tk"), 3)) <= 0.18)
          .as("r_ok"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("tokens_total"),
        sum(when(col("q_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
        sum(when(col("l_ok"), 1L).otherwise(0L)).as("n_lang_match"),
        sum(when(col("r_ok"), 1L).otherwise(0L)).as("n_repetition_pass"))
      .withColumn("quality_rate",
        col("n_quality_ok").cast("double") / col("n_docs").cast("double"))
      .orderBy("source", "lang")
  }

  val q83Sql: String =
    """WITH base AS (
         SELECT source, lang, text, string_split(text, ' ') AS t,
                lower(text) AS lt
         FROM documents),
       per AS (
         SELECT source, lang,
           CAST(len(t) AS BIGINT) AS n_tok,
           (CASE WHEN len(t) BETWEEN 20 AND 2000 THEN 2
                 WHEN len(t) BETWEEN 5 AND 19 THEN 1 ELSE -1 END) +
           (CASE WHEN CAST(len(list_distinct(t)) AS DOUBLE) /
                        CAST(len(t) AS DOUBLE) >= 0.4 THEN 2
                 WHEN CAST(len(list_distinct(t)) AS DOUBLE) /
                        CAST(len(t) AS DOUBLE) >= 0.2 THEN 1 ELSE 0 END) +
           (CASE WHEN CAST(len(regexp_extract_all(lt,
                  '\b(the|a|and|of|is|der|die|und|le|la|et|el|los|y)\b'))
                  AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.05
                 THEN 1 ELSE 0 END) +
           (CASE WHEN CAST(len(regexp_extract_all(text, '[^\w\s]'))
                  AS DOUBLE) / CAST(length(text) AS DOUBLE) > 0.2 THEN -2
                 WHEN CAST(len(regexp_extract_all(text, '[^\w\s]'))
                  AS DOUBLE) / CAST(length(text) AS DOUBLE) > 0.1 THEN -1
                 ELSE 0 END) AS score,
           len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh_n,
           len(regexp_extract_all(lt,
             '\b(the|and|of|is|to|in|that|it)\b')) AS s_en,
           len(regexp_extract_all(lt,
             '\b(der|die|das|und|ist|nicht|ein|zu)\b')) AS s_de,
           len(regexp_extract_all(lt,
             '\b(le|la|les|et|est|une|que|dans)\b')) AS s_fr,
           len(regexp_extract_all(lt,
             '\b(el|los|las|y|es|una|que|en)\b')) AS s_es,
           CASE WHEN len(t) >= 2 THEN
             [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
           ELSE [] END AS g2,
           CASE WHEN len(t) >= 3 THEN
             [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
           ELSE [] END AS g3
         FROM base),
       flags AS (
         SELECT source, lang, n_tok,
           (score >= 2) AS q_ok,
           ((CASE WHEN zh_n > 0 THEN 'zh'
                  WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  ELSE 'unknown' END) = lang) AS l_ok,
           ((CASE WHEN len(g2) > 0 THEN
               1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) /
                     CAST(len(g2) AS DOUBLE) ELSE 0.0 END) <= 0.2
            AND
            (CASE WHEN len(g3) > 0 THEN
               1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) /
                     CAST(len(g3) AS DOUBLE) ELSE 0.0 END) <= 0.18) AS r_ok
         FROM per)
       SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS tokens_total,
              CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT)
                AS n_quality_ok,
              CAST(sum(CASE WHEN l_ok THEN 1 ELSE 0 END) AS BIGINT)
                AS n_lang_match,
              CAST(sum(CASE WHEN r_ok THEN 1 ELSE 0 END) AS BIGINT)
                AS n_repetition_pass,
              CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS DOUBLE) /
                CAST(count(*) AS DOUBLE) AS quality_rate
       FROM flags GROUP BY source, lang ORDER BY source, lang"""

  // --- q85: rolling time-interval window -------------------------------
  /** Trailing-hour rolling aggregates per entity — the RANGE-frame
    * (value-bounded) window family, distinct from q21's ROWS frames: the
    * frame is "every event within the last hour", however many rows
    * that is. Rate limiting, velocity features and anomaly baselines are
    * this exact shape.
    *
    * Determinism: the frame is bounded by VALUES (epoch µs offsets), so
    * same-timestamp peers are all in-frame regardless of tie order, and
    * the summed quantity is integer cents — no float-order dependence.
    * Scale shape: one entity-key exchange; the range frame evaluates
    * with a sliding two-pointer pass over each partition's sort, not a
    * per-row rescan. */
  def q85RollingWindow(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("__us"))
      .rangeBetween(-3600000000L, 0)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("__us"),
        round(col("value") * 100).cast("long").as("__cents"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum(col("__cents")).over(w))
      .select(col("user_id"), col("event_id"), col("n_1h"), col("cents_1h"))
      .orderBy("user_id", "event_id")
  }

  val q85Sql: String =
    """WITH e AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
                CAST(round(value * 100) AS BIGINT) AS cents
         FROM events)
       SELECT user_id, event_id,
              CAST(count(*) OVER w AS BIGINT) AS n_1h,
              CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
       FROM e
       WINDOW w AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, event_id"""

  // --- q86: PMI collocation mining -------------------------------------
  /** Collocation mining — the corpus-linguistics PMI lift that surfaces
    * multiword units (Church & Hanks 1990): for adjacent token pairs,
    * lift = p(w1,w2) / (p(w1)·p(w2)) = c12·Nu² / (Nb·c1·c2), reported
    * for pairs seen ≥ 5 times, top 20. The log is deliberately NOT
    * applied (log-PMI ranks identically — log is monotone — and ln is
    * the one non-correctly-rounded op that would break cross-engine
    * bit-exactness; same policy as q76's idf).
    *
    * Scale shape: two count aggregations over (token) and (token-pair)
    * keys — narrow rows, map-side partial combine — then the pair table
    * joins the unigram counts twice. The unigram table is computed
    * ONCE and persisted (it feeds both join sides and the Nu total —
    * unpersisted-and-recomputed that is three corpus scans), and its
    * count — needed for nothing else — doubles as the broadcast guard:
    * vocabulary is corpus-dependent (Heaps' law puts a web corpus's at
    * 10⁸+), so the join hint applies only under the same 4M-row cutoff
    * as [[graft.operators.Graphs.triangleStats]]; beyond it both joins
    * shuffle on the token, which is the right plan there. Numerators
    * stay inside Long:
    * c12·Nu² with a 100 TB corpus exceeds 2⁶³, so the real deployment
    * promotes to DecimalType(38) — here the exact-long form doubles as
    * the oracle contract. Top-20 compiles to TakeOrderedAndProject. */
  def q86Collocations(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(split(col("text"), " ").as("__tk"))
    val uni = toks.select(explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).persist()
    // materializes the cache; doubles as the vocabulary-size guard
    val nVocab = uni.count()
    try {
      val hint = nVocab <= 4_000_000L
      def uniAs(w: String, c: String) = {
        val side = uni.select(col("w").as(w), col("c").as(c))
        if (hint) broadcast(side) else side
      }
      val pairsAll = toks.filter(size(col("__tk")) >= 2)
        .select(col("__tk"),
          explode(sequence(lit(1), size(col("__tk")) - 1)).as("i"))
        .select(element_at(col("__tk"), col("i")).as("w1"),
          element_at(col("__tk"), col("i") + 1).as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val pairs = pairsAll.filter(col("c12") >= 5)
      val nu = uni.agg(sum("c").as("nu"))
      // Nb is the TOTAL bigram count — p(w1,w2) = c12/Nb only holds
      // against the full event space, and a filtered Nb would inflate
      // every lift by a constant. By construction it equals the per-doc
      // sum of (tokens − 1), which costs one scan and NO pair shuffle
      val nb = toks.filter(size(col("__tk")) >= 2)
        .agg(sum(size(col("__tk")).cast("long") - 1).as("nb"))
      val out = pairs
        .join(uniAs("w1", "c1"), "w1")
        .join(uniAs("w2", "c2"), "w2")
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c12"),
          ((col("c12") * col("nu") * col("nu")).cast("double") /
            (col("nb") * col("c1") * col("c2")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(20)
      // materialize: the top-20 must not lazily read the cache
      // released below (the q87 pattern)
      s.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally uni.unpersist(blocking = false)
  }

  val q86Sql: String =
    """WITH tk AS (
         SELECT string_split(text, ' ') AS t FROM documents),
       uni AS (
         SELECT w, CAST(count(*) AS BIGINT) AS c
         FROM tk, unnest(t) AS u(w) GROUP BY w),
       pairs_all AS (
         SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
           SELECT t[u.i] AS w1, t[u.i + 1] AS w2
           FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
           WHERE len(t) >= 2)
         GROUP BY w1, w2),
       pairs AS (SELECT * FROM pairs_all WHERE c12 >= 5),
       nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
       nb AS (SELECT CAST(sum(len(t) - 1) AS BIGINT) AS nb FROM tk
              WHERE len(t) >= 2)
       SELECT p.w1, p.w2, p.c12,
              CAST(p.c12 * nu.nu * nu.nu AS DOUBLE) /
                CAST(nb.nb * u1.c * u2.c AS DOUBLE) AS lift
       FROM pairs p
       JOIN uni u1 ON u1.w = p.w1
       JOIN uni u2 ON u2.w = p.w2
       CROSS JOIN nu CROSS JOIN nb
       ORDER BY lift DESC, p.w1, p.w2 LIMIT 20"""

  // --- q87: PageRank (link-graph quality prior) ------------------------
  /** PageRank (Page et al. 1999) over the bipartite part↔supplier graph
    * — the link-analysis prior web-corpus pipelines use as a document
    * quality weight (a page's rank feeds its sampling weight). Three
    * damped iterations (d = 0.85), all INTEGER arithmetic: ranks are
    * ×10⁹-quantized longs, contributions are `rank div outdeg`, damping
    * is `(85·insum) div 100` — floor division in both engines, so every
    * iteration is bit-exact cross-engine (same discipline as the
    * k-means oracle's per-iteration re-quantization; floats would
    * diverge through summation order).
    *
    * Scale shape: the iterative-graph pattern of
    * [[graft.operators.Dedup.connectedComponents]] — each iteration
    * shuffles (node, long) pairs only: contributions aggregate map-side
    * per dst, the rank join is key-partitioned, and the edge list is
    * cached once. The top-k exit compiles to TakeOrderedAndProject.
    *
    * The rank table is |V|-sized, so its per-iteration join into the
    * edge scan is broadcast-HINTED only while |V| stays under the same
    * 4M-row cutoff as [[graft.operators.Graphs.triangleStats]]'s degree
    * table (an unconditional hint would collect a web-graph's ranks
    * onto the driver three times per run); past the cutoff the join is
    * left unhinted and the planner keys both sides on the vertex id —
    * nNodes is already counted for the teleport term, so the guard is
    * free. */
  def q87PageRank(s: SparkSession, dir: String): DataFrame = {
    val Scale = 1000000000L
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("p"),
        (col("l_suppkey") + 10000000L).as("sp"))
    // outdeg rides the edge list from the start via a same-key window —
    // no degs join at all: union → ONE distinct → ONE src-partitioned
    // count, and the cache holds the loop's entire static side
    val edges = li.select(col("p").as("src"), col("sp").as("dst"))
      .unionByName(li.select(col("sp").as("src"), col("p").as("dst")))
      .distinct()
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .cache()
    // iterative-loop resource discipline (the connectedComponents
    // pattern, sharing its Dedup.unpersistCheckpoint): each round's
    // ranks are EAGERLY localCheckpointed and the previous round's
    // blocks dropped — without this, broadcast(ranks) at round k
    // re-plans rounds 1..k-1 from scratch, and the final collect
    // re-runs the whole history once more
    try {
      val nodes = edges.select(col("src").as("node")).distinct()
      val nNodes = nodes.count()
      val base = (15L * Scale) / (100L * nNodes)
      // rank₀ is NOT checkpointed: it is a constant column over the
      // already-cached edge list, so round 1 derives it in-plan — one
      // fewer eager barrier per run (each barrier serializes the plan,
      // so a single GC pause lands wholly in wall time; sf1 showed
      // 11-40 s rep spread from exactly this)
      var ranks = nodes.withColumn("rq", lit(Scale / nNodes))
      var prevCkpt: Option[org.apache.spark.sql.DataFrame] = None
      val hintBroadcast = nNodes <= 4_000_000L
      for (_ <- 1 to 3) {
        // node-count-sized rank side: map-side join while it fits the
        // guard, shuffled vertex-keyed join beyond it
        val rankSrc = ranks.withColumnRenamed("node", "src")
        val insum = edges
          .join(if (hintBroadcast) broadcast(rankSrc) else rankSrc, "src")
          .select(col("dst"), expr("rq div outdeg").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("insum"))
        val next = nodes
          .join(insum.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(85 * coalesce(insum, 0)) div 100"))
              .as("rq"))
          .localCheckpoint(true)
        prevCkpt.foreach(Dedup.unpersistCheckpoint)
        prevCkpt = Some(next)
        ranks = next
      }
      val out = ranks.orderBy(col("rq").desc, col("node")).limit(20)
        .select(col("node"), col("rq").as("rank_q"))
      // materialize: the tiny top-20 must not lazily read checkpoint
      // blocks released below
      val res = s.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
      Dedup.unpersistCheckpoint(ranks)
      res
    } finally edges.unpersist(blocking = false)
  }

  val q87Sql: String =
    """WITH li AS (
         SELECT DISTINCT l_partkey AS p, l_suppkey + 10000000 AS sp
         FROM lineitem),
       edges AS (
         SELECT p AS src, sp AS dst FROM li
         UNION ALL SELECT sp AS src, p AS dst FROM li),
       degs AS (
         SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         FROM edges GROUP BY src),
       nodes AS (SELECT DISTINCT src AS node FROM edges),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       r0 AS (
         SELECT node, (SELECT 1000000000 // n FROM nn) AS rq FROM nodes),
       i1 AS (
         SELECT e.dst AS node, CAST(sum(r.rq // d.outdeg) AS BIGINT) AS m
         FROM edges e
         JOIN r0 r ON r.node = e.src JOIN degs d ON d.src = e.src
         GROUP BY e.dst),
       r1 AS (
         SELECT n.node,
                (SELECT 15000000000 // (100 * nn.n) FROM nn) +
                  (85 * COALESCE(i.m, 0)) // 100 AS rq
         FROM nodes n LEFT JOIN i1 i ON i.node = n.node),
       i2 AS (
         SELECT e.dst AS node, CAST(sum(r.rq // d.outdeg) AS BIGINT) AS m
         FROM edges e
         JOIN r1 r ON r.node = e.src JOIN degs d ON d.src = e.src
         GROUP BY e.dst),
       r2 AS (
         SELECT n.node,
                (SELECT 15000000000 // (100 * nn.n) FROM nn) +
                  (85 * COALESCE(i.m, 0)) // 100 AS rq
         FROM nodes n LEFT JOIN i2 i ON i.node = n.node),
       i3 AS (
         SELECT e.dst AS node, CAST(sum(r.rq // d.outdeg) AS BIGINT) AS m
         FROM edges e
         JOIN r2 r ON r.node = e.src JOIN degs d ON d.src = e.src
         GROUP BY e.dst),
       r3 AS (
         SELECT n.node,
                (SELECT 15000000000 // (100 * nn.n) FROM nn) +
                  (85 * COALESCE(i.m, 0)) // 100 AS rq
         FROM nodes n LEFT JOIN i3 i ON i.node = n.node)
       SELECT node, CAST(rq AS BIGINT) AS rank_q FROM r3
       ORDER BY rq DESC, node LIMIT 20"""

  // --- q91: interval (range) join --------------------------------------
  /** Point-in-interval join with NO equi key: purchases that happened
    * during any outage window (each error event opens a 30-minute
    * window). The naive plan is a cross join × inequality filter —
    * O(|points|·|windows|), a scale-killer. This implements the
    * standard bucketing decomposition every engine's range-join
    * optimizer applies internally: time is tiled into window-sized
    * buckets, each window explodes to the ≤2 buckets it covers, each
    * point maps to exactly one bucket, and the join becomes an
    * EQUI-join on bucket + a residual range filter. A point meets a
    * given window in exactly one bucket (the point's own), so no
    * dedup is needed and multiplicities are exact.
    *
    * All µs-integer arithmetic (floor division for buckets) — exact in
    * both engines; the oracle runs the naive inequality join, proving
    * the decomposition emits exactly the same pair multiset. */
  def q91IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val bucket = 1800000000L // 30 min in µs = the window length
    val ev = t(s, dir, "events")
    val outages = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("ws"))
      .withColumn("we", col("ws") + bucket)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("ps"))
    val wb = outages.select(col("ws"), col("we"),
      explode(sequence(expr(s"ws div $bucket"),
        expr(s"(we - 1) div $bucket"))).as("b"))
    val pb = purchases.withColumn("b", expr(s"ps div $bucket"))
    pb.join(wb, "b")
      .filter(col("ps") >= col("ws") && col("ps") < col("we"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("event_id")).as("n_purchases_hit"))
  }

  val q91Sql: String =
    """WITH o AS (
         SELECT epoch_us(ts) AS ws, epoch_us(ts) + 1800000000 AS we
         FROM events WHERE event_type = 'error'),
       p AS (
         SELECT event_id, epoch_us(ts) AS ps
         FROM events WHERE event_type = 'purchase')
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(count(DISTINCT p.event_id) AS BIGINT)
                AS n_purchases_hit
       FROM p JOIN o ON p.ps >= o.ws AND p.ps < o.we"""

  // --- q92: SemDeDup semantic dedup (cluster-bounded cosine) -----------
  /** Embedding-level semantic dedup over the harness corpus ∪ exact
    * copies (vec_id + 1e6, every 7th vector) — the planted true
    * positives every near-dup query here uses. The operator
    * ([[Similarity.semanticDedup]]) clusters into 8 cells and scores
    * only intra-cell pairs, so the oracle's job is to prove the
    * cluster-bounded greedy flag equals the same rule evaluated from
    * scratch in SQL. Copies land in their original's cell (identical
    * vector → identical centroid cosines → same (desc, cid asc)
    * choice), so every planted copy must come back is_dup = true. */
  def q92SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    Similarity.semanticDedup(corpus, numCentroids = 8, threshold = 0.95)
      .orderBy("did")
  }

  val q92Sql: String =
    """WITH corpus AS (
         SELECT vec_id, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000 AS vec_id, embedding
         FROM embeddings WHERE vec_id % 7 = 0),
       v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM corpus WHERE len(embedding) > 0),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       cents AS (
         SELECT vec_id AS cid, e AS ce, nn AS cn FROM n
         ORDER BY vec_id LIMIT 8),
       cells AS (
         SELECT did, cid FROM (
           SELECT d.vec_id AS did, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS crank
           FROM n d CROSS JOIN cents c)
         WHERE crank = 1),
       cellv AS (
         SELECT ce.did, ce.cid, nn.e, nn.nn
         FROM cells ce JOIN n nn ON nn.vec_id = ce.did),
       dups AS (
         SELECT DISTINCT b.did FROM cellv a
         JOIN cellv b ON a.cid = b.cid AND a.did < b.did
         WHERE CAST(list_sum([a.e[i] * b.e[i]
                 for i in generate_series(1, len(a.e))]) AS DOUBLE) /
               (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE)))
               >= 0.95)
       SELECT ce.did, ce.cid, (d.did IS NOT NULL) AS is_dup
       FROM cells ce LEFT JOIN dups d ON d.did = ce.did
       ORDER BY ce.did"""

  // --- q150: incremental SemDeDup against a persisted index ------------
  /** The daily-increment flow for semantic dedup (q82's persisted-index
    * pattern applied to q92's SemDeDup): the base corpus is indexed
    * ONCE — frozen centroids + per-cell [[graft.operators.Similarity
    * .semanticCells]] rows + its own dup flags, all written to parquet —
    * and a new batch (planted exact duplicates of every 5th base vector
    * at +1 M ids, plus NEGATED copies of every 5th+1 vector at +2 M ids
    * as guaranteed non-dups of the base) is deduplicated by probing the
    * PERSISTED index only: assign to frozen cells, score against
    * lower-id cell-mates. No base×base pair is ever re-scored — probe
    * cost ∝ batch — yet the output (index flags ∪ batch flags) is
    * proven IDENTICAL to a full SemDeDup recompute over base ∪ batch:
    * the oracle executes exactly that full recompute in SQL, so the
    * hash compare is the incremental ≡ full equivalence proof. */
  def q150SemanticIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_semidx_")
      .toString
    try {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val batch = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") % 5 === 1)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
      // yesterday: build + persist the index (centroids, cells, flags)
      val cents0 = Similarity.firstNCentroids(
        emb.filter(size(col("embedding")) > 0), 8)
      cents0.write.parquet(s"$root/centroids")
      Similarity.semanticCells(emb, cents0)
        .write.parquet(s"$root/cells")
      Similarity.semanticDedupWith(emb, cents0, 0.95)
        .write.parquet(s"$root/flags")
      // today: the batch probes the PERSISTED index only — the base
      // corpus parquet is never touched again
      val inc = Similarity.semanticDedupIncremental(batch,
        s.read.parquet(s"$root/centroids"),
        s.read.parquet(s"$root/cells"), 0.95)
      val out = s.read.parquet(s"$root/flags").unionByName(inc)
        .orderBy("did")
      // materialize BEFORE the finally deletes the scratch index
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }

  /** q92's full-recompute SQL over base ∪ batch — deliberately NOT an
    * incremental computation: its equality with the Spark side's
    * index-probe path IS the theorem being checked. */
  val q150Sql: String =
    """WITH corpus AS (
         SELECT vec_id, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000 AS vec_id, embedding
         FROM embeddings WHERE vec_id % 5 = 0
         UNION ALL
         SELECT vec_id + 2000000 AS vec_id,
                [-x for x in embedding] AS embedding
         FROM embeddings WHERE vec_id % 5 = 1),
       v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM corpus WHERE len(embedding) > 0),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       cents AS (
         SELECT vec_id AS cid, e AS ce, nn AS cn FROM n
         ORDER BY vec_id LIMIT 8),
       cells AS (
         SELECT did, cid FROM (
           SELECT d.vec_id AS did, c.cid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (CAST(list_sum([d.e[i] * c.ce[i]
                       for i in generate_series(1, len(d.e))]) AS DOUBLE) /
                     (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))))
                    DESC, c.cid ASC) AS crank
           FROM n d CROSS JOIN cents c)
         WHERE crank = 1),
       cellv AS (
         SELECT ce.did, ce.cid, nn.e, nn.nn
         FROM cells ce JOIN n nn ON nn.vec_id = ce.did),
       dups AS (
         SELECT DISTINCT b.did FROM cellv a
         JOIN cellv b ON a.cid = b.cid AND a.did < b.did
         WHERE CAST(list_sum([a.e[i] * b.e[i]
                 for i in generate_series(1, len(a.e))]) AS DOUBLE) /
               (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE)))
               >= 0.95)
       SELECT ce.did, ce.cid, (d.did IS NOT NULL) AS is_dup
       FROM cells ce LEFT JOIN dups d ON d.did = ce.did
       ORDER BY ce.did"""

  // --- q93: fuzzy best-match join (prefix filter + Levenshtein) --------
  /** Entity resolution over the part catalog: every 11th part's name is
    * corrupted (2nd character of the 2nd word deleted — a token OUTSIDE
    * the catalog vocabulary) and matched back against the CANONICAL
    * catalog — distinct names, each carrying its smallest part key —
    * via [[FuzzyJoin.bestEditMatch]]. Resolving against the deduped
    * reference is the production shape twice over: the reference side
    * shrinks to its true entity count before any pair is scored, and
    * the df ranking counts entities rather than their copies. The
    * oracle replays the whole filter-and-verify decomposition — name
    * dedup, df ranking, k=2 prefixes, candidate equi-join, Levenshtein
    * top-1 — so the compare proves the blocked plan equals the same
    * rule in SQL, junk candidates and tie-breaks included. */
  def q93FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val clean = part.groupBy(col("p_name").as("rname"))
      .agg(min(col("p_partkey")).as("rid"))
    val dirty = part.filter(col("p_partkey") % 11 === 0)
      .select(col("p_partkey").as("lid"),
        expr("""concat(element_at(split(p_name, ' '), 1), ' ',
                substring(element_at(split(p_name, ' '), 2), 1, 1),
                substring(element_at(split(p_name, ' '), 2), 3, 1000))""")
          .as("lname"))
    FuzzyJoin.bestEditMatch(dirty, "lid", "lname", clean, "rid", "rname")
      .orderBy("lid")
  }

  val q93Sql: String =
    """WITH clean AS (
         SELECT min(p_partkey) AS rid, p_name AS rname
         FROM part GROUP BY p_name),
       dirty AS (
         SELECT p_partkey AS lid,
                tk[1] || ' ' || substr(tk[2], 1, 1) || substr(tk[2], 3)
                  AS lname
         FROM (SELECT p_partkey, string_split(p_name, ' ') AS tk
               FROM part)
         WHERE p_partkey % 11 = 0),
       rtok AS (
         SELECT DISTINCT rid, unnest(string_split(rname, ' ')) AS tok
         FROM clean),
       dfreq AS (
         SELECT tok, CAST(count(*) AS BIGINT) AS df FROM rtok GROUP BY 1),
       rpre AS (
         SELECT tok, rid FROM (
           SELECT r.tok, r.rid, row_number() OVER (PARTITION BY r.rid
             ORDER BY d.df ASC, r.tok ASC) AS rk
           FROM rtok r JOIN dfreq d USING (tok)) WHERE rk <= 2),
       ltok AS (
         SELECT DISTINCT lid, unnest(string_split(lname, ' ')) AS tok
         FROM dirty),
       lpre AS (
         SELECT tok, lid FROM (
           SELECT l.tok, l.lid, row_number() OVER (PARTITION BY l.lid
             ORDER BY coalesce(d.df, 0) ASC, l.tok ASC) AS rk
           FROM ltok l LEFT JOIN dfreq d USING (tok)) WHERE rk <= 2),
       cand AS (
         SELECT DISTINCT lp.lid, rp.rid
         FROM lpre lp JOIN rpre rp USING (tok)),
       scored AS (
         SELECT c.lid, c.rid,
                CAST(levenshtein(dd.lname, cc.rname) AS INTEGER) AS dist
         FROM cand c
         JOIN dirty dd ON dd.lid = c.lid
         JOIN clean cc ON cc.rid = c.rid)
       SELECT lid, rid, dist FROM (
         SELECT lid, rid, dist, row_number() OVER (PARTITION BY lid
           ORDER BY dist ASC, rid ASC) AS rk FROM scored)
       WHERE rk = 1 ORDER BY lid"""

  // --- q94: n-gram frequency profile (rare/boilerplate signal) ---------
  /** Per-document bigram frequency profile against the corpus: for each
    * document, the document frequency of its RAREST and its MOST COMMON
    * distinct bigram plus the distinct-bigram count — the
    * unusual-n-gram / boilerplate-n-gram quality signals (CCNet-style
    * frequency filtering), integer end to end so partial-aggregation
    * order can't perturb the result. Complements q69 (within-doc
    * repetition) and q86 (corpus-level PMI): this is doc-vs-corpus.
    *
    * Scale shape: bigrams are hashed to 60-bit longs AT THE SOURCE
    * (`Dedup.hash60`), so the distinct, the df aggregation and the
    * df join all move (long, long) pairs, never bigram text; the df
    * table is vocabulary²-bounded. Documents with < 2 tokens have no
    * bigrams and are absent — both engines agree. */
  def q94NgramProfile(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.docShingles(t(s, dir, "documents"), "doc_id", "text", 2)
      .select(col("sid").as("doc_id"), col("h"))
      .distinct()
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        min("df").as("min_df"), max("df").as("max_df"))
      .orderBy("doc_id")
  }

  val q94Sql: String =
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest([('0x' ||
                         substr(md5(array_to_string(tk[i:i+1], ' ')), 1, 15)
                        )::BIGINT
                        for i in range(1, len(tk))]) AS h
         FROM toks WHERE len(tk) >= 2),
       dfreq AS (
         SELECT h, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              min(df) AS min_df, max(df) AS max_df
       FROM sh JOIN dfreq USING (h)
       GROUP BY doc_id ORDER BY doc_id"""

  // --- q101: data-quality constraint report ----------------------------
  /** Deequ-style constraint suite over the star's source tables, in ONE
    * aggregation pass per table plus one anti-join per foreign key:
    * completeness (null counts), uniqueness (rows − distinct keys),
    * referential integrity (orphan FK rows), and a business range rule
    * (planted to FAIL — o_totalprice ≥ 5000 doesn't hold — so the
    * report provably distinguishes pass from fail). Per-table checks
    * compute as columns of a single agg and unpivot to rows, so adding
    * a constraint never adds a scan; integer violation counts make the
    * report partial-order independent. */
  def q101DqReport(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
    val li = t(s, dir, "lineitem")
    def unpiv(agg: DataFrame, table: String): DataFrame =
      agg.unpivot(Array.empty, "check_name", "violations")
        .select(lit(table).as("table_name"), col("check_name"),
          col("violations"))
    val oChecks = unpiv(o.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .as("complete:o_custkey"),
      (count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("unique:o_orderkey"),
      sum(when(col("o_totalprice") < 5000, 1L).otherwise(0L))
        .as("range:o_totalprice>=5000")), "orders")
    val cChecks = unpiv(c.agg(
      sum(when(col("c_name").isNull, 1L).otherwise(0L))
        .as("complete:c_name"),
      (count(lit(1)) - countDistinct(col("c_custkey")))
        .as("unique:c_custkey")), "customer")
    val liChecks = unpiv(li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("range:l_quantity in [1,50]")), "lineitem")
    // standard SQL FK semantics: a NULL foreign key is NOT an RI
    // violation (the completeness check reports it); without the
    // isNotNull filter the anti-join would count null-key rows as
    // orphans and diverge from the oracle's NOT IN formulation
    val fkO = o.filter(col("o_custkey").isNotNull)
      .join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders").as("table_name"),
        lit("fk:o_custkey->customer").as("check_name"), col("violations"))
    val fkLi = li.filter(col("l_orderkey").isNotNull)
      .join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem").as("table_name"),
        lit("fk:l_orderkey->orders").as("check_name"), col("violations"))
    oChecks.unionByName(cChecks).unionByName(liChecks)
      .unionByName(fkO).unionByName(fkLi)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("table_name", "check_name")
  }

  val q101Sql: String =
    """WITH checks AS (
         SELECT 'orders' AS table_name,
                'complete:o_custkey' AS check_name,
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS violations
         FROM orders
         UNION ALL
         SELECT 'orders', 'unique:o_orderkey',
                CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'orders', 'range:o_totalprice>=5000',
                CAST(sum(CASE WHEN o_totalprice < 5000 THEN 1 ELSE 0 END)
                  AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'customer', 'complete:c_name',
                CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
         FROM customer
         UNION ALL
         SELECT 'customer', 'unique:c_custkey',
                CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
         FROM customer
         UNION ALL
         SELECT 'lineitem', 'range:l_quantity in [1,50]',
                CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                  THEN 1 ELSE 0 END) AS BIGINT)
         FROM lineitem
         UNION ALL
         SELECT 'orders', 'fk:o_custkey->customer',
                CAST(count(*) AS BIGINT)
         FROM orders WHERE o_custkey NOT IN
           (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
         UNION ALL
         SELECT 'lineitem', 'fk:l_orderkey->orders',
                CAST(count(*) AS BIGINT)
         FROM lineitem WHERE l_orderkey NOT IN
           (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
       SELECT table_name, check_name, violations,
              violations = 0 AS pass
       FROM checks
       ORDER BY table_name, check_name"""

  // --- q102: CDC apply (insert/update/delete compaction) ---------------
  /** A synthetic-but-deterministic CDC feed over orders — every key
    * inserted (seq 1), every 3rd updated (+100 cents, seq 2), every 5th
    * deleted (seq 3) — compacted to final state by
    * [[graft.operators.Upsert.applyCdc]]: one hash aggregation, the
    * key's highest-sequence op wins, delete-wins keys drop. The oracle
    * is the CLOSED FORM of the same feed (survivors = keys not ≡0 mod
    * 5, cents bumped iff ≡0 mod 3) — an independent formulation, so the
    * compare proves the max(struct)-compaction implements exactly the
    * last-writer-wins-with-deletes contract. */
  def q102CdcApply(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey").as("key"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val feed = o
      .select(col("key"), lit(1L).as("seq"), lit("I").as("op"),
        col("cents"))
      .unionByName(o.filter(col("key") % 3 === 0)
        .select(col("key"), lit(2L).as("seq"), lit("U").as("op"),
          (col("cents") + 100).as("cents")))
      .unionByName(o.filter(col("key") % 5 === 0)
        .select(col("key"), lit(3L).as("seq"), lit("D").as("op"),
          lit(0L).as("cents")))
    graft.operators.Upsert.applyCdc(feed, Seq("key"), "seq", "op")
      .orderBy("key")
  }

  val q102Sql: String =
    """SELECT o_orderkey AS key,
              CAST(round(o_totalprice * 100) AS BIGINT) +
                CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END AS cents
       FROM orders
       WHERE o_orderkey % 5 <> 0
       ORDER BY key"""

  // --- q103: ANN recall@k evaluation harness ---------------------------
  /** Recall@5 of the hyperplane-LSH index against the brute-force
    * ground truth, per query — the evaluation loop every ANN deployment
    * runs before trading recall for probe cost. Both retrievers are
    * deterministic (integer-quantized cosine, (desc, did) tie-break),
    * so recall itself is oracle-checkable: hits are an integer
    * pair-set intersection and recall is one integer-ratio double.
    * Queries whose LSH bucket misses every true neighbor appear with
    * hits = 0 (the left join), not silently absent — at a real corpus
    * scale this per-query histogram, not the mean, is what tells you
    * whether to add probes or planes. */
  def q103AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(qs, emb, k = 5)
      .select(col("qid"), col("did"))
    val lsh = Similarity.lshTopK(qs, emb, numPlanes = 6, k = 5)
      .select(col("qid"), col("did"))
    val hits = bf.join(lsh, Seq("qid", "did"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    qs.select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(5.0))
          .as("recall_at_5"))
      .orderBy("qid")
  }

  val q103Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       bf AS (
         SELECT qid, did FROM (
           SELECT q.vec_id AS qid, d.vec_id AS did,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    (CAST(list_sum([q.e[i] * d.e[i]
                       for i in generate_series(1, len(q.e))]) AS DOUBLE) /
                     (sqrt(CAST(q.nn AS DOUBLE)) * sqrt(CAST(d.nn AS DOUBLE))))
                    DESC, d.vec_id ASC) AS rank
           FROM n q CROSS JOIN n d WHERE q.vec_id < 10)
         WHERE rank <= 5),
       proj AS (
         SELECT v.vec_id, pl.p,
                list_sum([v.e[i] *
                  (2 * instr('0123456789abcdef',
                     substr(md5(pl.p || '-' || (i - 1)), 1, 1)) - 17)
                  for i in generate_series(1, len(v.e))]) AS proj
         FROM v CROSS JOIN (SELECT unnest(range(0, 6)) AS p) pl),
       buck AS (
         SELECT vec_id,
                CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY 1),
       lsh AS (
         SELECT qid, did FROM (
           SELECT q.vec_id AS qid, d.vec_id AS did,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    (CAST(list_sum([qn.e[i] * dn.e[i]
                       for i in generate_series(1, len(qn.e))]) AS DOUBLE) /
                     (sqrt(CAST(qn.nn AS DOUBLE)) *
                      sqrt(CAST(dn.nn AS DOUBLE))))
                    DESC, d.vec_id ASC) AS rank
           FROM buck q
           JOIN buck d ON q.bucket = d.bucket
           JOIN n qn ON qn.vec_id = q.vec_id
           JOIN n dn ON dn.vec_id = d.vec_id
           WHERE q.vec_id < 10)
         WHERE rank <= 5),
       hits AS (
         SELECT bf.qid, CAST(count(*) AS BIGINT) AS hits
         FROM bf JOIN lsh ON bf.qid = lsh.qid AND bf.did = lsh.did
         GROUP BY 1)
       SELECT q.vec_id AS qid,
              coalesce(h.hits, 0) AS hits,
              CAST(coalesce(h.hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
       FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
       LEFT JOIN hits h ON h.qid = q.vec_id
       ORDER BY qid"""

  // --- q104: incremental aggregate maintenance (summing merge) ---------
  /** Materialized-rollup maintenance for additive measures: the hourly
    * (count, cents) rollup is built from batch 1 (even days), persisted
    * to a parquet sink, and batch 2 (odd days) is folded in by merging
    * its OWN rollup with the sink — a union + re-aggregate over
    * AGGREGATE STATE, never a rescan of batch 1's events. That is the
    * incremental-view-maintenance contract for additive aggregates:
    * update cost tracks |delta| + |touched aggregate rows|, not the
    * sink's event history; at warehouse scale the merge is
    * partition-scoped by the delta's hours (the q72 partition-replace
    * shape). The oracle recomputes the rollup from ALL events in one
    * pass — incremental must equal recompute, exactly. */
  def q104IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(
      date_trunc("hour", col("ts")).as("hour_ts"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      dayofmonth(col("ts")).as("dom"))
    def rollup(batch: DataFrame): DataFrame = batch
      .groupBy("hour_ts")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_iagg_")
      .toString
    try {
      rollup(ev.filter(col("dom") % 2 === 0).drop("dom"))
        .write.mode("overwrite").parquet(s"$root/rollup")
      val sink = s.read.parquet(s"$root/rollup")
      val merged = sink
        .unionByName(rollup(ev.filter(col("dom") % 2 === 1).drop("dom")))
        .groupBy("hour_ts")
        .agg(sum("n_events").as("n_events"), sum("cents").as("cents"))
      // materialize before the temp sink is deleted
      val rows = merged.orderBy("hour_ts").collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), merged.schema)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  val q104Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_ts,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                AS cents
       FROM events GROUP BY 1 ORDER BY 1"""

  // --- q105: product-quantization ANN (PQ + ADC) -----------------------
  /** PQ retrieval over the harness embeddings: 2 subspaces × 4-centroid
    * codebooks trained in-query, corpus reduced to codes, queries
    * served by ADC distance tables ([[Similarity.pqTopK]]). The oracle
    * unrolls the ENTIRE pipeline — subspace slicing, seed codebooks,
    * squared-L2 assignment, the Lloyd recenter, encoding, distance
    * tables, the ADC sum — in SQL; every quantity is an exact integer,
    * so the compare is hash-exact including approx_dist itself. */
  def q105PqTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb,
        subspaces = 2, codebookSize = 4, topK = 5)
      .select(col("qid"), col("rank"), col("did"), col("approx_dist"))
      .orderBy("qid", "rank")
  }

  val q105Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings WHERE len(embedding) > 0),
       sl AS (
         SELECT vec_id, t.m,
                e[t.m * (len(e) // 2) + 1 : (t.m + 1) * (len(e) // 2)]
                  AS se
         FROM v, unnest([0, 1]) AS t(m)),
       sn AS (
         SELECT vec_id, m, se, list_sum([y * y for y in se]) AS sn
         FROM sl),
       cb0 AS (
         SELECT m, vec_id AS cid, se AS ce, sn AS cn FROM sn
         WHERE vec_id IN (SELECT vec_id FROM embeddings
                          WHERE len(embedding) > 0
                          ORDER BY vec_id LIMIT 4)),
       a1 AS (
         SELECT did, m, se, cid FROM (
           SELECT s.vec_id AS did, s.m, s.se, c.cid,
                  row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                       for i in generate_series(1, len(s.se))])) ASC,
                    c.cid ASC) AS r
           FROM sn s JOIN cb0 c ON c.m = s.m) WHERE r = 1),
       mean1 AS (
         SELECT m, cid, t.i AS dim, avg(se[t.i]) AS mean
         FROM a1, unnest(generate_series(1, len(se))) AS t(i)
         GROUP BY 1, 2, 3),
       cb1 AS (
         SELECT m, cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT m, cid, list(CAST(round(mean) AS BIGINT) ORDER BY dim)
                    AS ce
           FROM mean1 GROUP BY m, cid)),
       codes AS (
         SELECT did, m, cid AS code FROM (
           SELECT s.vec_id AS did, s.m, c.cid,
                  row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                       for i in generate_series(1, len(s.se))])) ASC,
                    c.cid ASC) AS r
           FROM sn s JOIN cb1 c ON c.m = s.m) WHERE r = 1),
       qdist AS (
         SELECT s.vec_id AS qid, s.m, c.cid AS code,
                (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                   for i in generate_series(1, len(s.se))])) AS dist
         FROM sn s JOIN cb1 c ON c.m = s.m
         WHERE s.vec_id < 10),
       adc AS (
         SELECT q.qid, cd.did, CAST(sum(q.dist) AS BIGINT) AS approx_dist
         FROM qdist q JOIN codes cd ON cd.m = q.m AND cd.code = q.code
         GROUP BY 1, 2)
       SELECT qid, rank, did, approx_dist FROM (
         SELECT qid, did, approx_dist,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY approx_dist ASC, did ASC) AS INTEGER) AS rank
         FROM adc)
       WHERE rank <= 5 ORDER BY qid, rank"""

  // --- q106: IVF-PQ (coarse cells pruning the ADC scan) ----------------
  /** The full FAISS-style serving composition: q105's PQ codes scored
    * only inside the nProbe=2 of 8 coarse L2 cells nearest each query
    * ([[Similarity.ivfPqTopK]]) — ADC cost drops by the unprobed corpus
    * fraction on top of PQ's memory reduction. The oracle extends
    * q105's unrolled pipeline with the coarse assignment and candidate
    * restriction; all-integer, hash-exact. */
  def q106IvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
        coarseCentroids = 8, nProbe = 2, subspaces = 2,
        codebookSize = 4, topK = 5)
      .select(col("qid"), col("rank"), col("did"), col("approx_dist"))
      .orderBy("qid", "rank")
  }

  val q106Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings WHERE len(embedding) > 0),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       coarse AS (
         SELECT vec_id AS ccid, e AS ke, nn AS kn FROM n
         WHERE vec_id IN (SELECT vec_id FROM embeddings
                          WHERE len(embedding) > 0
                          ORDER BY vec_id LIMIT 8)),
       cells AS (
         SELECT did, ccid FROM (
           SELECT d.vec_id AS did, k.ccid,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (d.nn + k.kn - 2 * list_sum([d.e[i] * k.ke[i]
                       for i in generate_series(1, len(d.e))])) ASC,
                    k.ccid ASC) AS r
           FROM n d CROSS JOIN coarse k) WHERE r = 1),
       probes AS (
         SELECT qid, ccid FROM (
           SELECT q.vec_id AS qid, k.ccid,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    (q.nn + k.kn - 2 * list_sum([q.e[i] * k.ke[i]
                       for i in generate_series(1, len(q.e))])) ASC,
                    k.ccid ASC) AS r
           FROM n q CROSS JOIN coarse k WHERE q.vec_id < 10)
         WHERE r <= 2),
       cand AS (
         SELECT p.qid, c.did FROM probes p JOIN cells c USING (ccid)),
       sl AS (
         SELECT vec_id, t.m,
                e[t.m * (len(e) // 2) + 1 : (t.m + 1) * (len(e) // 2)]
                  AS se
         FROM v, unnest([0, 1]) AS t(m)),
       sn AS (
         SELECT vec_id, m, se, list_sum([y * y for y in se]) AS sn
         FROM sl),
       cb0 AS (
         SELECT m, vec_id AS cid, se AS ce, sn AS cn FROM sn
         WHERE vec_id IN (SELECT vec_id FROM embeddings
                          WHERE len(embedding) > 0
                          ORDER BY vec_id LIMIT 4)),
       a1 AS (
         SELECT did, m, se, cid FROM (
           SELECT s.vec_id AS did, s.m, s.se, c.cid,
                  row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                       for i in generate_series(1, len(s.se))])) ASC,
                    c.cid ASC) AS r
           FROM sn s JOIN cb0 c ON c.m = s.m) WHERE r = 1),
       mean1 AS (
         SELECT m, cid, t.i AS dim, avg(se[t.i]) AS mean
         FROM a1, unnest(generate_series(1, len(se))) AS t(i)
         GROUP BY 1, 2, 3),
       cb1 AS (
         SELECT m, cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT m, cid, list(CAST(round(mean) AS BIGINT) ORDER BY dim)
                    AS ce
           FROM mean1 GROUP BY m, cid)),
       codes AS (
         SELECT did, m, cid AS code FROM (
           SELECT s.vec_id AS did, s.m, c.cid,
                  row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                       for i in generate_series(1, len(s.se))])) ASC,
                    c.cid ASC) AS r
           FROM sn s JOIN cb1 c ON c.m = s.m) WHERE r = 1),
       qdist AS (
         SELECT s.vec_id AS qid, s.m, c.cid AS code,
                (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                   for i in generate_series(1, len(s.se))])) AS dist
         FROM sn s JOIN cb1 c ON c.m = s.m
         WHERE s.vec_id < 10),
       adc AS (
         SELECT q.qid, cd.did, CAST(sum(q.dist) AS BIGINT) AS approx_dist
         FROM cand
         JOIN codes cd ON cd.did = cand.did
         JOIN qdist q ON q.qid = cand.qid AND q.m = cd.m
           AND q.code = cd.code
         GROUP BY 1, 2)
       SELECT qid, rank, did, approx_dist FROM (
         SELECT qid, did, approx_dist,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY approx_dist ASC, did ASC) AS INTEGER) AS rank
         FROM adc)
       WHERE rank <= 5 ORDER BY qid, rank"""

  // --- q37: residual-encoded IVF-PQ (FAISS by_residual default) --------
  /** q106's serving composition with the fine stage encoding
    * RESIDUALS v − centroid(cell(v)) ([[Similarity.ivfPqResidualTopK]])
    * — the FAISS IVFPQ default, where the shared codebook describes
    * the within-cell distribution instead of re-describing the coarse
    * structure. Same parameters as q106 so the two variants'
    * candidate sets coincide and only the encoding differs; the
    * oracle unrolls the full residual pipeline (per-probe query
    * residuals keyed (qid, ccid)) in SQL. */
  def q37IvfPqResidual(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfPqResidualTopK(emb.filter(col("vec_id") < 10), emb,
        coarseCentroids = 8, nProbe = 2, subspaces = 2,
        codebookSize = 4, topK = 5)
      .select(col("qid"), col("rank"), col("did"), col("approx_dist"))
      .orderBy("qid", "rank")
  }

  val q37Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings WHERE len(embedding) > 0),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       coarse AS (
         SELECT vec_id AS ccid, e AS ke, nn AS kn FROM n
         WHERE vec_id IN (SELECT vec_id FROM embeddings
                          WHERE len(embedding) > 0
                          ORDER BY vec_id LIMIT 8)),
       cres AS (
         SELECT did, ccid, re FROM (
           SELECT d.vec_id AS did, k.ccid,
                  [d.e[i] - k.ke[i]
                   for i in generate_series(1, len(d.e))] AS re,
                  row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    (d.nn + k.kn - 2 * list_sum([d.e[i] * k.ke[i]
                       for i in generate_series(1, len(d.e))])) ASC,
                    k.ccid ASC) AS r
           FROM n d CROSS JOIN coarse k) WHERE r = 1),
       qres AS (
         SELECT qid, ccid, re FROM (
           SELECT q.vec_id AS qid, k.ccid,
                  [q.e[i] - k.ke[i]
                   for i in generate_series(1, len(q.e))] AS re,
                  row_number() OVER (PARTITION BY q.vec_id ORDER BY
                    (q.nn + k.kn - 2 * list_sum([q.e[i] * k.ke[i]
                       for i in generate_series(1, len(q.e))])) ASC,
                    k.ccid ASC) AS r
           FROM n q CROSS JOIN coarse k WHERE q.vec_id < 10)
         WHERE r <= 2),
       snc AS (
         SELECT did, ccid, t.m,
                re[t.m * (len(re) // 2) + 1 : (t.m + 1) * (len(re) // 2)]
                  AS se,
                list_sum([y * y for y in
                  re[t.m * (len(re) // 2) + 1 :
                     (t.m + 1) * (len(re) // 2)]]) AS sn
         FROM cres, unnest([0, 1]) AS t(m)),
       snq AS (
         SELECT qid, ccid, t.m,
                re[t.m * (len(re) // 2) + 1 : (t.m + 1) * (len(re) // 2)]
                  AS se,
                list_sum([y * y for y in
                  re[t.m * (len(re) // 2) + 1 :
                     (t.m + 1) * (len(re) // 2)]]) AS sn
         FROM qres, unnest([0, 1]) AS t(m)),
       cb0 AS (
         SELECT m, did AS cid, se AS ce, sn AS cn FROM snc
         WHERE did IN (SELECT vec_id FROM embeddings
                       WHERE len(embedding) > 0
                       ORDER BY vec_id LIMIT 4)),
       a1 AS (
         SELECT did, m, se, cid FROM (
           SELECT s.did, s.m, s.se, c.cid,
                  row_number() OVER (PARTITION BY s.did, s.m ORDER BY
                    (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                       for i in generate_series(1, len(s.se))])) ASC,
                    c.cid ASC) AS r
           FROM snc s JOIN cb0 c ON c.m = s.m) WHERE r = 1),
       mean1 AS (
         SELECT m, cid, t.i AS dim, avg(se[t.i]) AS mean
         FROM a1, unnest(generate_series(1, len(se))) AS t(i)
         GROUP BY 1, 2, 3),
       cb1 AS (
         SELECT m, cid, ce, list_sum([y * y for y in ce]) AS cn FROM (
           SELECT m, cid, list(CAST(round(mean) AS BIGINT) ORDER BY dim)
                    AS ce
           FROM mean1 GROUP BY m, cid)),
       codes AS (
         SELECT did, m, cid AS code FROM (
           SELECT s.did, s.m, c.cid,
                  row_number() OVER (PARTITION BY s.did, s.m ORDER BY
                    (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                       for i in generate_series(1, len(s.se))])) ASC,
                    c.cid ASC) AS r
           FROM snc s JOIN cb1 c ON c.m = s.m) WHERE r = 1),
       qdist AS (
         SELECT s.qid, s.ccid, s.m, c.cid AS code,
                (s.sn + c.cn - 2 * list_sum([s.se[i] * c.ce[i]
                   for i in generate_series(1, len(s.se))])) AS dist
         FROM snq s JOIN cb1 c ON c.m = s.m),
       cells AS (SELECT DISTINCT did, ccid FROM cres),
       cand AS (
         SELECT p.qid, p.ccid, c.did
         FROM (SELECT DISTINCT qid, ccid FROM qres) p
         JOIN cells c USING (ccid)),
       adc AS (
         SELECT cand.qid, cd.did, CAST(sum(q.dist) AS BIGINT)
                  AS approx_dist
         FROM cand
         JOIN codes cd ON cd.did = cand.did
         JOIN qdist q ON q.qid = cand.qid AND q.ccid = cand.ccid
           AND q.m = cd.m AND q.code = cd.code
         GROUP BY 1, 2)
       SELECT qid, rank, did, approx_dist FROM (
         SELECT qid, did, approx_dist,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY approx_dist ASC, did ASC) AS INTEGER) AS rank
         FROM adc)
       WHERE rank <= 5 ORDER BY qid, rank"""

  // --- q107: time-series gap fill + forward fill -----------------------
  /** Dense hourly series per event type from a sparse event log: a
    * scaffold of EVERY hour in each type's [min, max] span (~6% of
    * hours have no events in the harness data) left-joins the real
    * hourly rollup; counts fill with 0 (an empty hour truly has zero
    * events) while the cents gauge FORWARD-fills via
    * last(ignoreNulls) — the standard scaffold + last-observation
    * pattern time-series features need before windowing/diffing.
    *
    * Scale shape: the scaffold explodes from one (type, min, max) row
    * per key — never a driver-side calendar; the join and the
    * forward-fill window share the event_type hash exchange, and the
    * fill is integer so the result is order-independent. */
  def q107GapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events").select(col("event_type"),
      date_trunc("hour", col("ts")).as("hour_ts"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val hourly = ev.groupBy("event_type", "hour_ts")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val scaffold = ev.groupBy("event_type")
      .agg(min("hour_ts").as("mn"), max("hour_ts").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val w = Window.partitionBy("event_type").orderBy("hour_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(hourly, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), col("hour_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last("cents", ignoreNulls = true).over(w).as("cents_ffill"))
      .orderBy("event_type", "hour_ts")
  }

  val q107Sql: String =
    """WITH ev AS (
         SELECT event_type, date_trunc('hour', ts) AS hour_ts,
                CAST(round(value * 100) AS BIGINT) AS cents
         FROM events),
       hourly AS (
         SELECT event_type, hour_ts,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(cents) AS BIGINT) AS cents
         FROM ev GROUP BY 1, 2),
       scaffold AS (
         SELECT event_type,
                unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
                  AS hour_ts
         FROM (SELECT event_type, min(hour_ts) AS mn, max(hour_ts) AS mx
               FROM ev GROUP BY 1)),
       j AS (
         SELECT s.event_type, s.hour_ts,
                CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
                h.cents
         FROM scaffold s LEFT JOIN hourly h
           ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts)
       SELECT event_type, hour_ts, n_events,
              last_value(cents IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY hour_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cents_ffill
       FROM j ORDER BY event_type, hour_ts"""

  // --- q50: HLL approximate distinct -----------------------------------
  /** HLL sketch VALUES are not portable across engines, but the sketch's
    * accuracy CLAIM is: the output carries the exact distinct count plus
    * a boolean asserting the HLL estimate landed within 5% of it (the
    * default rsd of `approx_count_distinct`). The DuckDB oracle computes
    * the same exact counts and asserts the same booleans as literal
    * `true` — so a Spark-side sketch drifting out of its error bound
    * flips the hash compare red. */
  def q50ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts").cast("long")
          .as("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag")

  val q50Sql: String =
    """SELECT l_returnflag,
              CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              true AS within_5pct
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  // --- q51: native codegen'd delay parser (custom Catalyst Expression) -
  /** Same semantics and oracle as q16, but parsing runs through
    * graft.plans.ParseDelayMinutes — a custom Expression with doGenCode
    * (single byte scan, no regex) registered in the function registry. */
  def q51DelayParseNative(s: SparkSession, dir: String): DataFrame = {
    graft.plans.DelayParse.register(s)
    val rendered = t(s, dir, "lineitem").select(
      col("l_returnflag"),
      when(col("l_linenumber") % 3 === 0,
        concat(col("l_linenumber").cast("string"), lit(" min przed czasem")))
        .otherwise(concat(col("l_linenumber").cast("string"), lit(" min")))
        .as("delay_str"))
    rendered
      .select(col("l_returnflag"),
        expr("parse_delay_minutes(delay_str)").as("delay_mins"))
      .groupBy("l_returnflag")
      .agg(sum("delay_mins").cast("long").as("total_delay"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  // --- q52: single-pass mode via typed Aggregator (UDAF surface) -------
  /** Same semantics and oracle as q06, but one hash aggregation instead
    * of aggregate + window + second shuffle. */
  def q52ModeSinglePass(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.operators.ModeAggregator.modeUdaf(col("l_quantity"))
        .as("mode_quantity"))
      .orderBy("l_returnflag")

  // --- q53: end-to-end corpus preparation pipeline ---------------------
  /** The training-data path in one plan: exact-dedup (keep min doc_id) →
    * quality gate → per-language corpus stats. */
  def q53CorpusPrep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // The quality gate as *conditional aggregation*, not filter-then-agg:
    // a Filter(score >= 2) below the agg would re-evaluate the regex-heavy
    // score per row (Catalyst substitutes the alias when pushing the
    // predicate through the projection), so the score is projected once
    // and every aggregate conditions on the materialized column.
    val scored = docs.join(keep, "doc_id")
      .select(col("lang"),
        qualityScore(col("text")).as("__score"),
        wsTokenCount(col("text")).cast("long").as("__toks"))
    val ok = col("__score") >= 2
    scored.groupBy("lang")
      .agg(sum(when(ok, 1L).otherwise(0L)).as("n_docs"),
        sum(when(ok, col("__toks"))).cast("long").as("total_tokens"),
        (sum(when(ok, col("__score"))).cast("double") /
          sum(when(ok, 1L).otherwise(0L))).as("avg_quality"))
      .filter(col("n_docs") > 0)
      .orderBy("lang")
  }

  val q53Sql: String =
    """WITH keep AS (
         SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       scored AS (
         SELECT d.lang,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           (CASE WHEN len(string_split(d.text, ' ')) BETWEEN 20 AND 2000
                   THEN 2
                 WHEN len(string_split(d.text, ' ')) BETWEEN 5 AND 19
                   THEN 1 ELSE -1 END) +
           (CASE WHEN CAST(len(list_distinct(string_split(d.text, ' ')))
                     AS DOUBLE) /
                   CAST(len(string_split(d.text, ' ')) AS DOUBLE) >= 0.4
                   THEN 2
                 WHEN CAST(len(list_distinct(string_split(d.text, ' ')))
                     AS DOUBLE) /
                   CAST(len(string_split(d.text, ' ')) AS DOUBLE) >= 0.2
                   THEN 1 ELSE 0 END) +
           (CASE WHEN CAST(len(regexp_extract_all(lower(d.text),
                   '\b(the|a|and|of|is|der|die|und|le|la|et|el|los|y)\b'))
                     AS DOUBLE) /
                   CAST(len(string_split(d.text, ' ')) AS DOUBLE) >= 0.05
                   THEN 1 ELSE 0 END) +
           (CASE WHEN CAST(len(regexp_extract_all(d.text, '[^\w\s]'))
                     AS DOUBLE) / CAST(length(d.text) AS DOUBLE) > 0.2
                   THEN -2
                 WHEN CAST(len(regexp_extract_all(d.text, '[^\w\s]'))
                     AS DOUBLE) / CAST(length(d.text) AS DOUBLE) > 0.1
                   THEN -1 ELSE 0 END) AS quality_score
         FROM documents d JOIN keep k ON d.doc_id = k.doc_id)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              avg(quality_score) AS avg_quality
       FROM scored WHERE quality_score >= 2
       GROUP BY lang ORDER BY lang"""

  // --- q54: backward as-of join (purchase ← latest prior click) --------
  /** Union-and-window as-of join (`operators/AsofJoin`): one shuffle on
    * the key, no range-join explosion. Oracle: DuckDB's native ASOF LEFT
    * JOIN — proves the operator matches the industry semantics. */
  def q54AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    // one click per (user, ts): the determinism contract both engines share
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
      .withColumn("rn", row_number().over(Window
        .partitionBy("user_id", "click_ts").orderBy(col("click_id").desc)))
      .filter(col("rn") === 1).drop("rn")
    AsofJoin.asofBackward(purchases, clicks, "user_id",
        leftTs = "purchase_ts", rightTs = "click_ts",
        valueCols = Seq("click_id", "click_ts", "click_value"))
      .orderBy("event_id")
  }

  val q54Sql: String =
    """WITH p AS (SELECT event_id, user_id, ts AS purchase_ts,
                value AS purchase_value
           FROM events WHERE event_type = 'purchase'),
       c AS (SELECT user_id, ts AS click_ts, event_id AS click_id,
                value AS click_value
           FROM events WHERE event_type = 'click'
           QUALIFY row_number() OVER (PARTITION BY user_id, ts
             ORDER BY event_id DESC) = 1)
       SELECT p.event_id, p.user_id, p.purchase_ts, p.purchase_value,
              c.click_id, c.click_ts, c.click_value
       FROM p ASOF LEFT JOIN c
         ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
       ORDER BY p.event_id"""

  // --- q55: embedding-cosine near-dup pairs (LSH candidates) -----------
  /** Near-dup corpus: embeddings ∪ exact copies (+1e6) ∪ one-component
    * sign-flips (+2e6, exact in IEEE — no float-rounding drift between
    * engines). Pairs come from `Similarity.cosineNearDupPairs`. */
  def q55CosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      .unionByName(emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 2000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 63, -x).otherwise(x)).as("embedding")))
    Similarity.cosineNearDupPairs(corpus, numPlanes = 6, threshold = 0.9)
      .orderBy("id_a", "id_b")
  }

  val q55Sql: String =
    """WITH corpus AS (
         SELECT vec_id, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000 AS vec_id, embedding
         FROM embeddings WHERE vec_id < 40
         UNION ALL
         SELECT vec_id + 2000000 AS vec_id,
                [CASE WHEN i = 64 THEN -embedding[i] ELSE embedding[i] END
                 for i in generate_series(1, len(embedding))] AS embedding
         FROM embeddings WHERE vec_id < 40),
       v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM corpus),
       proj AS (
         SELECT v.vec_id, pl.p,
                list_sum([v.e[i] *
                  (2 * instr('0123456789abcdef',
                     substr(md5(pl.p || '-' || (i - 1)), 1, 1)) - 17)
                  for i in generate_series(1, len(v.e))]) AS proj
         FROM v CROSS JOIN (SELECT unnest(range(0, 6)) AS p) pl),
       buck AS (
         SELECT vec_id,
                CAST(sum(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY 1),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       sc AS (
         SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                CAST(list_sum([xn.e[i] * yn.e[i]
                       for i in generate_series(1, len(xn.e))]) AS DOUBLE) /
                  (sqrt(CAST(xn.nn AS DOUBLE)) * sqrt(CAST(yn.nn AS DOUBLE)))
                  AS cosine
         FROM buck x JOIN buck y ON x.bucket = y.bucket
           AND x.vec_id < y.vec_id
         JOIN n xn ON xn.vec_id = x.vec_id
         JOIN n yn ON yn.vec_id = y.vec_id)
       SELECT id_a, id_b, cosine FROM sc WHERE cosine >= 0.9
       ORDER BY id_a, id_b"""

  // --- q112: vocabulary build (StringIndexer / tokenizer-vocab analog) --
  /** Frequency-ranked token vocabulary with dense integer ids — the
    * id-assignment step every tokenizer / categorical encoder needs:
    * vocab_id = row_number over (count DESC, token ASC), a TOTAL order
    * so ids are stable across runs, engines and partitionings. The
    * corpus reduces to a (token, cnt, df) table before any ranking, so
    * the global window sorts |vocab| rows, never |tokens|; the top-200
    * truncation keeps the contract explicit. At 100 TB vocab ids over
    * the FULL vocabulary come from the same rank expression executed as
    * a range-partitioned sort (or zipWithIndex over a sorted frame) —
    * the (cnt DESC, token ASC) total order is the portable part. */
  def q112VocabBuild(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val vocab = toks.groupBy("token")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("df"))
    vocab
      .withColumn("vocab_id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token").asc))
        .cast("long"))
      .filter(col("vocab_id") <= 200)
      .select(col("vocab_id"), col("token"), col("cnt"), col("df"))
      .orderBy("vocab_id")
  }

  val q112Sql: String =
    """WITH toks AS (
         SELECT doc_id, u.token
         FROM documents, unnest(string_split(text, ' ')) AS u(token)),
       v AS (
         SELECT token, CAST(count(*) AS BIGINT) AS cnt,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         FROM toks GROUP BY 1)
       SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token ASC)
                AS BIGINT) AS vocab_id,
              token, cnt, df
       FROM v QUALIFY vocab_id <= 200 ORDER BY vocab_id"""

  // --- q113: feature hashing (the hashing trick) ------------------------
  /** Fixed-width sparse featurization without a vocabulary: token →
    * bucket = hash60(token) mod 1024, per-doc bucket counts — the
    * Weinberger et al. 2009 hashing trick that makes encoding stateless
    * (no vocab build, no broadcast dictionary, new tokens never change
    * the schema). Entirely in-row until ONE (doc, bucket) hash
    * aggregate; every value is an integer so the sparse matrix is
    * hash-exact cross-engine. The doc_id < 50 slice bounds the output
    * contract, not the technique. */
  def q113FeatureHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"),
        pmod(Dedup.hash60(col("token")), lit(1024L)).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "bucket")

  val q113Sql: String =
    """WITH toks AS (
         SELECT doc_id, u.token
         FROM documents, unnest(string_split(text, ' ')) AS u(token)
         WHERE doc_id < 50)
       SELECT doc_id,
              ('0x' || substr(md5(token), 1, 15))::BIGINT % 1024 AS bucket,
              CAST(count(*) AS BIGINT) AS cnt
       FROM toks GROUP BY 1, 2 ORDER BY doc_id, bucket"""

  // --- q119: trigram continuation table (count-based LM prep) -----------
  /** Top-3 next-token continuations per bigram context — the n-gram
    * language-model table (and the data behind repetition/boilerplate
    * mining): trigrams stream map-side from each doc's token array via
    * posexplode (no self-join, the q86/q97 pair shape), one hash
    * aggregate counts them, contexts seen ≥ 5 times keep their top-3
    * continuations by (cnt DESC, w3 ASC). The per-context rank compiles
    * to WindowGroupLimit so map tasks emit at most 3 rows per context
    * before the exchange. At 100 TB the tokens would be hash60'd so the
    * shuffle moves (long,long,long) triples, never strings — kept as
    * text here so the table is human-readable. */
  def q119TrigramLm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = t(s, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val tri = tk
      .select(posexplode(col("t")).as(Seq("i", "w1")), col("t"))
      .filter(col("i") <= size(col("t")) - 3)
      .select(col("w1"), expr("t[i + 1]").as("w2"),
        expr("t[i + 2]").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))
    val ctx = tri.groupBy("w1", "w2").agg(sum("cnt").as("ctx_cnt"))
      .filter(col("ctx_cnt") >= 5)
    tri.join(ctx, Seq("w1", "w2"))
      .withColumn("rk", row_number().over(Window.partitionBy("w1", "w2")
        .orderBy(col("cnt").desc, col("w3").asc)))
      .filter(col("rk") <= 3)
      .select(col("w1"), col("w2"), col("rk"), col("w3"), col("cnt"),
        col("ctx_cnt"))
      .orderBy("w1", "w2", "rk")
  }

  val q119Sql: String =
    """WITH tk AS (
         SELECT string_split(text, ' ') AS t FROM documents
         WHERE len(string_split(text, ' ')) >= 3),
       tri AS (
         SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS cnt FROM (
           SELECT t[u.i] AS w1, t[u.i + 1] AS w2, t[u.i + 2] AS w3
           FROM tk, unnest(generate_series(1, len(t) - 2)) AS u(i))
         GROUP BY 1, 2, 3),
       ctx AS (
         SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS ctx_cnt
         FROM tri GROUP BY 1, 2 HAVING sum(cnt) >= 5)
       SELECT tri.w1, tri.w2,
              CAST(row_number() OVER (PARTITION BY tri.w1, tri.w2
                ORDER BY tri.cnt DESC, tri.w3 ASC) AS INTEGER) AS rk,
              tri.w3, tri.cnt, ctx.ctx_cnt
       FROM tri JOIN ctx USING (w1, w2)
       QUALIFY rk <= 3 ORDER BY w1, w2, rk"""

  // --- q256: mutual nearest-neighbor pairs ------------------------------
  /** Mutual top-1 cosine pairs over the embedding corpus — each vector's
    * single best non-self neighbor, kept only when the choice is
    * RECIPROCAL. Mutual-NN is the high-precision matching primitive
    * (bitext mining's margin criterion starts here; reciprocal pairs
    * are also the safest near-dup merge candidates, cf. q55). The
    * neighbor search reuses [[Similarity.bruteForceTopK]] at k=2 (the
    * self row ranks ≤2, so the best non-self is always inside the
    * top-2) with the codegen'd integer-dot kernels; the mutuality check
    * is one |D|-row self-join on (qid → nn). At corpus scale the
    * brute-force stage swaps for the LSH/IVF candidate generation
    * (q30/q64) — the per-vector top-1 reduction and the reciprocal
    * join are unchanged, and stay |D|-row shaped. */
  def q256MutualNn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val nn = Similarity.bruteForceTopK(emb, emb, k = 2)
      .filter(col("did") =!= col("qid"))
      .groupBy("qid")
      .agg(min(struct(col("rank"), col("did"), col("cosine"))).as("m"))
      .select(col("qid"), col("m.did").as("nn_id"),
        col("m.cosine").as("cosine"))
    nn.as("a").join(nn.as("b"),
        col("a.nn_id") === col("b.qid") && col("b.nn_id") === col("a.qid")
          && col("a.qid") < col("b.qid"))
      .select(col("a.qid").as("id_a"), col("b.qid").as("id_b"),
        col("a.cosine").as("cosine"))
      .orderBy("id_a")
  }

  val q256Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       p AS (
         SELECT q.vec_id AS qid, d.vec_id AS did,
                list_sum([q.e[i] * d.e[i]
                          for i in generate_series(1, len(q.e))]) AS dot,
                q.nn AS qq, d.nn AS dd
         FROM n q CROSS JOIN n d WHERE q.vec_id <> d.vec_id),
       sc AS (
         SELECT qid, did,
                CAST(dot AS DOUBLE) /
                  (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(dd AS DOUBLE)))
                  AS cosine
         FROM p),
       best AS (
         SELECT qid, did, cosine,
                row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, did ASC) AS rn
         FROM sc QUALIFY rn = 1)
       SELECT a.qid AS id_a, b.qid AS id_b, a.cosine AS cosine
       FROM best a JOIN best b
         ON a.did = b.qid AND b.did = a.qid AND a.qid < b.qid
       ORDER BY id_a"""

  // --- q259: shared-span locator (plagiarism offsets) -------------------
  /** WHERE the near-duplicate corpus overlaps, not just THAT it does:
    * the longest contiguous common token run per near-dup pair, via
    * positional shingle postings + the diagonal-island window — the
    * quotation / plagiarism-span primitive set similarity can't
    * express. DECLARED in its scale-safe form: [[Dedup
    * .minHashCandidates]] bounds pair generation (est_jaccard ≥ 0.6 —
    * the tight-duplicate band; q311 is the same composition at the
    * looser 0.5 cut) and [[Dedup.sharedSpansFor]] locates spans for
    * exactly those pairs, so a 1000× corpus pays 1000× the signature
    * pass plus work ∝ its TRUE near-dup pairs — never Σ occ² over
    * boilerplate shingles, which is what the corpus-direct
    * [[Dedup.sharedSpans]] costs (that form stays available, spec'd
    * in DedupSpec, for bounded corpora where every co-occurring pair
    * genuinely needs a span). The planted near-dup corpus (every doc
    * + its first-word-dropped copy) makes the expected answer
    * structural: the copy shares the original's whole tail, so spans
    * ≈ doc length − 1 token. */
  def q259SharedSpans(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(t(s, dir, "documents"))
    val cand = Dedup.minHashCandidates(corpus, "doc_id", "text",
        n = 3, numPerm = 16, rowsPerBand = 4)
      .filter(col("est_jaccard") >= 0.6)
      .select("id_a", "id_b")
    Dedup.sharedSpansFor(corpus, "doc_id", "text", n = 3, minRun = 5L,
        candidates = cand)
      .orderBy("id_a", "id_b")
  }

  /** Oracle for the LSH-bounded span locator at a given est-jaccard
    * cut: q27's MinHash/LSH candidate CTEs feed q259's positional-
    * shingle diagonal-island span CTEs, restricted to the candidate
    * pairs — the whole composition replayed in SQL. */
  private def spansLshSql(threshold: String): String =
    s"""WITH corpus AS ($corpusSql),
       $shingleSql,
       perms AS (SELECT unnest(range(0, 16)) AS perm),
       sig AS (
         SELECT sid, perm,
                min(((2 * perm + 1) * (h % 2147483647) +
                     (7919 * perm + 13)) % 2147483647) AS sig
         FROM sh CROSS JOIN perms GROUP BY 1, 2),
       band AS (
         SELECT sid, perm // 4 AS band,
                md5(min(CASE WHEN perm % 4 = 0 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 1 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 2 THEN sig END)::VARCHAR
                    || '|' ||
                    min(CASE WHEN perm % 4 = 3 THEN sig END)::VARCHAR)
                  AS band_key
         FROM sig GROUP BY 1, 2),
       cand0 AS (
         SELECT DISTINCT x.sid AS id_a, y.sid AS id_b
         FROM band x
         JOIN band y ON x.band = y.band AND x.band_key = y.band_key
                    AND x.sid < y.sid),
       est AS (
         SELECT id_a, id_b,
                CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                  AS DOUBLE) / 16 AS est_jaccard
         FROM cand0
         JOIN sig sa ON sa.sid = id_a
         JOIN sig sb ON sb.sid = id_b AND sb.perm = sa.perm
         GROUP BY 1, 2),
       cpair AS (SELECT id_a, id_b FROM est
                 WHERE est_jaccard >= $threshold),
       psh AS (
         SELECT doc_id AS sid, CAST(i - 1 AS BIGINT) AS pos,
                ('0x' ||
                 substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15)
                )::BIGINT AS h
         FROM toks, unnest(generate_series(1, len(tk) - 2)) AS u(i)
         WHERE len(tk) >= 3),
       hits AS (
         SELECT c.id_a, c.id_b, a.pos AS pa, a.pos - b.pos AS diag
         FROM cpair c
         JOIN psh a ON a.sid = c.id_a
         JOIN psh b ON b.sid = c.id_b AND b.h = a.h),
       runs AS (
         SELECT id_a, id_b, diag, pa,
                pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                  ORDER BY pa) AS grp
         FROM hits),
       islands AS (
         SELECT id_a, id_b, diag, grp,
                CAST(count(*) AS BIGINT) AS run_len,
                min(pa) AS start_a
         FROM runs GROUP BY 1, 2, 3, 4),
       best AS (
         SELECT id_a, id_b, diag, run_len, start_a,
                row_number() OVER (PARTITION BY id_a, id_b
                  ORDER BY run_len DESC, start_a ASC, diag ASC) AS rn
         FROM islands)
       SELECT id_a, id_b, run_len AS run_shingles,
              CAST(run_len + 2 AS BIGINT) AS span_tokens,
              start_a, CAST(start_a - diag AS BIGINT) AS start_b
       FROM best WHERE rn = 1 AND run_len >= 5
       ORDER BY id_a, id_b"""

  val q259Sql: String = spansLshSql("0.6")

  // --- q311: LSH-bounded shared-span locator (the 100 TB wiring) --------
  /** [[Dedup.sharedSpansFor]] composed with [[Dedup.minHashCandidates]]
    * at the LOOSER est_jaccard ≥ 0.5 cut — the recall band of the
    * same scale-safe composition q259 declares at ≥ 0.6: pair
    * generation is bounded by the LSH candidate list instead of by
    * every co-occurring shingle, so a corpus 1000× larger pays 1000×
    * the signature pass plus work proportional to its TRUE near-dup
    * pairs, never Σ occ² over boilerplate shingles. Oracle replays
    * the whole composition ([[spansLshSql]]). */
  def q311SpansLshBounded(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupCorpus(t(s, dir, "documents"))
    val cand = Dedup.minHashCandidates(corpus, "doc_id", "text",
        n = 3, numPerm = 16, rowsPerBand = 4)
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b")
    Dedup.sharedSpansFor(corpus, "doc_id", "text", n = 3, minRun = 5L,
        candidates = cand)
      .orderBy("id_a", "id_b")
  }

  val q311Sql: String = spansLshSql("0.5")

  // --- q317: video frame dedup through the REAL demux path --------------
  /** Per-FRAME perceptual dedup of a video corpus, end-to-end real
    * pure-JVM: every video document is materialized as a spec-valid
    * MJPEG MP4 ([[graft.multimodal.Multimodal.synthMjpegMp4]] — real
    * ISO-BMFF sample tables over real baseline-JPEG frames, planted
    * duplicate topology), then DEMUXED back
    * ([[graft.multimodal.Multimodal.videoFrames]] walks
    * stsd/stsz/stsc/stco exactly as a demuxer does to slice per-frame
    * byte ranges out of mdat), each recovered frame JPEG-decoded and
    * perceptually hashed ([[graft.multimodal.Multimodal.dHash]]), and
    * frames grouped by hash. The video analog of q163: the planted
    * topology is a pure function of (doc_id, frame_idx) — frames
    * repeat within a video with period 4, and videos ≡2 (mod 21)
    * reuse their predecessor video's frame contents — so the oracle
    * groups by that content key directly, and the hash compare proves
    * the container-write → demux → decode → hash path recovered
    * exactly the planted structure from PIXELS. Spark shape: the
    * per-doc mux/demux runs in one `flatMapGroups` stage whose input
    * shuffle carries only (doc_id, frame_idx, seed) — payload bytes
    * never shuffle — and the exchange after carries only
    * (doc_id, frame_idx, phash); the hash-group window is over a LONG.
    * At 100 TB the synthesis stage is replaced by the parquet scan of
    * the binary payload column and the decode stays the same
    * embarrassingly-parallel partition-local pass. */
  def q317VideoFrameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.{Multimodal => M}
    val frames = t(s, dir, "documents")
      .filter(col("doc_id") % 3 === 2) // the video-mime class (toBinary)
      .select(col("doc_id"),
        explode(sequence(lit(0L), lit(5L))).as("frame_idx"))
      .withColumn("canon",
        when(col("doc_id") % 21 === 2, col("doc_id") - 3)
          .otherwise(col("doc_id")))
      .withColumn("seed",
        md5(concat_ws(":", col("canon"), col("frame_idx") % 4)))
      .select("doc_id", "frame_idx", "seed")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val hashed = frames.as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (id: Long, it: Iterator[(Long, Long, String)]) =>
        val seeds = it.toSeq.sortBy(_._2).map(_._3)
        val mp4 = M.synthMjpegMp4(
          seeds.map(M.synthFrameJpeg), 16, 16, samplesPerChunk = 4)
        M.videoFrames(mp4).iterator.zipWithIndex.map {
          case (jpeg, i) => (id, i.toLong, M.dHash(jpeg))
        }
      }
      .toDF("doc_id", "frame_idx", "phash")
    hashed
      .withColumn("group_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("phash")))
      .select(col("doc_id"), col("frame_idx"), col("group_size"),
        (col("group_size") > 1).as("is_dup"))
      .orderBy("doc_id", "frame_idx")
  }

  val q317Sql: String =
    """WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
       f AS (
         SELECT doc_id, CAST(u.i AS BIGINT) AS frame_idx,
                CASE WHEN doc_id % 21 = 2 THEN doc_id - 3
                     ELSE doc_id END AS canon
         FROM v, unnest(generate_series(0, 5)) AS u(i)),
       k AS (
         SELECT doc_id, frame_idx,
                canon || ':' || (frame_idx % 4) AS ck
         FROM f)
       SELECT doc_id, frame_idx,
              CAST(count(*) OVER (PARTITION BY ck) AS BIGINT)
                AS group_size,
              count(*) OVER (PARTITION BY ck) > 1 AS is_dup
       FROM k ORDER BY doc_id, frame_idx"""

  val all: Map[String, Q] = Map(
    "q317_video_frame_dedup" -> q317VideoFrameDedup _,
    "q311_spans_lsh_bounded" -> q311SpansLshBounded _,
    "q259_shared_spans" -> q259SharedSpans _,
    "q275_thumb_dedup" -> q275ThumbDedup _,
    "q280_rendezvous_shards" -> q280RendezvousShards _,
    "q289_distinctive_terms" -> q289DistinctiveTerms _,
    "q292_source_tvd_matrix" -> q292SourceTvdMatrix _,
    "q281_vocab_growth" -> q281VocabGrowth _,
    "q256_mutual_nn" -> q256MutualNn _,
    "q25_dedup_exact" -> q25DedupExact _,
    "q26_dedup_jaccard" -> q26DedupJaccard _,
    "q248_containment" -> q248Containment _,
    "q27_dedup_minhash" -> q27DedupMinHash _,
    "q28_dedup_simhash" -> q28DedupSimHash _,
    "q29_cosine_topk" -> q29CosineTopK _,
    "q30_ann_lsh" -> q30AnnLsh _,
    "q62_ann_multiprobe" -> q62AnnMultiProbe _,
    "q63_dup_clusters" -> q63DupClusters _,
    "q64_kmeans_ivf" -> q64KmeansIvf _,
    "q67_ivf_trained" -> q67IvfTrained _,
    "q69_repetition" -> q69Repetition _,
    "q73_decontaminate" -> q73Decontaminate _,
    "q74_quota_sample" -> q74QuotaSample _,
    "q75_pii_redact" -> q75PiiRedact _,
    "q76_bm25" -> q76Bm25 _,
    "q77_quantize_int8" -> q77QuantizeInt8 _,
    "q78_sentence_dedup" -> q78SentenceDedup _,
    "q79_scd2_history" -> q79Scd2History _,
    "q80_funnel" -> q80Funnel _,
    "q81_pack_sequences" -> q81PackSequences _,
    "q82_incremental_dedup" -> q82IncrementalDedup _,
    "q83_corpus_report" -> q83CorpusReport _,
    "q85_rolling_window" -> q85RollingWindow _,
    "q86_collocations" -> q86Collocations _,
    "q87_pagerank" -> q87PageRank _,
    "q91_interval_join" -> q91IntervalJoin _,
    "q92_semantic_dedup" -> q92SemanticDedup _,
    "q150_semantic_incremental" -> q150SemanticIncremental _,
    "q93_fuzzy_match" -> q93FuzzyMatch _,
    "q94_ngram_profile" -> q94NgramProfile _,
    "q101_dq_report" -> q101DqReport _,
    "q102_cdc_apply" -> q102CdcApply _,
    "q103_ann_recall" -> q103AnnRecall _,
    "q104_incremental_agg" -> q104IncrementalAgg _,
    "q105_pq_topk" -> q105PqTopK _,
    "q106_ivf_pq" -> q106IvfPq _,
    "q37_ivfpq_residual" -> q37IvfPqResidual _,
    "q107_gap_fill" -> q107GapFill _,
    "q112_vocab_build" -> q112VocabBuild _,
    "q113_feature_hash" -> q113FeatureHash _,
    "q119_trigram_lm" -> q119TrigramLm _,
    "q31_lang_id" -> q31LangId _,
    "q32_text_quality" -> q32TextQuality _,
    "q33_token_count" -> q33TokenCount _,
    "q34_fingerprint" -> q34Fingerprint _,
    "q153_text_normalize" -> q153TextNormalize _,
    "q154_span_dedup" -> q154SpanDedup _,
    "q35_binary_meta" -> q35BinaryMeta _,
    "q47_multimodal_features" -> q47MultimodalFeatures _,
    "q163_image_phash" -> q163ImagePhash _,
    "q167_sorted_neighborhood" -> q167SortedNeighborhood _,
    "q168_audio_fingerprint" -> q168AudioFingerprint _,
    "q169_phash_near_dup" -> q169PhashNearDup _,
    "q48_ivf_topk" -> q48IvfTopK _,
    "q49_session_window" -> q49SessionWindow _,
    "q50_approx_distinct" -> q50ApproxDistinct _,
    "q51_delay_parse_native" -> q51DelayParseNative _,
    "q52_mode_single_pass" -> q52ModeSinglePass _,
    "q53_corpus_prep" -> q53CorpusPrep _,
    "q54_asof_join" -> q54AsofJoin _,
    "q55_cosine_near_dup" -> q55CosineNearDup _,
  )

  val oracles: Map[String, String] = Map(
    "q25_dedup_exact" -> q25Sql,
    "q26_dedup_jaccard" -> q26Sql,
    "q248_containment" -> q248Sql,
    "q27_dedup_minhash" -> q27Sql,
    "q28_dedup_simhash" -> q28Sql,
    "q29_cosine_topk" -> q29Sql,
    "q256_mutual_nn" -> q256Sql,
    "q259_shared_spans" -> q259Sql,
    "q317_video_frame_dedup" -> q317Sql,
    "q311_spans_lsh_bounded" -> q311Sql,
    "q275_thumb_dedup" -> q275Sql,
    "q280_rendezvous_shards" -> q280Sql,
    "q289_distinctive_terms" -> q289Sql,
    "q292_source_tvd_matrix" -> q292Sql,
    "q281_vocab_growth" -> q281Sql,
    "q30_ann_lsh" -> q30Sql,
    "q62_ann_multiprobe" -> q62Sql,
    "q63_dup_clusters" -> q63Sql,
    "q64_kmeans_ivf" -> q64Sql,
    "q67_ivf_trained" -> q67Sql,
    "q69_repetition" -> q69Sql,
    "q73_decontaminate" -> q73Sql,
    "q74_quota_sample" -> q74Sql,
    "q75_pii_redact" -> q75Sql,
    "q76_bm25" -> q76Sql,
    "q77_quantize_int8" -> q77Sql,
    "q78_sentence_dedup" -> q78Sql,
    "q79_scd2_history" -> q79Sql,
    "q80_funnel" -> q80Sql,
    "q81_pack_sequences" -> q81Sql,
    "q82_incremental_dedup" -> q82Sql,
    "q83_corpus_report" -> q83Sql,
    "q85_rolling_window" -> q85Sql,
    "q86_collocations" -> q86Sql,
    "q87_pagerank" -> q87Sql,
    "q91_interval_join" -> q91Sql,
    "q92_semantic_dedup" -> q92Sql,
    "q150_semantic_incremental" -> q150Sql,
    "q93_fuzzy_match" -> q93Sql,
    "q94_ngram_profile" -> q94Sql,
    "q101_dq_report" -> q101Sql,
    "q102_cdc_apply" -> q102Sql,
    "q103_ann_recall" -> q103Sql,
    "q104_incremental_agg" -> q104Sql,
    "q105_pq_topk" -> q105Sql,
    "q106_ivf_pq" -> q106Sql,
    "q37_ivfpq_residual" -> q37Sql,
    "q107_gap_fill" -> q107Sql,
    "q112_vocab_build" -> q112Sql,
    "q113_feature_hash" -> q113Sql,
    "q119_trigram_lm" -> q119Sql,
    "q31_lang_id" -> q31Sql,
    "q32_text_quality" -> q32Sql,
    "q33_token_count" -> q33Sql,
    "q34_fingerprint" -> q34Sql,
    "q153_text_normalize" -> q153Sql,
    "q154_span_dedup" -> q154Sql,
    "q35_binary_meta" -> q35Sql,
    "q47_multimodal_features" -> q47Sql,
    "q163_image_phash" -> q163Sql,
    "q167_sorted_neighborhood" -> q167Sql,
    "q168_audio_fingerprint" -> q168Sql,
    "q169_phash_near_dup" -> q169Sql,
    "q48_ivf_topk" -> q48Sql,
    "q49_session_window" -> q49Sql,
    "q50_approx_distinct" -> q50Sql,
    "q51_delay_parse_native" -> CoreQueries.q16Sql, // same semantics as q16
    "q52_mode_single_pass" -> CoreQueries.q06Sql,   // same semantics as q06
    "q53_corpus_prep" -> q53Sql,
    "q54_asof_join" -> q54Sql,
    "q55_cosine_near_dup" -> q55Sql,
  )
}
