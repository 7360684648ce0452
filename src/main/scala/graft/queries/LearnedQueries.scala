package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-adjacent corpus operators — the "learned" tier of a training-data
  * pipeline, oracle-gated like everything else:
  *
  *   - q176: reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two
  *     independent retrieval rankers — the standard way a RAG stack
  *     combines keyword (BM25) and dense/heuristic rankings without score
  *     calibration. Each ranker's top-k compiles to
  *     TakeOrderedAndProject, so the corpus is never globally sorted; the
  *     fusion join runs over two k-bounded row sets.
  *   - q177: full-batch gradient-descent training of a linear model,
  *     executed as ONE pass of exact integer moment accumulation: for
  *     squared loss the batch gradient is a linear function of the
  *     sufficient statistics (n, Σx, Σy, Σxy, Σx²), so T iterations need
  *     one scan + T scalar updates on a broadcast one-row frame, not T
  *     scans. (For losses whose gradient does NOT collapse to sufficient
  *     statistics — logistic, softmax — each iteration is one
  *     tree-aggregate of a d-dim gradient against broadcast weights;
  *     same shuffle shape as this query's moment pass, T times.)
  *   - q178: multinomial Naive-Bayes model estimation over the documents
  *     corpus (class = lang): Laplace-smoothed per-class token
  *     probabilities and class priors. One token-count shuffle (partial
  *     agg map-side, vocab-bounded), class totals and vocabulary size
  *     reduced to broadcast one-row frames, per-class top-k via
  *     WindowGroupLimit.
  *   - q180: distributed BPE-style vocabulary learning — two pair-merge
  *     rounds: count adjacent token pairs (one vocab-bounded shuffle per
  *     round), pick the globally most frequent pair, broadcast it, apply
  *     the merge map-side inside the token arrays (no explode of the
  *     corpus for the rewrite), repeat. Self-pairs (a = b) are excluded
  *     from merge candidacy, which makes every merge site independent of
  *     its neighbours (no overlapping matches), so the rewrite is a pure
  *     per-element expression — the property that keeps the apply step
  *     embarrassingly parallel. Real subword BPE differs only in
  *     tokenizing to characters first and looping more rounds; the
  *     per-round dataflow (count → argmax → broadcast → map-side rewrite)
  *     is exactly this.
  *
  * Cross-engine determinism: every ranking is integer-or-exact with
  * lexicographic tie-breaks; every double is produced by a single
  * correctly-rounded IEEE expression evaluated in the same written order
  * in both engines (the q76/q125 discipline — no ln, no float sums over
  * data-dependent orders).
  */
object LearnedQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.io.Sources.table(s, dir, name)

  private val dec = "decimal(38,0)"

  // --- q176: reciprocal-rank fusion of two rankers ----------------------
  /** RRF with the published k = 60: score(d) = Σ_r 1/(60 + rank_r(d)),
    * summed over the rankers that retrieved d (absent → contributes 0,
    * via coalesce on a full-outer join of the two top-20 lists).
    *
    * Ranker 1 is q76's BM25 (terms spark/window/hash, identical IEEE
    * expression); ranker 2 ranks by distinct-token count (an integer
    * lexical-diversity heuristic — deterministic stand-in for a dense
    * retriever's score). Both rankers take top-20 FIRST
    * (TakeOrderedAndProject: per-task top-k, driver merge, no global
    * sort) and only then materialize ranks with a row_number over the
    * 20-row result — the window never sees the corpus. */
  def q176RrfFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("spark", "window", "hash")
    val base = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("__tk"))
    val scored = base
      .select(col("doc_id") +:
        size(col("__tk")).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (tm, i) =>
          size(filter(col("__tk"), x => x === lit(tm)))
            .cast("double").as(s"tf$i") }: _*)
    val statAggs =
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i"))
    val stats = scored.agg(count(lit(1)).cast("double").as("n"),
      statAggs: _*)
    val perTerm = terms.indices.map { i =>
      ((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5)) *
        (col(s"tf$i") * 2.2) /
        (col(s"tf$i") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }
    val bm25Top = scored.crossJoin(broadcast(stats))
      .select(col("doc_id"), perTerm.reduce(_ + _).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
    val r1 = bm25Top.select(col("doc_id"),
      row_number().over(
        Window.orderBy(col("score").desc, col("doc_id")))
        .as("bm25_rank"))
    val divTop = base
      .select(col("doc_id"),
        size(array_distinct(col("__tk"))).as("ndist"))
      .orderBy(col("ndist").desc, col("doc_id"))
      .limit(20)
    val r2 = divTop.select(col("doc_id"),
      row_number().over(
        Window.orderBy(col("ndist").desc, col("doc_id")))
        .as("tok_rank"))
    def contrib(rank: Column): Column =
      coalesce(lit(1.0) / (lit(60.0) + rank.cast("double")), lit(0.0))
    r1.join(r2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("tok_rank"),
        (contrib(col("bm25_rank")) + contrib(col("tok_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  val q176Sql: String =
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
         FROM f CROSS JOIN st),
       bmtop AS (
         SELECT doc_id, score FROM sc WHERE score > 0
         ORDER BY score DESC, doc_id LIMIT 20),
       r1 AS (
         SELECT doc_id,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                  AS INTEGER) AS bm25_rank
         FROM bmtop),
       divtop AS (
         SELECT doc_id,
                CAST(len(list_distinct(tk)) AS INTEGER) AS ndist
         FROM d ORDER BY ndist DESC, doc_id LIMIT 20),
       r2 AS (
         SELECT doc_id,
                CAST(row_number() OVER (ORDER BY ndist DESC, doc_id)
                  AS INTEGER) AS tok_rank
         FROM divtop),
       fused AS (
         SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id,
                r1.bm25_rank, r2.tok_rank,
                coalesce(1.0 / (60.0 + CAST(r1.bm25_rank AS DOUBLE)), 0.0) +
                coalesce(1.0 / (60.0 + CAST(r2.tok_rank AS DOUBLE)), 0.0)
                  AS rrf
         FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id)
       SELECT doc_id, bm25_rank, tok_rank, rrf
       FROM fused ORDER BY rrf DESC, doc_id LIMIT 10"""

  // --- q177: gradient-descent linear-model training ---------------------
  /** Three full-batch GD iterations of price ~ w0 + w1·quantity on
    * lineitem, from one exact-moment pass (q125's DECIMAL(38,0)
    * accumulation: order-independent, exact, so the doubles the
    * iterations start from are bit-identical across engines). Learning
    * rate 2⁻¹⁰ — exactly representable, and lr·λmax ≈ 0.85 < 2 for this
    * data's moment matrix, so the iterates stay bounded.
    *
    * Per-iteration arithmetic (gradient of ½·mean squared error):
    *   g0 = (n·w0 + Σx·w1 − Σy)/n,  g1 = (Σx·w0 + Σx²·w1 − Σxy)/n,
    *   w ← w − lr·g,
    * every op a single correctly-rounded IEEE step in the same written
    * order in both engines. Moment magnitudes stay below 2⁵³ through
    * sf1 (Σxy ≈ 5.7·10¹⁵ at 6M rows), so the decimal→double cast is
    * exact; beyond that the cast rounds once, identically in both
    * engines. */
  def q177GdTraining(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_quantity").cast("long").cast(dec).as("x"),
      expr(s"CAST(CAST(round(l_extendedprice) AS BIGINT) AS $dec)")
        .as("y"))
    val m = li.agg(
      count(lit(1)).cast(dec).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val d = m.select(
      col("n").cast("double").as("n_d"),
      col("sx").cast("double").as("sx_d"),
      col("sy").cast("double").as("sy_d"),
      col("sxy").cast("double").as("sxy_d"),
      col("sxx").cast("double").as("sxx_d"))
    val lr = lit(0.0009765625) // 2^-10
    def step(w0: Column, w1: Column): (Column, Column) = {
      val g0 = (col("n_d") * w0 + col("sx_d") * w1 - col("sy_d")) /
        col("n_d")
      val g1 = (col("sx_d") * w0 + col("sxx_d") * w1 - col("sxy_d")) /
        col("n_d")
      (w0 - lr * g0, w1 - lr * g1)
    }
    val (w0a, w1a) = step(lit(0.0), lit(0.0))
    val it1 = d.select(col("*"), w0a.as("w0_1"), w1a.as("w1_1"))
    val (w0b, w1b) = step(col("w0_1"), col("w1_1"))
    val it2 = it1.select(col("*"), w0b.as("w0_2"), w1b.as("w1_2"))
    val (w0c, w1c) = step(col("w0_2"), col("w1_2"))
    val it3 = it2.select(col("*"), w0c.as("w0_3"), w1c.as("w1_3"))
    it3.select(explode(array(
        struct(lit(1).as("iter"), col("w0_1").as("w0"),
          col("w1_1").as("w1")),
        struct(lit(2).as("iter"), col("w0_2").as("w0"),
          col("w1_2").as("w1")),
        struct(lit(3).as("iter"), col("w0_3").as("w0"),
          col("w1_3").as("w1")))).as("it"))
      .select(col("it.iter").as("iter"), col("it.w0").as("w0"),
        col("it.w1").as("w1"))
      .orderBy("iter")
  }

  val q177Sql: String =
    """WITH li AS (
         SELECT CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS x,
                CAST(CAST(round(l_extendedprice) AS BIGINT) AS HUGEINT)
                  AS y
         FROM lineitem),
       m AS (
         SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
         FROM li),
       d AS (
         SELECT CAST(n AS DOUBLE) AS n_d, CAST(sx AS DOUBLE) AS sx_d,
                CAST(sy AS DOUBLE) AS sy_d, CAST(sxy AS DOUBLE) AS sxy_d,
                CAST(sxx AS DOUBLE) AS sxx_d
         FROM m),
       i1 AS (
         SELECT *,
                0.0 - 0.0009765625 *
                  ((n_d * 0.0 + sx_d * 0.0 - sy_d) / n_d) AS w0_1,
                0.0 - 0.0009765625 *
                  ((sx_d * 0.0 + sxx_d * 0.0 - sxy_d) / n_d) AS w1_1
         FROM d),
       i2 AS (
         SELECT *,
                w0_1 - 0.0009765625 *
                  ((n_d * w0_1 + sx_d * w1_1 - sy_d) / n_d) AS w0_2,
                w1_1 - 0.0009765625 *
                  ((sx_d * w0_1 + sxx_d * w1_1 - sxy_d) / n_d) AS w1_2
         FROM i1),
       i3 AS (
         SELECT *,
                w0_2 - 0.0009765625 *
                  ((n_d * w0_2 + sx_d * w1_2 - sy_d) / n_d) AS w0_3,
                w1_2 - 0.0009765625 *
                  ((sx_d * w0_2 + sxx_d * w1_2 - sxy_d) / n_d) AS w1_3
         FROM i2)
       SELECT CAST(1 AS INTEGER) AS iter, w0_1 AS w0, w1_1 AS w1 FROM i3
       UNION ALL
       SELECT CAST(2 AS INTEGER), w0_2, w1_2 FROM i3
       UNION ALL
       SELECT CAST(3 AS INTEGER), w0_3, w1_3 FROM i3
       ORDER BY iter"""

  // --- q178: Naive-Bayes model estimation -------------------------------
  /** Multinomial NB over documents, class = lang: per-class Laplace-
    * smoothed token probabilities P(tok|c) = (cnt + 1)/(tot_c + V) for
    * the top-5 tokens of each class (rank by raw count — the smoothed
    * denominator is constant within a class, so integer count order IS
    * probability order; ties break on token), plus the class prior
    * n_docs_c / n_docs. Everything is exact integers until the two
    * final single divisions.
    *
    * Plan shape: explode → one (lang, token) count shuffle with map-side
    * partial aggregation (vocab-bounded, NOT corpus-bounded), per-class
    * top-5 via WindowGroupLimit, then broadcast joins of the per-class
    * totals (|classes| rows) and a cross join of the two one-row frames
    * (vocabulary size, document count). Nothing after the token count
    * touches more than |classes|·5 rows. */
  def q178NaiveBayes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val tc = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val top5 = tc
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("cnt").desc, col("token"))))
      .filter(col("rank") <= 5)
    val tot = tc.groupBy("lang").agg(sum("cnt").as("tot"))
    val vocab = tc.select(countDistinct("token").as("v"))
    val prior = docs.groupBy("lang").agg(count(lit(1)).as("nd"))
    val ndAll = docs.agg(count(lit(1)).as("nd_all"))
    top5
      .join(broadcast(tot), Seq("lang"))
      .join(broadcast(prior), Seq("lang"))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(ndAll))
      .select(col("lang"), col("token"), col("cnt"), col("rank"),
        ((col("cnt") + 1).cast("double") /
          (col("tot") + col("v")).cast("double")).as("prob"),
        (col("nd").cast("double") / col("nd_all").cast("double"))
          .as("prior"))
      .orderBy("lang", "rank")
  }

  val q178Sql: String =
    """WITH tc AS (
         SELECT lang, unnest(string_split(text, ' ')) AS token
         FROM documents),
       c AS (
         SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
         FROM tc GROUP BY 1, 2),
       top5 AS (
         SELECT lang, token, cnt,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY cnt DESC, token) AS INTEGER) AS rank
         FROM c QUALIFY rank <= 5),
       tot AS (
         SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
       vocab AS (
         SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM c),
       prior AS (
         SELECT lang, CAST(count(*) AS BIGINT) AS nd
         FROM documents GROUP BY 1),
       nd_all AS (
         SELECT CAST(count(*) AS BIGINT) AS nd_all FROM documents)
       SELECT t.lang, t.token, t.cnt, t.rank,
              CAST(t.cnt + 1 AS DOUBLE) / CAST(tt.tot + v.v AS DOUBLE)
                AS prob,
              CAST(p.nd AS DOUBLE) / CAST(na.nd_all AS DOUBLE) AS prior
       FROM top5 t
       JOIN tot tt ON t.lang = tt.lang
       JOIN prior p ON t.lang = p.lang
       CROSS JOIN vocab v CROSS JOIN nd_all na
       ORDER BY t.lang, t.rank"""

  // --- q180: BPE-style pair-merge vocabulary rounds ---------------------
  /** Two word-level BPE merge rounds over the corpus, then the top-15
    * token frequencies of the rewritten corpus (merged tokens carry an
    * internal space, which cannot collide with original tokens — they
    * were produced by splitting ON spaces).
    *
    * Per round: adjacent-pair counting explodes only pair INDICES
    * (sequence(1, len−1)), the argmax pair is a one-row broadcast, and
    * the rewrite is a per-element array expression — position i is
    * dropped when its left neighbour starts a merge, replaced by the
    * fused token when it starts one itself, kept otherwise. Excluding
    * self-pairs (a = b) makes match sites non-overlapping, so this
    * stateless per-position rule IS the greedy left-to-right merge.
    * All `element_at` calls are CASE-guarded in-bounds (ANSI-safe on
    * the Spark side; DuckDB list_extract is total).
    *
    * In a production vocab learner the rewritten corpus would be
    * persisted per round (the loop here recomputes round 1 inside round
    * 2's lineage — fine for 2 rounds, wasteful for 50); the per-round
    * dataflow is unchanged. */
  def q180BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))

    def topPair(d: DataFrame): DataFrame = d
      .filter(size(col("tk")) >= 2)
      .select(col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(element_at(col("tk"), col("i")).as("a"),
        element_at(col("tk"), col("i") + 1).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("a"), col("b")).limit(1)

    def applyMerge(d: DataFrame): DataFrame = d
      .crossJoin(broadcast(topPair(d)
        .select(col("a").as("__a"), col("b").as("__b"))))
      .select(col("doc_id"),
        filter(
          transform(col("tk"), (x, i) => {
            // i is 0-based; 1-based prev = tk[i], next = tk[i+2]
            val prev = when(i > 0, element_at(col("tk"), i))
            val next = when(i + 2 <= size(col("tk")),
              element_at(col("tk"), i + 2))
            when(prev === col("__a") && x === col("__b"), lit(null))
              .when(x === col("__a") && next === col("__b"),
                concat(col("__a"), lit(" "), col("__b")))
              .otherwise(x)
          }),
          y => y.isNotNull).as("tk"))

    val merged = applyMerge(applyMerge(docs))
    val top = merged.select(explode(col("tk")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(15)
    top.select(col("token"), col("cnt"),
        row_number().over(
          Window.orderBy(col("cnt").desc, col("token"))).as("rank"))
      .orderBy("rank")
  }

  val q180Sql: String =
    """WITH docs AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       p1 AS (
         SELECT tk[i] AS a, tk[i + 1] AS b
         FROM (SELECT tk, unnest(range(1, len(tk))) AS i
               FROM docs WHERE len(tk) >= 2)),
       c1 AS (
         SELECT a, b, count(*) AS c FROM p1 WHERE a <> b GROUP BY 1, 2),
       t1 AS (SELECT a, b FROM c1 ORDER BY c DESC, a, b LIMIT 1),
       m1 AS (
         SELECT doc_id,
                list_filter(list_transform(tk, (x, i) ->
                  CASE WHEN i > 1 AND tk[i - 1] = t1.a AND x = t1.b
                         THEN NULL
                       WHEN x = t1.a AND i + 1 <= len(tk)
                            AND tk[i + 1] = t1.b
                         THEN t1.a || ' ' || t1.b
                       ELSE x END),
                  y -> y IS NOT NULL) AS tk
         FROM docs CROSS JOIN t1),
       p2 AS (
         SELECT tk[i] AS a, tk[i + 1] AS b
         FROM (SELECT tk, unnest(range(1, len(tk))) AS i
               FROM m1 WHERE len(tk) >= 2)),
       c2 AS (
         SELECT a, b, count(*) AS c FROM p2 WHERE a <> b GROUP BY 1, 2),
       t2 AS (SELECT a, b FROM c2 ORDER BY c DESC, a, b LIMIT 1),
       m2 AS (
         SELECT doc_id,
                list_filter(list_transform(tk, (x, i) ->
                  CASE WHEN i > 1 AND tk[i - 1] = t2.a AND x = t2.b
                         THEN NULL
                       WHEN x = t2.a AND i + 1 <= len(tk)
                            AND tk[i + 1] = t2.b
                         THEN t2.a || ' ' || t2.b
                       ELSE x END),
                  y -> y IS NOT NULL) AS tk
         FROM m1 CROSS JOIN t2),
       f AS (SELECT unnest(tk) AS token FROM m2),
       g AS (
         SELECT token, CAST(count(*) AS BIGINT) AS cnt
         FROM f GROUP BY 1),
       top AS (SELECT token, cnt FROM g ORDER BY cnt DESC, token LIMIT 15)
       SELECT token, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, token)
                AS INTEGER) AS rank
       FROM top ORDER BY rank"""

  // --- q181: k-fold cross-validation by moment subtraction --------------
  /** 5-fold cross-validated OLS (price ~ quantity on lineitem) from ONE
    * corpus scan: fold membership is the deterministic 60-bit-hash
    * bucket of the row key (the q130 split discipline — no row migrates
    * between folds across rebuilds), per-fold DECIMAL(38,0) moments are
    * one aggregation, and fold f's TRAINING moments are total − fold —
    * exact decimal subtraction, so K leave-fold-out models cost one scan
    * plus K scalar solves instead of K scans. Validation MSE evaluates
    * the held-out fold through its own moments
    * (Σ(y−w0−w1x)² expands to a 6-term moment polynomial), so
    * evaluation ALSO never rescans. The whole thing shuffles 5 moment
    * rows. Derived stats follow q125's IEEE discipline: exact integers
    * until a fixed-order double expression, zero-variance guarded to
    * NULL on both sides. */
  def q181KfoldCv(s: SparkSession, dir: String): DataFrame = {
    val fold = pmod(graft.operators.Dedup.hash60(
      concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"))), lit(5L)).as("fold")
    val li = t(s, dir, "lineitem").select(fold,
      col("l_quantity").cast("long").cast(dec).as("x"),
      expr(s"CAST(CAST(round(l_extendedprice) AS BIGINT) AS $dec)")
        .as("y"))
    val perFold = li.groupBy("fold").agg(
      count(lit(1)).cast(dec).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val totals = perFold.agg(
      sum("n").as("tn"), sum("sx").as("tsx"), sum("sy").as("tsy"),
      sum("sxy").as("tsxy"), sum("sxx").as("tsxx"), sum("syy").as("tsyy"))
    val tr = perFold.crossJoin(broadcast(totals)).select(
      col("fold"),
      (col("tn") - col("n")).as("rn"),
      (col("tsx") - col("sx")).as("rsx"),
      (col("tsy") - col("sy")).as("rsy"),
      (col("tsxy") - col("sxy")).as("rsxy"),
      (col("tsxx") - col("sxx")).as("rsxx"),
      col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
    val d = tr.select(col("fold"),
      col("rn").cast("long").as("n_train"),
      col("n").cast("long").as("n_val"),
      (col("rn") * col("rsxy") - col("rsx") * col("rsy")).cast("double")
        .as("num"),
      (col("rn") * col("rsxx") - col("rsx") * col("rsx")).cast("double")
        .as("dxx"),
      col("rn").cast("double").as("rn_d"),
      col("rsx").cast("double").as("rsx_d"),
      col("rsy").cast("double").as("rsy_d"),
      col("n").cast("double").as("n_d"),
      col("sx").cast("double").as("sx_d"),
      col("sy").cast("double").as("sy_d"),
      col("sxy").cast("double").as("sxy_d"),
      col("sxx").cast("double").as("sxx_d"),
      col("syy").cast("double").as("syy_d"))
    val w1 = col("num") / col("dxx")
    val w0 = (col("rsy_d") - col("num") / col("dxx") * col("rsx_d")) /
      col("rn_d")
    val sse = col("syy_d") - lit(2.0) * w0 * col("sy_d") -
      lit(2.0) * w1 * col("sxy_d") + col("n_d") * w0 * w0 +
      lit(2.0) * w0 * w1 * col("sx_d") + w1 * w1 * col("sxx_d")
    d.select(col("fold"), col("n_train"), col("n_val"),
        when(col("dxx") > 0, w1).as("slope"),
        when(col("dxx") > 0, w0).as("intercept"),
        when(col("dxx") > 0 && col("n_d") > 0, sse / col("n_d"))
          .as("val_mse"))
      .orderBy("fold")
  }

  val q181Sql: String =
    """WITH li AS (
         SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                  CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 5
                  AS fold,
                CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS x,
                CAST(CAST(round(l_extendedprice) AS BIGINT) AS HUGEINT)
                  AS y
         FROM lineitem),
       pf AS (
         SELECT fold, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
                sum(y * y) AS syy
         FROM li GROUP BY 1),
       tot AS (
         SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
                sum(sxy) AS tsxy, sum(sxx) AS tsxx, sum(syy) AS tsyy
         FROM pf),
       tr AS (
         SELECT fold, tn - n AS rn, tsx - sx AS rsx, tsy - sy AS rsy,
                tsxy - sxy AS rsxy, tsxx - sxx AS rsxx,
                n, sx, sy, sxy, sxx, syy
         FROM pf CROSS JOIN tot),
       d AS (
         SELECT fold, CAST(rn AS BIGINT) AS n_train,
                CAST(n AS BIGINT) AS n_val,
                CAST(rn * rsxy - rsx * rsy AS DOUBLE) AS num,
                CAST(rn * rsxx - rsx * rsx AS DOUBLE) AS dxx,
                CAST(rn AS DOUBLE) AS rn_d, CAST(rsx AS DOUBLE) AS rsx_d,
                CAST(rsy AS DOUBLE) AS rsy_d, CAST(n AS DOUBLE) AS n_d,
                CAST(sx AS DOUBLE) AS sx_d, CAST(sy AS DOUBLE) AS sy_d,
                CAST(sxy AS DOUBLE) AS sxy_d,
                CAST(sxx AS DOUBLE) AS sxx_d,
                CAST(syy AS DOUBLE) AS syy_d
         FROM tr)
       SELECT fold, n_train, n_val,
              CASE WHEN dxx > 0 THEN num / dxx END AS slope,
              CASE WHEN dxx > 0 THEN
                (rsy_d - num / dxx * rsx_d) / rn_d END AS intercept,
              CASE WHEN dxx > 0 AND n_d > 0 THEN
                (syy_d - 2.0 * ((rsy_d - num / dxx * rsx_d) / rn_d)
                   * sy_d -
                 2.0 * (num / dxx) * sxy_d +
                 n_d * ((rsy_d - num / dxx * rsx_d) / rn_d)
                     * ((rsy_d - num / dxx * rsx_d) / rn_d) +
                 2.0 * ((rsy_d - num / dxx * rsx_d) / rn_d)
                     * (num / dxx) * sx_d +
                 (num / dxx) * (num / dxx) * sxx_d) / n_d END AS val_mse
       FROM d ORDER BY fold"""

  // --- q182: Gini token diversity (repetition filter) -------------------
  /** Per-document Gini impurity of the token distribution,
    * 1 − Σ(c_i/n)² = (n² − Σc_i²)/n² — the log-free diversity measure
    * (entropy's ln is not bit-identical across engines; Gini is exact
    * integers until ONE division). Low Gini = few tokens dominate =
    * the repetitive junk a pretraining corpus filter drops — the
    * distributional complement to q69's positional repetition gates.
    * Emits the 10 most repetitive documents.
    *
    * Plan shape: explode → (doc, token) count with map-side partial
    * agg → per-doc Σc² re-aggregation — two shuffles, both carrying
    * counts, never text; final top-k is TakeOrderedAndProject. */
  def q182TokenGini(s: SparkSession, dir: String): DataFrame = {
    val perTok = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    perTok.groupBy("doc_id")
      .agg(sum("c").as("n"), sum(col("c") * col("c")).as("sc2"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        when(col("n") > 0,
          (col("n") * col("n") - col("sc2")).cast("double") /
            (col("n") * col("n")).cast("double")).as("gini"))
      .orderBy(col("gini").asc_nulls_last, col("doc_id"))
      .limit(10)
  }

  val q182Sql: String =
    """WITH pt AS (
         SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY 1, 2),
       g AS (
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(sum(c * c) AS BIGINT) AS sc2
         FROM pt GROUP BY 1)
       SELECT doc_id, n_tokens,
              CASE WHEN n_tokens > 0 THEN
                CAST(n_tokens * n_tokens - sc2 AS DOUBLE) /
                CAST(n_tokens * n_tokens AS DOUBLE) END AS gini
       FROM g ORDER BY gini ASC NULLS LAST, doc_id LIMIT 10"""

  // --- q183: positional phrase search ----------------------------------
  /** Exact phrase query ("table part") through positional postings: the
    * corpus explodes to (doc, pos, token) but the phrase terms' filter
    * sits UNDER the shuffle, so only the two terms' postings ever move;
    * adjacency is an equi-join on (doc_id, pos + 1). This is the
    * serving-path query of a positional inverted index — against a
    * persisted index (q129's capped discipline plus a positions column)
    * the corpus scan disappears entirely; here it runs corpus-direct so
    * the oracle can replay it relationally. Top-10 docs by occurrence
    * count, integer throughout. */
  def q183PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val post = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val a = post.filter(col("tok") === "table")
      .select(col("doc_id"), col("pos"))
    val b = post.filter(col("tok") === "part")
      .select(col("doc_id").as("b_doc"), col("pos").as("b_pos"))
    a.join(b, col("doc_id") === col("b_doc") &&
        col("b_pos") === col("pos") + 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(10)
  }

  val q183Sql: String =
    """WITH post AS (
         SELECT doc_id,
                unnest(range(1, len(tk) + 1)) - 1 AS pos,
                unnest(tk) AS tok
         FROM (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents)),
       a AS (SELECT doc_id, pos FROM post WHERE tok = 'table'),
       b AS (SELECT doc_id AS b_doc, pos AS b_pos FROM post
             WHERE tok = 'part')
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
       FROM a JOIN b ON doc_id = b_doc AND b_pos = pos + 1
       GROUP BY 1 ORDER BY n_occurrences DESC, doc_id LIMIT 10"""

  // --- q185: Welch two-sample test from exact moments -------------------
  /** A/B experiment readout — Welch's unequal-variance t statistic and
    * Welch–Satterthwaite degrees of freedom between two user cohorts
    * (user_id parity), over cents-exact event values. ONE conditional-
    * aggregation pass accumulates both variants' (n, Σx, Σx²) as
    * DECIMAL(38,0); means, sample variances, t and df are then a fixed-
    * order IEEE expression on a one-row frame (sqrt is correctly
    * rounded, so the whole readout is bit-identical cross-engine — the
    * reason t/df are computed instead of a p-value, whose erf/gamma
    * tails are not). Degenerate cohorts (n ≤ 1, zero pooled variance)
    * guard to NULL on both sides.
    *
    * Scale shape: the statistic needs six numbers; the corpus is
    * scanned once, map-side partial aggregation reduces each partition
    * to one moment row, and nothing else moves. */
  def q185AbTest(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").filter(col("value").isNotNull)
      .select((col("user_id") % 2).as("v"),
        expr(s"CAST(CAST(round(value * 100) AS BIGINT) AS $dec)").as("c"))
    def side(p: Int, nm: String, s1: String, s2: String) = Seq(
      sum(when(col("v") === p, 1L).otherwise(0L)).cast(dec).as(nm),
      sum(when(col("v") === p, col("c")).otherwise(lit(0).cast(dec)))
        .as(s1),
      sum(when(col("v") === p, col("c") * col("c"))
        .otherwise(lit(0).cast(dec))).as(s2))
    val aggs = side(0, "na", "s1a", "s2a") ++ side(1, "nb", "s1b", "s2b")
    val m = ev.agg(aggs.head, aggs.tail: _*)
    val d = m.select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      col("na").cast("double").as("na_d"),
      col("nb").cast("double").as("nb_d"),
      col("s1a").cast("double").as("s1a_d"),
      col("s1b").cast("double").as("s1b_d"),
      (col("na") * col("s2a") - col("s1a") * col("s1a")).cast("double")
        .as("va_num"),
      (col("nb") * col("s2b") - col("s1b") * col("s1b")).cast("double")
        .as("vb_num"),
      (col("na") * (col("na") - 1)).cast("double").as("va_den"),
      (col("nb") * (col("nb") - 1)).cast("double").as("vb_den"))
    val varA = col("va_num") / col("va_den")
    val varB = col("vb_num") / col("vb_den")
    val seA = varA / col("na_d")
    val seB = varB / col("nb_d")
    val se2 = seA + seB
    val meanA = col("s1a_d") / col("na_d")
    val meanB = col("s1b_d") / col("nb_d")
    val tStat = (meanA - meanB) / sqrt(se2)
    val df = se2 * se2 /
      (seA * seA / (col("na_d") - 1.0) + seB * seB / (col("nb_d") - 1.0))
    val ok = col("n_a") > 1 && col("n_b") > 1
    d.select(col("n_a"), col("n_b"),
      when(ok, meanA).as("mean_a_cents"),
      when(ok, meanB).as("mean_b_cents"),
      when(ok && col("va_num") + col("vb_num") > 0, tStat).as("t_stat"),
      when(ok && col("va_num") > 0 && col("vb_num") > 0, df)
        .as("welch_df"))
  }

  val q185Sql: String =
    """WITH ev AS (
         SELECT user_id % 2 AS v,
                CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
         FROM events WHERE value IS NOT NULL),
       m AS (
         SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                  AS na,
                sum(CASE WHEN v = 0 THEN c ELSE 0 END) AS s1a,
                sum(CASE WHEN v = 0 THEN c * c ELSE 0 END) AS s2a,
                CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                  AS nb,
                sum(CASE WHEN v = 1 THEN c ELSE 0 END) AS s1b,
                sum(CASE WHEN v = 1 THEN c * c ELSE 0 END) AS s2b
         FROM ev),
       d AS (
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                CAST(na AS DOUBLE) AS na_d, CAST(nb AS DOUBLE) AS nb_d,
                CAST(s1a AS DOUBLE) AS s1a_d,
                CAST(s1b AS DOUBLE) AS s1b_d,
                CAST(na * s2a - s1a * s1a AS DOUBLE) AS va_num,
                CAST(nb * s2b - s1b * s1b AS DOUBLE) AS vb_num,
                CAST(na * (na - 1) AS DOUBLE) AS va_den,
                CAST(nb * (nb - 1) AS DOUBLE) AS vb_den
         FROM m)
       SELECT n_a, n_b,
              CASE WHEN n_a > 1 AND n_b > 1
                THEN s1a_d / na_d END AS mean_a_cents,
              CASE WHEN n_a > 1 AND n_b > 1
                THEN s1b_d / nb_d END AS mean_b_cents,
              CASE WHEN n_a > 1 AND n_b > 1 AND va_num + vb_num > 0 THEN
                (s1a_d / na_d - s1b_d / nb_d) /
                sqrt(va_num / va_den / na_d + vb_num / vb_den / nb_d)
                END AS t_stat,
              CASE WHEN n_a > 1 AND n_b > 1 AND va_num > 0 AND vb_num > 0
                THEN (va_num / va_den / na_d + vb_num / vb_den / nb_d) *
                     (va_num / va_den / na_d + vb_num / vb_den / nb_d) /
                     (va_num / va_den / na_d * (va_num / va_den / na_d) /
                        (na_d - 1.0) +
                      vb_num / vb_den / nb_d * (vb_num / vb_den / nb_d) /
                        (nb_d - 1.0))
                END AS welch_df
       FROM d"""

  // --- q187: cross-source duplication overlap matrix --------------------
  /** Pairwise exact-duplicate overlap between corpus SOURCES — the
    * corpus-intelligence report that decides which feeds are redundant
    * before mixing weights are chosen: for every source pair, how many
    * distinct texts appear in both, and the Jaccard overlap of their
    * text sets (one division of exact integers). Texts are keyed by
    * their 60-bit content hash ([[graft.operators.Dedup.hash60]]), so
    * the self-join carries (long, source) rows, never text — the q26
    * shuffle-volume discipline. Per-source distinct totals ride a tiny
    * broadcast join; the hash self-join is the only corpus-sized
    * shuffle, and both sides arrive already distinct. */
  def q187SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(graft.operators.Dedup.hash60(col("text")).as("h"),
        col("source"))
      .distinct()
    val totals = d.groupBy("source").agg(count(lit(1)).as("tot"))
    val pairs = d.join(
        d.select(col("h"), col("source").as("source_b")), Seq("h"))
      .filter(col("source") < col("source_b"))
      .groupBy(col("source").as("src_a"), col("source_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(totals.select(col("source").as("src_a"),
        col("tot").as("n_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"),
        col("tot").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  val q187Sql: String =
    """WITH d AS (
         SELECT DISTINCT
                ('0x' || substr(md5(text), 1, 15))::BIGINT AS h, source
         FROM documents),
       tot AS (
         SELECT source, CAST(count(*) AS BIGINT) AS tot
         FROM d GROUP BY 1),
       pairs AS (
         SELECT a.source AS src_a, b.source AS src_b,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
         GROUP BY 1, 2)
       SELECT src_a, src_b, n_shared, ta.tot AS n_a, tb.tot AS n_b,
              CAST(n_shared AS DOUBLE) /
                CAST(ta.tot + tb.tot - n_shared AS DOUBLE) AS jaccard
       FROM pairs
       JOIN tot ta ON ta.source = src_a
       JOIN tot tb ON tb.source = src_b
       ORDER BY src_a, src_b"""

  // --- q188: retrieval evaluation (MRR / precision@k inputs) ------------
  /** Ranking-quality readout for the ANN index: ground truth = exact
    * brute-force cosine top-3 per query (self excluded), system = the
    * q30 hyperplane-LSH probe (self excluded). Per query: how many of
    * the true top-3 the index returned, the rank of the first true hit,
    * its reciprocal (ONE division), and precision@3 (ONE division).
    * Deliberately NO mean-over-queries double column: Σ(1/rankᵢ) is
    * accumulation-order-dependent across rows, so the aggregate the
    * harness can hash is the per-query frame itself (integer columns
    * aggregate exactly downstream when a scalar MRR is wanted).
    * Complements q103's recall harness with the rank-sensitive tier.
    *
    * Scale shape: the exact side is the q29 bounded-query-set cross
    * join (|Q| is the small side by construction); the LSH side probes
    * buckets only. Both rankings are k-bounded before the eval join. */
  def q188RetrievalEval(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val dims = emb.select(size(col("embedding")).as("d"))
      .filter(col("d") > 0).limit(1).head().getInt(0)
    val w = Similarity.planeWeightsLocal(6, dims)
    def prep(df: DataFrame, id: String, vec: String, norm: String) =
      df.select(col("vec_id").as(id),
          Similarity.quantize(col("embedding")).as(vec))
        .select(col(id), col(vec),
          Similarity.dotQ(col(vec), col(vec)).as(norm))
    val q = prep(emb.filter(col("vec_id") < 10), "qid", "qe", "qn")
    val d = prep(emb, "did", "de", "dn")
    val rankW = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("did").asc)
    def score(j: DataFrame) = j
      .filter(col("qid") =!= col("did"))
      .select(col("qid"), col("did"),
        Similarity.cosineFrom(Similarity.dotQ(col("qe"), col("de")),
          col("qn"), col("dn")).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= 3)
    val truth = score(q.crossJoin(d)).select(col("qid"), col("did"))
    val sys = score(
        q.withColumn("bucket", Similarity.bucketOf(col("qe"), w))
          .join(d.withColumn("bucket",
            Similarity.bucketOf(col("de"), w)), "bucket"))
      .select(col("qid"), col("did"), col("rank"))
    truth.join(sys, Seq("qid", "did"), "left_outer")
      .groupBy("qid")
      .agg(sum(when(col("rank").isNotNull, 1L).otherwise(0L))
          .as("n_hits"),
        min("rank").as("first_rel_rank"))
      .select(col("qid"), col("n_hits"), col("first_rel_rank"),
        (lit(1.0) / col("first_rel_rank").cast("double")).as("rr"),
        (col("n_hits").cast("double") / 3.0).as("prec_at_3"))
      .orderBy("qid")
  }

  val q188Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                 for x in embedding] AS e
         FROM embeddings),
       n AS (SELECT vec_id, e, list_sum([y * y for y in e]) AS nn FROM v),
       truth AS (
         SELECT qid, did FROM (
           SELECT q.vec_id AS qid, d.vec_id AS did,
                  CAST(list_sum([q.e[i] * d.e[i]
                    for i in generate_series(1, len(q.e))]) AS DOUBLE) /
                    (sqrt(CAST(q.nn AS DOUBLE)) *
                     sqrt(CAST(d.nn AS DOUBLE))) AS cosine
           FROM n q CROSS JOIN n d
           WHERE q.vec_id < 10 AND q.vec_id <> d.vec_id)
         QUALIFY row_number() OVER (PARTITION BY qid
           ORDER BY cosine DESC, did ASC) <= 3),
       proj AS (
         SELECT v.vec_id, pl.p,
                list_sum([v.e[i] *
                  (2 * instr('0123456789abcdef',
                     substr(md5(pl.p || '-' || (i - 1)), 1, 1)) - 17)
                  for i in generate_series(1, len(v.e))]) AS proj
         FROM v CROSS JOIN (SELECT unnest(range(0, 6)) AS p) pl),
       buck AS (
         SELECT vec_id,
                CAST(sum(CASE WHEN proj > 0
                              THEN CAST(pow(2, p) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY 1),
       sys AS (
         SELECT qid, did,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, did ASC) AS INTEGER) AS rank
         FROM (
           SELECT bq.vec_id AS qid, bd.vec_id AS did,
                  CAST(list_sum([qn.e[i] * dn.e[i]
                    for i in generate_series(1, len(qn.e))]) AS DOUBLE) /
                    (sqrt(CAST(qn.nn AS DOUBLE)) *
                     sqrt(CAST(dn.nn AS DOUBLE))) AS cosine
           FROM buck bq
           JOIN buck bd ON bq.bucket = bd.bucket
                       AND bq.vec_id <> bd.vec_id
           JOIN n qn ON qn.vec_id = bq.vec_id
           JOIN n dn ON dn.vec_id = bd.vec_id
           WHERE bq.vec_id < 10)
         QUALIFY rank <= 3)
       SELECT t.qid,
              CAST(sum(CASE WHEN s.rank IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
              min(s.rank) AS first_rel_rank,
              1.0 / CAST(min(s.rank) AS DOUBLE) AS rr,
              CAST(sum(CASE WHEN s.rank IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / 3.0 AS prec_at_3
       FROM truth t
       LEFT JOIN sys s ON t.qid = s.qid AND t.did = s.did
       GROUP BY t.qid ORDER BY t.qid"""

  // --- q189: embedding centroid drift between cohorts -------------------
  /** Embedding-monitoring readout: L2 distance between the mean vectors
    * of two cohorts (label 0 vs label 1) — the day-over-day /
    * cohort-over-cohort drift alarm for an embedding pipeline. Exact to
    * the last step: per-dimension quantized sums accumulate as
    * DECIMAL(38,0), the mean difference is cleared of divisions by
    * scaling with n_a·n_b (diffᵈ = n_b·Σaᵈ − n_a·Σbᵈ, exact), the
    * squared distance Σ diffᵈ² stays decimal-exact, and ONE
    * cast+sqrt+division chain produces the drift in quantized units.
    *
    * Scale shape: posexplode to (dim, label, value) longs, partial
    * map-side aggregation reduces every partition to ≤ dims·2 cells;
    * the shuffle carries dims·2 rows regardless of corpus size. */
  def q189EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val cells = t(s, dir, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("label"),
        posexplode(Similarity.quantize(col("embedding")))
          .as(Seq("dim", "v")))
      .groupBy("dim").agg(
        sum(when(col("label") === 0, col("v").cast(dec))
          .otherwise(lit(0).cast(dec))).as("sa"),
        sum(when(col("label") === 1, col("v").cast(dec))
          .otherwise(lit(0).cast(dec))).as("sb"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).cast(dec)
          .as("cna"),
        sum(when(col("label") === 1, 1L).otherwise(0L)).cast(dec)
          .as("cnb"))
    // every dim sees every row: cna/cnb are the cohort sizes, constant
    // across dims — max() is just the reduce that carries them along
    val m = cells.agg(
      max("cna").as("na"), max("cnb").as("nb"),
      sum((col("cnb") * col("sa") - col("cna") * col("sb")) *
        (col("cnb") * col("sa") - col("cna") * col("sb"))).as("d2"))
    m.select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      when(col("na") > 0 && col("nb") > 0,
        sqrt(col("d2").cast("double")) /
          (col("na").cast("double") * col("nb").cast("double")))
        .as("l2_drift_q"))
  }

  val q189Sql: String =
    """WITH cells AS (
         SELECT dim,
                sum(CASE WHEN label = 0 THEN v ELSE 0 END) AS sa,
                sum(CASE WHEN label = 1 THEN v ELSE 0 END) AS sb,
                CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS cna,
                CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS cnb
         FROM (
           SELECT label,
                  unnest(range(0, len(embedding))) AS dim,
                  unnest([CAST(round(CAST(x AS DOUBLE) * 1000000.0)
                    AS HUGEINT) for x in embedding]) AS v
           FROM embeddings WHERE label IN (0, 1))
         GROUP BY 1),
       m AS (
         SELECT max(cna) AS na, max(cnb) AS nb,
                sum((cnb * sa - cna * sb) * (cnb * sa - cna * sb)) AS d2
         FROM cells)
       SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              CASE WHEN na > 0 AND nb > 0 THEN
                sqrt(CAST(d2 AS DOUBLE)) /
                  (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END
                AS l2_drift_q
       FROM m"""

  // --- q190: language-ID heuristic evaluation ---------------------------
  /** Multiclass evaluation of q31's language-ID heuristic against the
    * labeled corpus: per true class, support, predicted count, true
    * positives, and precision/recall as guarded single divisions —
    * the model-eval tier above q149's binary confusion matrix. The
    * confusion counting is ONE (lang, pred) aggregation; per-class
    * rows derive from it with broadcast-sized joins. */
  def q190LangidEval(s: SparkSession, dir: String): DataFrame = {
    val pred = t(s, dir, "documents")
      .select(col("lang"), graft.functions.TextFunctions
        .langId(col("text")).as("pred"))
    val conf = pred.groupBy("lang", "pred").agg(count(lit(1)).as("c"))
    val nTrue = conf.groupBy("lang").agg(sum("c").as("n_true"))
    val nPred = conf.groupBy(col("pred").as("lang"))
      .agg(sum("c").as("n_pred"))
    val tp = conf.filter(col("lang") === col("pred"))
      .select(col("lang"), col("c").as("tp"))
    nTrue
      .join(broadcast(nPred), Seq("lang"), "left_outer")
      .join(broadcast(tp), Seq("lang"), "left_outer")
      .select(col("lang"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("lang"), col("n_true"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0,
          col("tp").cast("double") / col("n_pred").cast("double"))
          .as("precision"),
        when(col("n_true") > 0,
          col("tp").cast("double") / col("n_true").cast("double"))
          .as("recall"))
      .orderBy("lang")
  }

  val q190Sql: String =
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
       g AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS gmax FROM s),
       p AS (
         SELECT lang,
           CASE WHEN zh_n > 0 THEN 'zh'
                WHEN gmax = 0 THEN 'unknown'
                WHEN s_en = gmax THEN 'en'
                WHEN s_de = gmax THEN 'de'
                WHEN s_fr = gmax THEN 'fr'
                WHEN s_es = gmax THEN 'es'
                ELSE 'unknown' END AS pred
         FROM g),
       conf AS (
         SELECT lang, pred, CAST(count(*) AS BIGINT) AS c
         FROM p GROUP BY 1, 2),
       nt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_true
              FROM conf GROUP BY 1),
       np AS (SELECT pred AS lang, CAST(sum(c) AS BIGINT) AS n_pred
              FROM conf GROUP BY 1),
       tp AS (SELECT lang, c AS tp FROM conf WHERE lang = pred)
       SELECT nt.lang, nt.n_true,
              coalesce(np.n_pred, 0) AS n_pred,
              coalesce(tp.tp, 0) AS tp,
              CASE WHEN coalesce(np.n_pred, 0) > 0 THEN
                CAST(coalesce(tp.tp, 0) AS DOUBLE) /
                CAST(coalesce(np.n_pred, 0) AS DOUBLE) END AS precision,
              CASE WHEN nt.n_true > 0 THEN
                CAST(coalesce(tp.tp, 0) AS DOUBLE) /
                CAST(nt.n_true AS DOUBLE) END AS recall
       FROM nt
       LEFT JOIN np ON np.lang = nt.lang
       LEFT JOIN tp ON tp.lang = nt.lang
       ORDER BY nt.lang"""

  // --- q191: distance-weighted skip-gram co-occurrence ------------------
  /** GloVe-style co-occurrence accumulation (Pennington et al., EMNLP
    * 2014): ordered (word, context) pairs within a ±2 window, weighted
    * 1/distance. The weights are dyadic rationals (1.0, 0.5), so the
    * double sum is EXACT and order-independent — the one weighting
    * scheme where a float sum is portable across engines. Top-20 pairs
    * by weighted count, lexicographic tie-break.
    *
    * Scale shape: two index explodes (offset 1, offset 2) union, one
    * (w1, w2) count shuffle with map-side partial agg (vocab²-bounded,
    * not corpus-bounded), TakeOrderedAndProject for the top-k. At full
    * corpus scale this is the input matrix builder for word-vector
    * training — the downstream factorization consumes exactly these
    * rows. */
  def q191Cooccurrence(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(split(col("text"), " ").as("tk"))
    def offs(o: Int, wt: Double): DataFrame = docs
      .filter(size(col("tk")) > o)
      .select(col("tk"),
        explode(sequence(lit(1), size(col("tk")) - o)).as("i"))
      .select(element_at(col("tk"), col("i")).as("w1"),
        element_at(col("tk"), col("i") + o).as("w2"),
        lit(wt).as("wt"))
    offs(1, 1.0).unionAll(offs(2, 0.5))
      .groupBy("w1", "w2")
      .agg(sum("wt").as("weight"), count(lit(1)).as("n_pairs"))
      .orderBy(col("weight").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val q191Sql: String =
    """WITH d AS (
         SELECT string_split(text, ' ') AS tk FROM documents),
       p1 AS (
         SELECT tk[i] AS w1, tk[i + 1] AS w2,
                CAST(1.0 AS DOUBLE) AS wt
         FROM (SELECT tk, unnest(range(1, len(tk))) AS i
               FROM d WHERE len(tk) > 1)),
       p2 AS (
         SELECT tk[i] AS w1, tk[i + 2] AS w2,
                CAST(0.5 AS DOUBLE) AS wt
         FROM (SELECT tk, unnest(range(1, len(tk) - 1)) AS i
               FROM d WHERE len(tk) > 2)),
       u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
       SELECT w1, w2, sum(wt) AS weight,
              CAST(count(*) AS BIGINT) AS n_pairs
       FROM u GROUP BY 1, 2
       ORDER BY weight DESC, w1, w2 LIMIT 20"""

  // --- q200: sparse TF cosine similarity (inverted-index join) ----------
  /** Document similarity WITHOUT embeddings: cosine over sparse term-
    * count vectors, computed through an inverted-index self-join — the
    * sparse complement to the dense vector family (q29/q55). Terms with
    * df > min(|D|/2, 1000) are dropped from the vector space first (the
    * capped-postings discipline of q26/q129: a stop-word's df² pair
    * fan-out is the quadratic term, and it carries no discriminative
    * signal). BOTH bounds are load-bearing: |D|/2 drops stop-words at
    * small corpora, and the ABSOLUTE cap is what bounds Σdf² when the
    * corpus grows against a fixed vocabulary — with only the fractional
    * cap, df grows ∝ |D| and the fan-out ∝ |D|² (the first sf1 probe of
    * this query ran half an hour before being killed; capped, the
    * fan-out is ≤ vocab·cap², corpus-size-independent). The
    * pruned space is the DEFINITION of the vectors here, mirrored in
    * the oracle, so the similarity is exact over that space. Dot
    * products and norms stay integers; cosine is the vector family's
    * one fixed-order IEEE expression. Top-10 pairs.
    *
    * Scale shape: Σ_t df_t² partial products with df capped — never
    * |D|²; the per-pair reduce has map-side partial aggregation. */
  def q200SparseCosine(s: SparkSession, dir: String): DataFrame = {
    val tc = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val nDocs = tc.select("doc_id").distinct().count()
    val kept = tc.join(
      broadcast(tc.groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df") <= least(lit(nDocs / 2), lit(1000L)))
        .select("tok")),
      Seq("tok"))
    val norms = kept.groupBy("doc_id")
      .agg(sum(col("c") * col("c")).as("n2"))
    val dots = kept.select(col("tok"), col("doc_id").as("d1"),
        col("c").as("c1"))
      .join(kept.select(col("tok"), col("doc_id").as("d2"),
        col("c").as("c2")), Seq("tok"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(sum(col("c1") * col("c2")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("d1"), col("n2").as("n2a")),
        Seq("d1"))
      .join(norms.select(col("doc_id").as("d2"), col("n2").as("n2b")),
        Seq("d2"))
      .select(col("d1"), col("d2"),
        (col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) *
            sqrt(col("n2b").cast("double")))).as("cosine"))
      .orderBy(col("cosine").desc, col("d1"), col("d2"))
      .limit(10)
  }

  val q200Sql: String =
    """WITH tc AS (
         SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY 1, 2),
       nd AS (SELECT count(DISTINCT doc_id) AS n FROM tc),
       keep AS (
         SELECT tok FROM tc CROSS JOIN nd
         GROUP BY tok, nd.n
         HAVING count(*) <= least(n // 2, 1000)),
       k AS (SELECT tc.* FROM tc JOIN keep USING (tok)),
       norms AS (
         SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2
         FROM k GROUP BY 1),
       dots AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                CAST(sum(a.c * b.c) AS BIGINT) AS dot
         FROM k a JOIN k b ON a.tok = b.tok AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT d1, d2,
              CAST(dot AS DOUBLE) /
                (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                AS cosine
       FROM dots
       JOIN norms na ON na.doc_id = d1
       JOIN norms nb ON nb.doc_id = d2
       ORDER BY cosine DESC, d1, d2 LIMIT 10"""

  // --- q201: MinHash estimator calibration ------------------------------
  /** Closes the eval loop on the dedup estimators: for every LSH-banded
    * candidate pair (q27's pipeline, 16 perms × 4-row bands over the
    * planted near-dup corpus), the signature-estimated Jaccard NEXT TO
    * the exact shingle-set Jaccard and the absolute error — both sides
    * deterministic (the estimate is a pure function of the md5-derived
    * permutations both engines replicate), so the whole calibration
    * table hash-matches, not just a bound. Exact Jaccard = |∩|/|∪| of
    * the 60-bit shingle-hash sets, ONE division.
    *
    * Scale shape: candidates come from banding (never all-pairs); the
    * exact-verify join touches only candidate pairs' postings — the
    * same candidate-then-verify shape as q55. */
  def q201MinhashCalibration(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val corpus = PipelineQueries.nearDupCorpus(t(s, dir, "documents"))
    val cand = Dedup.minHashCandidates(corpus, "doc_id", "text",
      n = 3, numPerm = 16, rowsPerBand = 4)
    val sh = Dedup.docShingles(corpus, "doc_id", "text", 3).distinct()
    val sizes = sh.groupBy("sid").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("sid").as("id_a"), col("h")), Seq("id_a"))
      .join(sh.select(col("sid").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("ni"))
    cand
      .join(inter, Seq("id_a", "id_b"), "left_outer")
      .join(sizes.select(col("sid").as("id_a"), col("sz").as("sza")),
        Seq("id_a"))
      .join(sizes.select(col("sid").as("id_b"), col("sz").as("szb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        (coalesce(col("ni"), lit(0L)).cast("double") /
          (col("sza") + col("szb") - coalesce(col("ni"), lit(0L)))
            .cast("double")).as("exact_jaccard"))
      .select(col("id_a"), col("id_b"), col("est_jaccard"),
        col("exact_jaccard"),
        abs(col("est_jaccard") - col("exact_jaccard")).as("abs_err"))
      .orderBy("id_a", "id_b")
  }

  val q201Sql: String = {
    val corpusSql =
      """SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id,
                substr(text, instr(text, ' ') + 1) AS text FROM documents"""
    s"""WITH corpus AS ($corpusSql),
       toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
       sh AS (
         SELECT DISTINCT doc_id AS sid,
                unnest([('0x' ||
                         substr(md5(array_to_string(tk[i:i+2], ' ')), 1, 15)
                        )::BIGINT
                        for i in range(1, len(tk) - 1)]) AS h
         FROM toks WHERE len(tk) >= 3),
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
       sizes AS (SELECT sid, CAST(count(*) AS BIGINT) AS sz
                 FROM sh GROUP BY 1),
       inter AS (
         SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS ni
         FROM cand c
         JOIN sh a ON a.sid = c.id_a
         JOIN sh b ON b.sid = c.id_b AND b.h = a.h
         GROUP BY 1, 2)
       SELECT e.id_a, e.id_b, e.est_jaccard,
              CAST(coalesce(i.ni, 0) AS DOUBLE) /
                CAST(sa.sz + sb.sz - coalesce(i.ni, 0) AS DOUBLE)
                AS exact_jaccard,
              abs(e.est_jaccard -
                  CAST(coalesce(i.ni, 0) AS DOUBLE) /
                  CAST(sa.sz + sb.sz - coalesce(i.ni, 0) AS DOUBLE))
                AS abs_err
       FROM est e
       LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
       JOIN sizes sa ON sa.sid = e.id_a
       JOIN sizes sb ON sb.sid = e.id_b
       ORDER BY e.id_a, e.id_b"""
  }

  // --- q202: character-class script-mix census --------------------------
  /** Corpus-level script/character-class composition per language label
    * — the mixed-script/obfuscation signal a pretraining filter reads
    * (unexpected digit or punctuation density, CJK bleed into a Latin
    * slice). Per lang: exact integer totals of latin / digit /
    * whitespace / CJK / other characters and each class's fraction of
    * the total (single divisions). One regex-count pass, one
    * |langs|-row aggregation — zero joins. */
  def q202ScriptMix(s: SparkSession, dir: String): DataFrame = {
    def cls(re: String): Column =
      graft.functions.TextFunctions.countMatches(col("text"), re)
    val per = t(s, dir, "documents").select(col("lang"),
      length(col("text")).as("total"),
      cls("[A-Za-z]").as("latin"),
      cls("[0-9]").as("digit"),
      cls("\\s").as("ws"),
      cls("[\\x{4e00}-\\x{9fff}]").as("cjk"))
    per.groupBy("lang")
      .agg(sum("total").as("n_chars"), sum("latin").as("latin"),
        sum("digit").as("digit"), sum("ws").as("ws"),
        sum("cjk").as("cjk"))
      .select(col("lang"), col("n_chars"),
        (col("latin").cast("double") / col("n_chars").cast("double"))
          .as("latin_frac"),
        (col("digit").cast("double") / col("n_chars").cast("double"))
          .as("digit_frac"),
        (col("ws").cast("double") / col("n_chars").cast("double"))
          .as("ws_frac"),
        (col("cjk").cast("double") / col("n_chars").cast("double"))
          .as("cjk_frac"))
      .orderBy("lang")
  }

  val q202Sql: String =
    """WITH per AS (
         SELECT lang, CAST(length(text) AS BIGINT) AS total,
                CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
                  AS latin,
                CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                  AS digit,
                CAST(len(regexp_extract_all(text, '\s')) AS BIGINT)
                  AS ws,
                CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
                  AS BIGINT) AS cjk
         FROM documents),
       g AS (
         SELECT lang, CAST(sum(total) AS BIGINT) AS n_chars,
                CAST(sum(latin) AS BIGINT) AS latin,
                CAST(sum(digit) AS BIGINT) AS digit,
                CAST(sum(ws) AS BIGINT) AS ws,
                CAST(sum(cjk) AS BIGINT) AS cjk
         FROM per GROUP BY 1)
       SELECT lang, n_chars,
              CAST(latin AS DOUBLE) / CAST(n_chars AS DOUBLE)
                AS latin_frac,
              CAST(digit AS DOUBLE) / CAST(n_chars AS DOUBLE)
                AS digit_frac,
              CAST(ws AS DOUBLE) / CAST(n_chars AS DOUBLE) AS ws_frac,
              CAST(cjk AS DOUBLE) / CAST(n_chars AS DOUBLE) AS cjk_frac
       FROM g ORDER BY lang"""

  // --- q203: time-weighted average (TWAP) -------------------------------
  /** Per-user time-weighted average event value — the metric that is
    * CORRECT for irregularly-sampled series where the plain mean
    * over-weights bursts (the finance TWAP / monitoring
    * time-in-state readout). Each event's value holds until the user's
    * next event; weights are exact integer microsecond gaps, the
    * accumulator is DECIMAL(38,0) (cents × µs reaches 10¹⁸ fast), and
    * the average is ONE division. Users with a single event (no
    * duration) guard to NULL on both sides. One window (lead) + one
    * aggregation. */
  def q203Twap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = t(s, dir, "events").filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(col("user_id"), col("c").cast(dec).as("c"),
        (unix_micros(col("next_ts")) - unix_micros(col("ts")))
          .cast(dec).as("dt"))
    ev.groupBy("user_id")
      .agg(sum(col("c") * col("dt")).as("num"), sum(col("dt")).as("den"),
        count(lit(1)).cast("long").as("n_intervals"))
      .select(col("user_id"), col("n_intervals"),
        when(col("den") > 0,
          col("num").cast("double") / col("den").cast("double"))
          .as("twap_cents"))
      .orderBy("user_id")
  }

  val q203Sql: String =
    """WITH ev AS (
         SELECT user_id, ts, event_id,
                CAST(round(value * 100) AS BIGINT) AS c,
                lead(ts) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS next_ts
         FROM events WHERE value IS NOT NULL),
       iv AS (
         SELECT user_id, CAST(c AS HUGEINT) AS c,
                CAST(epoch_us(next_ts) - epoch_us(ts) AS HUGEINT) AS dt
         FROM ev WHERE next_ts IS NOT NULL),
       g AS (
         SELECT user_id, sum(c * dt) AS num, sum(dt) AS den,
                CAST(count(*) AS BIGINT) AS n_intervals
         FROM iv GROUP BY 1)
       SELECT user_id, n_intervals,
              CASE WHEN den > 0 THEN
                CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
                AS twap_cents
       FROM g ORDER BY user_id"""

  // --- q246: Cohen's kappa inter-annotator agreement --------------------
  /** Chance-corrected agreement (Cohen 1960) between two labelers of
    * the corpus — the labeled-data QA gate a raw percent-agreement
    * (q190's accuracy) overstates whenever one class dominates.
    * Annotator A = the stored `lang` label, annotator B = the q31
    * stopword-profile heuristic; κ = (p_o − p_e)/(1 − p_e) computed
    * from EXACT integers — N·Σ_k agree_k − Σ_k rowₖ·colₖ over
    * N² − Σ_k rowₖ·colₖ — with ONE guarded double division at the
    * end, so both engines divide the same two BIGINTs (the
    * q125/q149 degenerate-case discipline; denominator 0 ⇔ chance
    * agreement is 1, κ undefined → NULL).
    *
    * Shape: one (lang, pred) confusion aggregation feeds the agree
    * total and both marginals; the three consumers share the
    * confusion exchange via ReuseExchange (the q190 pattern), the
    * marginal product join is over ≤|classes|² rows — nothing after
    * the first aggregation is data-sized. */
  def q246CohensKappa(s: SparkSession, dir: String): DataFrame = {
    val pred = t(s, dir, "documents")
      .select(col("lang"), graft.functions.TextFunctions
        .langId(col("text")).as("pred"))
    val conf = pred.groupBy("lang", "pred").agg(count(lit(1)).as("c"))
    val totals = conf.agg(sum("c").cast("long").as("n"),
      coalesce(sum(when(col("lang") === col("pred"), col("c"))), lit(0L))
        .cast("long").as("n_agree"))
    val pe = conf.groupBy("lang").agg(sum("c").as("n_true"))
      .join(conf.groupBy(col("pred").as("lang"))
        .agg(sum("c").as("n_pred")), "lang")
      .agg(coalesce(sum(col("n_true") * col("n_pred")), lit(0L))
        .cast("long").as("pe_num"))
    totals.crossJoin(pe)
      .select(col("n"), col("n_agree"), col("pe_num"),
        when(col("n") * col("n") =!= col("pe_num"),
          (col("n") * col("n_agree") - col("pe_num")).cast("double") /
            (col("n") * col("n") - col("pe_num")).cast("double"))
          .as("kappa"))
  }

  val q246Sql: String =
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
       g AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS gmax FROM s),
       p AS (
         SELECT lang,
           CASE WHEN zh_n > 0 THEN 'zh'
                WHEN gmax = 0 THEN 'unknown'
                WHEN s_en = gmax THEN 'en'
                WHEN s_de = gmax THEN 'de'
                WHEN s_fr = gmax THEN 'fr'
                WHEN s_es = gmax THEN 'es'
                ELSE 'unknown' END AS pred
         FROM g),
       conf AS (
         SELECT lang, pred, CAST(count(*) AS BIGINT) AS c
         FROM p GROUP BY 1, 2),
       tot AS (
         SELECT CAST(sum(c) AS BIGINT) AS n,
                CAST(coalesce(sum(CASE WHEN lang = pred THEN c END), 0)
                  AS BIGINT) AS n_agree
         FROM conf),
       pe AS (
         SELECT CAST(coalesce(sum(n_true * n_pred), 0) AS BIGINT)
                  AS pe_num
         FROM (SELECT lang, sum(c) AS n_true FROM conf GROUP BY 1) a
         JOIN (SELECT pred AS lang, sum(c) AS n_pred FROM conf
               GROUP BY 1) b USING (lang))
       SELECT n, n_agree, pe_num,
              CASE WHEN n * n <> pe_num THEN
                CAST(n * n_agree - pe_num AS DOUBLE) /
                CAST(n * n - pe_num AS DOUBLE) END AS kappa
       FROM tot, pe"""

  val all: Map[String, Q] = Map(
    "q176_rrf_fusion" -> q176RrfFusion _,
    "q177_gd_training" -> q177GdTraining _,
    "q178_naive_bayes" -> q178NaiveBayes _,
    "q180_bpe_merges" -> q180BpeMerges _,
    "q181_kfold_cv" -> q181KfoldCv _,
    "q182_token_gini" -> q182TokenGini _,
    "q183_phrase_search" -> q183PhraseSearch _,
    "q185_ab_test" -> q185AbTest _,
    "q187_source_overlap" -> q187SourceOverlap _,
    "q188_retrieval_eval" -> q188RetrievalEval _,
    "q189_embedding_drift" -> q189EmbeddingDrift _,
    "q190_langid_eval" -> q190LangidEval _,
    "q191_cooccurrence" -> q191Cooccurrence _,
    "q200_sparse_cosine" -> q200SparseCosine _,
    "q201_minhash_calibration" -> q201MinhashCalibration _,
    "q202_script_mix" -> q202ScriptMix _,
    "q203_twap" -> q203Twap _,
    "q246_cohens_kappa" -> q246CohensKappa _,
  )

  val oracles: Map[String, String] = Map(
    "q176_rrf_fusion" -> q176Sql,
    "q177_gd_training" -> q177Sql,
    "q178_naive_bayes" -> q178Sql,
    "q180_bpe_merges" -> q180Sql,
    "q181_kfold_cv" -> q181Sql,
    "q182_token_gini" -> q182Sql,
    "q183_phrase_search" -> q183Sql,
    "q185_ab_test" -> q185Sql,
    "q187_source_overlap" -> q187Sql,
    "q188_retrieval_eval" -> q188Sql,
    "q189_embedding_drift" -> q189Sql,
    "q190_langid_eval" -> q190Sql,
    "q191_cooccurrence" -> q191Sql,
    "q200_sparse_cosine" -> q200Sql,
    "q201_minhash_calibration" -> q201Sql,
    "q202_script_mix" -> q202Sql,
    "q203_twap" -> q203Sql,
    "q246_cohens_kappa" -> q246Sql,
  )
}
