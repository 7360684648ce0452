package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-statistics and physical-layout operators whose POINT is the
  * 100 TB plan shape, oracle-gated like everything else:
  *
  *   - q125: per-group OLS regression from exact integer moments — the
  *     q99 exact-moment discipline extended to slope/intercept/R², with
  *     the moment products carried in DECIMAL(38,0)/HUGEINT because
  *     n·Σy² exceeds int64 long before a group is "big" (≈2·10⁵ rows of
  *     10⁵-scale y already overflows — the bound q99's scaladoc
  *     documents is hit here, so the DECIMAL escape hatch it prescribes
  *     is exercised for real);
  *   - q126: corpus drift between two document slices as total-variation
  *     distance — TVD = Σ|cₐ·t_b − c_b·tₐ| / (2·tₐ·t_b) stays in EXACT
  *     integer arithmetic until one final division, so no log/float-sum
  *     cross-engine hazard exists (the reason TVD is chosen over KL:
  *     ln() is not bit-identical across engines, integer ratios are);
  *   - q127: degree assortativity of the part co-occurrence graph —
  *     Pearson correlation of endpoint degrees over directed edge
  *     instances, again exact integer moments; degrees are integers, so
  *     the whole computation shares q99's bit-identity argument;
  *   - q128: bucketed co-located join — both sides written
  *     `bucketBy(16, key)` with one file per bucket, joined and then
  *     aggregated ON THE BUCKET KEY: scan → join → partial agg with ZERO
  *     shuffle exchanges (ScaleFeaturesSpec pins the exchange-free plan).
  *     This is THE canonical 100 TB technique the surface still lacked:
  *     a fact-fact join that never moves either table;
  *   - q129: inverted-index build with capped postings buffers (hot
  *     tokens keep exact df but never materialize corpus-sized arrays);
  *   - q130: deterministic hash-stratified train/val/test split (no
  *     document migrates between splits across rebuilds);
  *   - q131: TF-IDF-style characteristic terms per language with the
  *     logarithm replaced by an exact rational score (cross-engine
  *     bit-determinism) and WindowGroupLimit top-k;
  *   - q132: exact weighted median from integer cumulative weights;
  *   - q133: cohort retention table from DISTINCT (user, day) counting;
  *   - q134: price-date Pareto frontier as a running strict min over a
  *     calendar-bounded daily reduction (never an O(n²) dominance join);
  *   - q135: lag-1 autocorrelation of the hourly series via exact
  *     integer moments;
  *   - q136: ORC sink round-trip (the second columnar format, with
  *     directory partition values and pruning);
  *   - q137: INTERVAL range frames + last_value IGNORE NULLS on one
  *     exchange;
  *   - q138: hierarchy rollup without recursive CTEs (in-row bit-shift
  *     ancestor enumeration vs a WITH RECURSIVE oracle);
  *   - q139: gaps-and-islands (two formulations, one answer);
  *   - q141: null-safe (IS NOT DISTINCT FROM) equi-join;
  *   - q142: join fan-out guardrail ([[graft.operators.JoinGuard]]);
  *   - q143/q144: period-over-period report, generated calendar dim;
  *   - q145: k-anonymity audit (pairs with q140's erasure);
  *   - q146/q147: last-touch attribution, clamped running balance (a
  *     per-row recurrence in two plain windows);
  *   - q148/q149: model-eval family — decile lift, confusion matrix
  *     with single-division precision/recall/F1.
  */
object ScaleQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.io.Sources.table(s, dir, name)

  private val dec = "decimal(38,0)"

  // --- q125: per-group OLS regression (exact moments) -------------------
  /** OLS of price (whole dollars) on quantity per return flag. The six
    * moments (n, Σx, Σy, Σxy, Σx², Σy²) are accumulated as
    * DECIMAL(38,0) — exact at any scale, order-independent — and each
    * derived statistic is ONE deterministic IEEE expression over
    * doubles cast from exact integers:
    *   slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept = (Σy−slope·Σx)/n,
    *   R² = (nΣxy−ΣxΣy)² / ((nΣx²−(Σx)²)(nΣy²−(Σy)²)).
    * Zero-variance groups are guarded to NULL on BOTH sides (Spark
    * non-ANSI x/0 → NULL but DuckDB → Inf/NaN, the q95/q99 degenerate-
    * group discipline). The oracle mirrors every cast and
    * parenthesization so both engines evaluate the identical IEEE
    * expression tree. */
  def q125OlsRegression(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      col("l_quantity").cast("long").cast(dec).as("x"),
      expr(s"CAST(CAST(round(l_extendedprice) AS BIGINT) AS $dec)")
        .as("y"))
    val m = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast(dec).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val d = m.select(col("l_returnflag"),
      col("n").cast("long").as("n"),
      col("sx").cast("double").as("sx_d"),
      col("sy").cast("double").as("sy_d"),
      col("n").cast("double").as("n_d"),
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        .as("num"),
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        .as("dxx"),
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        .as("dyy"))
    d.select(col("l_returnflag"), col("n"),
        when(col("dxx") > 0, col("num") / col("dxx")).as("slope"),
        when(col("dxx") > 0,
          (col("sy_d") - col("num") / col("dxx") * col("sx_d")) /
            col("n_d")).as("intercept"),
        when(col("dxx") > 0 && col("dyy") > 0,
          col("num") * col("num") / (col("dxx") * col("dyy"))).as("r2"))
      .orderBy("l_returnflag")
  }

  val q125Sql: String =
    """WITH li AS (
         SELECT l_returnflag,
                CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS x,
                CAST(CAST(round(l_extendedprice) AS BIGINT) AS HUGEINT)
                  AS y
         FROM lineitem),
       m AS (
         SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                sum(x * x) AS sxx, sum(y * y) AS syy
         FROM li GROUP BY 1),
       d AS (
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                CAST(sx AS DOUBLE) AS sx_d, CAST(sy AS DOUBLE) AS sy_d,
                CAST(n AS DOUBLE) AS n_d,
                CAST(n * sxy - sx * sy AS DOUBLE) AS num,
                CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
                CAST(n * syy - sy * sy AS DOUBLE) AS dyy
         FROM m)
       SELECT l_returnflag, n,
              CASE WHEN dxx > 0 THEN num / dxx END AS slope,
              CASE WHEN dxx > 0 THEN
                (sy_d - num / dxx * sx_d) / n_d END AS intercept,
              CASE WHEN dxx > 0 AND dyy > 0 THEN
                num * num / (dxx * dyy) END AS r2
       FROM d ORDER BY l_returnflag"""

  // --- q126: corpus drift report (total-variation distance) -------------
  /** Language-distribution drift between two disjoint document slices
    * (doc_id parity — the deterministic stand-in for "yesterday's crawl
    * vs today's"). Per language the share gap is |cₐ·t_b − c_b·tₐ| —
    * an EXACT integer — and TVD halves the normalized sum, so the
    * whole statistic admits exactly two float operations (one cast,
    * one division), both deterministic. The report is one row: slice
    * sizes, language count, TVD, and the worst-drifting language
    * (ties broken by language ascending via a single min(struct)
    * aggregate — no second pass over the counts). Shape at 100 TB:
    * |languages| rows after the first aggregate; everything downstream
    * is constant-size. */
  def q126CorpusDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("lang"), (col("doc_id") % 2).as("h"))
    val counts = docs.groupBy("lang").agg(
      sum(when(col("h") === 0, 1L).otherwise(0L)).cast(dec).as("ca"),
      sum(when(col("h") === 1, 1L).otherwise(0L)).cast(dec).as("cb"))
    val totals = counts.agg(sum("ca").as("ta"), sum("cb").as("tb"))
    val gaps = counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("ca"), col("cb"), col("ta"), col("tb"),
        abs(col("ca") * col("tb") - col("cb") * col("ta")).as("gap"))
    gaps.agg(
        max(col("ta")).as("ta"), max(col("tb")).as("tb"),
        count(lit(1)).as("n_langs"), sum(col("gap")).as("sgap"),
        min(struct((col("gap") * -1).as("ng"), col("lang"))).as("top"))
      .select(col("ta").cast("long").as("n_a"),
        col("tb").cast("long").as("n_b"), col("n_langs"),
        (col("sgap").cast("double") /
          (col("ta") * col("tb") * 2).cast("double")).as("tvd"),
        col("top.lang").as("top_lang"),
        ((col("top.ng") * -1).cast("double") /
          (col("ta") * col("tb")).cast("double")).as("top_gap"))
  }

  val q126Sql: String =
    """WITH docs AS (
         SELECT lang, doc_id % 2 AS h FROM documents),
       counts AS (
         SELECT lang,
                CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS HUGEINT)
                  AS ca,
                CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                  AS cb
         FROM docs GROUP BY lang),
       totals AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM counts),
       gaps AS (
         SELECT lang, abs(ca * tb - cb * ta) AS gap, ta, tb
         FROM counts CROSS JOIN totals),
       top AS (
         SELECT lang AS top_lang, gap AS top_g, ta AS tta, tb AS ttb
         FROM gaps ORDER BY gap DESC, lang ASC LIMIT 1)
       SELECT CAST(tta AS BIGINT) AS n_a, CAST(ttb AS BIGINT) AS n_b,
              (SELECT CAST(count(*) AS BIGINT) FROM counts) AS n_langs,
              CAST((SELECT sum(gap) FROM gaps) AS DOUBLE) /
                CAST(tta * ttb * 2 AS DOUBLE) AS tvd,
              top_lang,
              CAST(top_g AS DOUBLE) / CAST(tta * ttb AS DOUBLE) AS top_gap
       FROM top"""

  // --- q127: degree assortativity (exact moments) -----------------------
  /** Degree assortativity of the q97 part co-occurrence graph: Pearson
    * correlation of (deg(u), deg(v)) over DIRECTED edge instances (each
    * undirected edge contributes both orientations, the standard Newman
    * formulation — Σx = Σy by construction). Degrees are integers, so
    * the five moments are exact DECIMAL(38,0)/HUGEINT aggregates and
    * the correlation is one guarded IEEE expression — bit-identical
    * across engines, partial-agg orders and runs.
    *
    * Scale shape: the degree table is |V|-sized and data-dependent, so
    * the two degree joins are left UNHINTED — the planner/AQE broadcast
    * it while it fits and fall back to a vertex-keyed shuffle join
    * beyond ([[graft.operators.Graphs.triangleStats]]'s guard
    * discipline, applied by omission). The oracle recomputes degrees
    * and moments from scratch in SQL. */
  def q127Assortativity(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 30)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.groupBy("o").agg(array_sort(collect_set("p")).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "u")), col("ps"))
      .select(col("u"),
        explode(expr("slice(ps, i + 2, size(ps))")).as("v"))
      .distinct()
    val deg = edges.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast(dec).as("d"))
    val dirEdges = edges.select(col("u").as("a"), col("v").as("b"))
      .union(edges.select(col("v").as("a"), col("u").as("b")))
    val xy = dirEdges
      .join(deg.select(col("node").as("a"), col("d").as("x")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("y")), "b")
    val m = xy.agg(count(lit(1)).cast(dec).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
      .crossJoin(broadcast(
        deg.agg(count(lit(1)).as("n_vertices"))))
    m.select(col("n_vertices"),
      (col("n") / 2).cast("long").as("n_edges"),
      when((col("n") * col("sxx") - col("sx") * col("sx") > 0) &&
          (col("n") * col("syy") - col("sy") * col("sy") > 0),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
             .cast("double")))).as("assortativity"))
  }

  val q127Sql: String =
    """WITH li AS (
         SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
         WHERE l_quantity >= 30),
       e AS (
         SELECT DISTINCT a.p AS u, b.p AS v
         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
       deg AS (
         SELECT node, CAST(count(*) AS HUGEINT) AS d FROM (
           SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
         GROUP BY 1),
       dirs AS (
         SELECT u AS a, v AS b FROM e
         UNION ALL SELECT v AS a, u AS b FROM e),
       xy AS (
         SELECT da.d AS x, db.d AS y
         FROM dirs JOIN deg da ON dirs.a = da.node
                   JOIN deg db ON dirs.b = db.node),
       m AS (
         SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
                sum(y * y) AS syy
         FROM xy)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
              CAST(n / 2 AS BIGINT) AS n_edges,
              CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE) /
                  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                   sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
              END AS assortativity
       FROM m"""

  // --- q128: bucketed co-located join (zero exchanges) ------------------
  /** `lineitem ⋈ orders` per-order revenue with BOTH sides bucketed by
    * the join key: each table is `repartition(16, key)` +
    * `bucketBy(16, key).sortBy(key)` — repartition and bucketing use
    * the same Murmur3 hash, so every writer task holds exactly one
    * bucket and emits ONE file — and the join + the per-key aggregate
    * then plan with ZERO shuffle exchanges: the scans report the
    * bucketed hash distribution, the sort-merge join consumes it, and
    * the groupBy on the bucket key reuses it (ExtensionsSpec pins
    * exchange-count = 0 with broadcast disabled). At 100 TB this is
    * the fact-fact join answer: pay one layout write at ingest, then
    * every keyed join/agg against the table moves NOTHING. The filter
    * (o_orderkey % 100 = 0) rides down to both bucketed scans. The
    * oracle is the plain join — the hash compare proves layout changed
    * the plan, not the answer. */
  /** Write both join sides bucketed by the join key into `root`,
    * registering them as `liTab`/`ordTab` — the one-time layout cost a
    * warehouse pays at ingest. `repartition(16, key)` + `bucketBy(16,
    * key)` use the same Murmur3 hash, so each writer task holds exactly
    * one bucket and emits ONE file per bucket (the q71 small-file
    * discipline applied at write time, not by a later compaction). */
  def writeBucketedLayout(s: SparkSession, dir: String, root: String,
      liTab: String, ordTab: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $liTab")
    s.sql(s"DROP TABLE IF EXISTS $ordTab")
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .repartition(16, col("l_orderkey"))
      .write.format("parquet").bucketBy(16, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$root/li")
      .saveAsTable(liTab)
    t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      .repartition(16, col("o_orderkey"))
      .write.format("parquet").bucketBy(16, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$root/ord")
      .saveAsTable(ordTab)
  }

  /** The exchange-free core: bucketed scan → sort-merge join → agg ON
    * THE BUCKET KEY, all consuming the storage-provided hash
    * distribution (ScaleFeaturesSpec pins exchange-count = 0 on exactly
    * this plan with broadcast disabled). */
  def bucketedRevenue(s: SparkSession, liTab: String,
      ordTab: String): DataFrame =
    s.table(liTab)
      .join(s.table(ordTab), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderkey") % 100 === 0)
      .groupBy("o_orderkey", "o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(expr(
          "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) " +
            "AS BIGINT)")).as("rev_cents"))

  def q128BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_bucket_")
      .toString
    // per-invocation catalog names (suffix = the temp dir's unique
    // tail): concurrent q128 runs in one shared session must not drop
    // each other's tables mid-query
    val suffix = root.substring(root.lastIndexOf("graft_bucket_") +
      "graft_bucket_".length)
    val liTab = s"graft_q128_li_$suffix"
    val ordTab = s"graft_q128_ord_$suffix"
    try {
      writeBucketedLayout(s, dir, root, liTab, ordTab)
      // the orderBy exists only to make the driver's hash compare
      // deterministic; it adds the plan's sole exchange (a range
      // partition of the ~|orders|/100 result rows)
      val report = bucketedRevenue(s, liTab, ordTab).orderBy("o_orderkey")
      // materialize before the tables + files are dropped (q104 pattern)
      val rows = report.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), report.schema)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $liTab")
      s.sql(s"DROP TABLE IF EXISTS $ordTab")
      graft.io.Sources.deleteRecursively(root)
    }
  }

  val q128Sql: String =
    """SELECT o_orderkey, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                * 100) AS BIGINT)) AS BIGINT) AS rev_cents
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderkey % 100 = 0
       GROUP BY o_orderkey, o_orderpriority
       ORDER BY o_orderkey"""

  // --- q129: capped inverted index (postings build) ---------------------
  /** Token → (document frequency, postings) index over `documents`,
    * with the [[graft.plans.CollectSetSortedCapped]] cap discipline:
    * postings are materialized ONLY for tokens with df ≤ 20 — rarer
    * than the cap, the useful retrieval case — while hot tokens
    * (stop-words, boilerplate) keep their exact df but a NULL postings
    * list, and crucially their aggregation buffers never grow past
    * cap+1 elements (a plain collect_set would build a |corpus|-sized
    * array for "the" before any filter could drop it — the q26 postings
    * lesson applied to index construction). Postings are emitted as a
    * comma-joined sorted string so the oracle compare stays scalar. */
  def q129InvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val cap = 20
    val pairs = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    pairs.groupBy("token")
      .agg(count(lit(1)).as("df"),
        graft.plans.CollectSetSortedCapped(col("doc_id"), cap + 1)
          .as("ids"))
      .filter(col("df") >= 5)
      .select(col("token"), col("df"),
        when(size(col("ids")) <= cap,
          concat_ws(",", col("ids").cast("array<string>")))
          .as("postings"))
      .orderBy("token")
  }

  val q129Sql: String =
    """WITH pairs AS (
         SELECT DISTINCT doc_id, u.token
         FROM documents, unnest(string_split(text, ' ')) AS u(token)
         WHERE len(u.token) > 0),
       agg AS (
         SELECT token, CAST(count(*) AS BIGINT) AS df,
                CASE WHEN count(*) <= 20 THEN
                  array_to_string(list_sort(list(doc_id)), ',')
                END AS postings
         FROM pairs GROUP BY token)
       SELECT token, df, postings FROM agg
       WHERE df >= 5 ORDER BY token"""

  // --- q130: stratified train/val/test split ----------------------------
  /** Deterministic 80/10/10 corpus split: membership = hash60(doc_id)
    * mod 10 → {0-7: train, 8: val, 9: test}, a pure function of the key
    * (the q60 discipline) — re-runs, engines, partitionings and row
    * orders all agree, which is what a training pipeline needs so that
    * no document ever migrates between train and test across rebuilds.
    * Report: per (lang, split) document count and char volume — the
    * table a data curator eyeballs to confirm the split is stratified
    * in expectation without materializing three corpus copies. */
  def q130StratifiedSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(graft.operators.Dedup.hash60(
      col("doc_id").cast("string")), lit(10L))
    t(s, dir, "documents")
      .select(col("lang"), col("n_chars"),
        when(bucket <= 7, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("n_chars_total"))
      .orderBy("lang", "split")
  }

  val q130Sql: String =
    """WITH tagged AS (
         SELECT lang, n_chars,
                CASE WHEN b <= 7 THEN 'train'
                     WHEN b = 8 THEN 'val' ELSE 'test' END AS split
         FROM (
           SELECT lang, n_chars,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    ::BIGINT % 10 AS b
           FROM documents))
       SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS n_chars_total
       FROM tagged GROUP BY lang, split ORDER BY lang, split"""

  // --- q131: characteristic terms per language (TF-IDF-style) -----------
  /** Top-5 most characteristic tokens per language, scored by
    * tf_lang · N / df — the TF-IDF shape with the logarithm REPLACED by
    * an exact rational: ln() is not bit-identical across engines, while
    * tf·N and df are exact integers and their single division is one
    * deterministic IEEE op (the q99 argument applied to ranking).
    * df needs no second aggregation or join: it is a window sum of the
    * per-language counts over the token partition. Ranking ties break
    * by token ascending, so the top-5 is total-order deterministic.
    * Plan shape: one exchange for the (lang, token) aggregate; the
    * window and the rank filter ride WindowGroupLimit (map tasks emit
    * ≤5 rows per lang before the final exchange). */
  def q131TfidfTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val pairs = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    val tfl = pairs.groupBy("lang", "token").agg(count(lit(1)).as("tf"))
    val withDf = tfl.withColumn("df",
      sum("tf").over(Window.partitionBy("token")))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val scored = withDf.crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_total")).cast("double") /
          col("df").cast("double"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang")
          .orderBy(col("score").desc, col("token").asc)))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
      .orderBy("lang", "rank")
  }

  val q131Sql: String =
    """WITH pairs AS (
         SELECT DISTINCT doc_id, lang, u.token
         FROM documents, unnest(string_split(text, ' ')) AS u(token)
         WHERE len(u.token) > 0),
       tfl AS (
         SELECT lang, token, CAST(count(*) AS BIGINT) AS tf
         FROM pairs GROUP BY lang, token),
       withdf AS (
         SELECT lang, token, tf,
                CAST(sum(tf) OVER (PARTITION BY token) AS BIGINT) AS df
         FROM tfl),
       scored AS (
         SELECT lang, token, tf, df,
                CAST(tf * (SELECT count(*) FROM documents) AS DOUBLE) /
                  CAST(df AS DOUBLE) AS score
         FROM withdf),
       ranked AS (
         SELECT lang, token, tf, df, score,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY score DESC, token ASC) AS INTEGER) AS rank
         FROM scored)
       SELECT lang, rank, token, tf, df, score
       FROM ranked WHERE rank <= 5 ORDER BY lang, rank"""

  // --- q132: weighted median (exact, integer weights) -------------------
  /** Per-return-flag weighted median of quantity, weighted by revenue
    * cents: the smallest quantity q where 2·Σ_{x≤q} w ≥ Σw. Weights and
    * cumulative sums are exact integers, so — unlike a percentile over
    * float weights — the pick is bit-deterministic on both engines.
    * Complements q66 (unweighted percentile_disc) and q70 (approximate
    * percentile sketch). Shape: the corpus reduces to |flag × quantity|
    * rows in one exchange before any window runs — the window walks
    * ≤ 50 rows per flag, never the fact table. */
  def q132WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      col("l_quantity").cast("long").as("q"),
      expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) " +
        "AS BIGINT)").as("w"))
    val grouped = li.groupBy("l_returnflag", "q")
      .agg(sum("w").as("wsum"))
    val win = Window.partitionBy("l_returnflag").orderBy("q")
    val total = Window.partitionBy("l_returnflag")
    val cum = grouped
      .withColumn("cw", sum("wsum").over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum("wsum").over(total))
    cum.filter(col("cw") * 2 >= col("tw"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("q").as("weighted_median_qty"),
        col("tw").as("total_weight"))
      .orderBy("l_returnflag")
  }

  val q132Sql: String =
    """WITH li AS (
         SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                  AS BIGINT) AS w
         FROM lineitem),
       grouped AS (
         SELECT l_returnflag, q, CAST(sum(w) AS BIGINT) AS wsum
         FROM li GROUP BY l_returnflag, q),
       cum AS (
         SELECT l_returnflag, q, wsum,
                CAST(sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY q
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                CAST(sum(wsum) OVER (PARTITION BY l_returnflag)
                  AS BIGINT) AS tw
         FROM grouped),
       picked AS (
         SELECT l_returnflag, q, tw,
                row_number() OVER (PARTITION BY l_returnflag ORDER BY q)
                  AS rn
         FROM cum WHERE cw * 2 >= tw)
       SELECT l_returnflag, q AS weighted_median_qty,
              tw AS total_weight
       FROM picked WHERE rn = 1 ORDER BY l_returnflag"""

  // --- q133: cohort retention ------------------------------------------
  /** Classic warehouse cohort table: users grouped by first-active day,
    * retention = active users at day offsets 0-6. Everything is
    * integer counting over (user, day) DISTINCT pairs, so the table is
    * bit-deterministic. Shape at scale: the event stream reduces to
    * |users| + |user-days| rows before the join; the join key is
    * user_id, the natural co-partition for both sides (and the day
    * strings are emitted as formatted text so the cross-engine compare
    * never sees engine-specific date objects). */
  def q133CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstDay = ev.groupBy("user_id").agg(min("d").as("f"))
    val act = ev.distinct()
    act.join(firstDay, "user_id")
      .select(col("f"), datediff(col("d"), col("f")).as("offset"))
      .filter(col("offset") <= 6)
      .groupBy("f", "offset")
      .agg(count(lit(1)).as("n_active"))
      .select(date_format(col("f"), "yyyy-MM-dd").as("cohort_day"),
        col("offset"), col("n_active"))
      .orderBy("cohort_day", "offset")
  }

  val q133Sql: String =
    """WITH ev AS (
         SELECT user_id, CAST(ts AS DATE) AS d FROM events),
       f AS (SELECT user_id, min(d) AS fd FROM ev GROUP BY user_id),
       act AS (SELECT DISTINCT user_id, d FROM ev)
       SELECT strftime(fd, '%Y-%m-%d') AS cohort_day,
              CAST(date_diff('day', fd, d) AS INTEGER) AS "offset",
              CAST(count(*) AS BIGINT) AS n_active
       FROM act JOIN f ON act.user_id = f.user_id
       WHERE date_diff('day', fd, d) <= 6
       GROUP BY fd, date_diff('day', fd, d)
       ORDER BY cohort_day, "offset""""

  // --- q134: price-date Pareto frontier (skyline) -----------------------
  /** Skyline of the order stream at day granularity: the days whose
    * cheapest order undercuts EVERY later day's cheapest — the 2-D
    * Pareto frontier (recent, cheap) computed as a running strict min
    * over the day-descending order, not an O(n²) dominance join. The
    * corpus reduces to |days| rows in one exchange first; the
    * single-partition window then walks only those (|days| is bounded
    * by the calendar — thousands of rows at any corpus scale, which is
    * why the global window is safe here and would not be on the raw
    * stream). Prices compare as exact cents. */
  def q134ParetoFrontier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("day").agg(min("c").as("min_cents"))
    val later = Window.orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    daily.withColumn("m", min("min_cents").over(later))
      .filter(col("m").isNull || col("min_cents") < col("m"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("min_cents"))
      .orderBy("day")
  }

  val q134Sql: String =
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS min_cents
         FROM orders GROUP BY 1),
       run AS (
         SELECT day, min_cents,
                min(min_cents) OVER (ORDER BY day DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
         FROM daily)
       SELECT strftime(day, '%Y-%m-%d') AS day, min_cents
       FROM run WHERE m IS NULL OR min_cents < m
       ORDER BY day"""

  // --- q135: lag-1 autocorrelation of the hourly event series -----------
  /** First-order autocorrelation of hourly event counts — the
    * seasonality probe a pipeline runs before choosing a backfill
    * grain. The series is the OBSERVED hourly counts (empty hours are
    * absent, not zero-filled; the oracle mirrors that semantics);
    * counts are integers, so the (xₜ, xₜ₊₁) moments follow the q99
    * exact-moment discipline and acf₁ is one guarded IEEE expression.
    * Shape: the stream reduces to |hours| rows (calendar-bounded, like
    * q134) before the single-partition lead() window runs. */
  def q135HourlyAutocorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast(dec).as("c"))
    val pairs = hourly
      .withColumn("cn", lead("c", 1).over(Window.orderBy("h")))
      .filter(col("cn").isNotNull)
      .select(col("c").as("x"), col("cn").as("y"))
    val m = pairs.agg(count(lit(1)).cast(dec).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
      .crossJoin(broadcast(hourly.agg(count(lit(1)).as("n_hours"))))
    m.select(col("n_hours"), col("n").cast("long").as("n_pairs"),
      when((col("n") * col("sxx") - col("sx") * col("sx") > 0) &&
          (col("n") * col("syy") - col("sy") * col("sy") > 0),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
             .cast("double")))).as("acf1"))
  }

  val q135Sql: String =
    """WITH hourly AS (
         SELECT date_trunc('hour', ts) AS h,
                CAST(count(*) AS HUGEINT) AS c
         FROM events GROUP BY 1),
       pairs AS (
         SELECT c AS x, lead(c, 1) OVER (ORDER BY h) AS y FROM hourly),
       m AS (
         SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
                sum(y * y) AS syy
         FROM pairs WHERE y IS NOT NULL)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM hourly) AS n_hours,
              CAST(n AS BIGINT) AS n_pairs,
              CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE) /
                  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                   sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
              END AS acf1
       FROM m"""

  // --- q136: ORC sink round-trip ----------------------------------------
  /** The S-family format matrix extended to ORC: a lineitem projection
    * is published partitioned-by-flag as ORC, read back with a
    * partition-pruning filter, and aggregated — proving the engine's
    * second columnar format round-trips byte-exact revenue (the oracle
    * computes straight from the parquet source, so any encode/decode
    * drift in the ORC path would break the hash). Partition values ride
    * the directory names, exactly as the parquet sinks lay out. */
  def q136OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_orc_")
      .toString
    try {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
        .repartition(col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag")
        .orc(s"$root/sink")
      val report = s.read.orc(s"$root/sink")
        .filter(col("l_returnflag") =!= "N") // dies at partition pruning
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_items"), sum("cents").as("cents_sum"))
        .orderBy("l_returnflag", "l_linestatus")
      // materialize before the temp sink is deleted (q104 pattern)
      val rows = report.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), report.schema)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  // --- q156: JSONL corpus scan (schema-on-read + malformed tolerance) --
  /** The web-corpus source format the reference's CSV loaders never
    * met: newline-delimited JSON, read with an EXPLICIT schema (never
    * inference — at 10⁶ shard files inference is a full extra pass and
    * a drifting contract) and PERMISSIVE malformed-line tolerance: a
    * truncated or non-JSON line lands in the corrupt-record column
    * with every data field null instead of killing the scan — the G4
    * per-shard tolerance discipline applied at ROW granularity, which
    * is what real crawl dumps need (one torn line must not fail a
    * 100 GB shard). The census splits valid rows per language and
    * counts the two planted malformed lines under `__corrupt__`;
    * the oracle reproduces the valid half from the parquet table and
    * pins the corrupt count exactly. */
  def q156JsonlScan(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_jsonl_")
      .toString
    try {
      t(s, dir, "documents").select("doc_id", "lang", "n_chars")
        .write.json(s"$root/feed")
      // two planted torn lines, as their own .json shard
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/feed/zz_torn.json"),
        "{\"doc_id\": 1, \"lang\": \"en\"\nnot json at all\n"
          .getBytes("UTF-8"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING")
      val parsed = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(s"$root/feed")
      val out = parsed
        .groupBy(when(col("_corrupt").isNotNull, lit("__corrupt__"))
          .otherwise(col("lang")).as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_chars"), lit(0L))).as("chars_total"))
        .orderBy("lang")
      // materialize before the temp feed is deleted (q104 pattern)
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  val q156Sql: String =
    """SELECT * FROM (
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars_total
         FROM documents GROUP BY lang
         UNION ALL
         SELECT '__corrupt__', CAST(2 AS BIGINT), CAST(0 AS BIGINT)
       ) ORDER BY lang"""

  // --- q157: schema evolution across shard generations -----------------
  /** Schema drift, the long-lived-corpus certainty the reference's
    * fixed BigQuery schemas never face: an early shard generation has
    * no `quality` column, a later generation adds it. `mergeSchema`
    * unions the per-file schemas at read time, old rows surface the
    * new column as NULL, and the census must separate them — the
    * ADDITIVE evolution class, free at read time for any parquet
    * reader (the NON-additive classes — rename, drop, widen — are
    * metadata-only commits too, via [[graft.operators.SchemaEvolve]]'s
    * per-file manifest records; q323/q327). The read declares the
    * MERGED schema explicitly
    * after one mergeSchema listing probe in production; here the probe
    * itself is exercised. Oracle: both generations rebuilt from the
    * parquet truth with the same parity split. */
  def q157SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_evo_")
      .toString
    try {
      val docs = t(s, dir, "documents")
      // generation 1: even doc_ids, v1 schema (no quality column)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "n_chars")
        .write.parquet(s"$root/corpus")
      // generation 2: odd doc_ids, schema grew a quality column
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") % 5).cast("long").as("quality"))
        .write.mode("append").parquet(s"$root/corpus")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$root/corpus")
      val out = merged.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("quality")).as("n_scored"),
          sum(coalesce(col("quality"), lit(0L))).as("quality_sum"))
        .orderBy("lang")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  val q157Sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_scored,
              CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 5
                            ELSE 0 END) AS BIGINT) AS quality_sum
       FROM documents GROUP BY lang ORDER BY lang"""

  val q136Sql: String =
    """SELECT l_returnflag, l_linestatus,
              CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents_sum
       FROM lineitem WHERE l_returnflag <> 'N'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // --- q137: advanced window frames -------------------------------------
  /** The window-frame surface beyond q85's rolling rows-frame: a
    * time-based RANGE frame (trailing one hour, integer milli sum —
    * frame membership is defined by the ORDER BY value, so timestamp
    * ties are all-in and the sum is order-independent) and
    * last_value ... IGNORE NULLS (most recent purchase value carried
    * forward over non-purchase events). Both ride ONE user_id exchange;
    * all arithmetic is integer. Expressed through the SQL surface:
    * the DataFrame API's rangeBetween takes only numeric offsets, while
    * the SQL window grammar plans INTERVAL range frames directly. */
  def q137WindowFrames(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("graft_q137_events")
    s.sql(
      """WITH ev AS (
           SELECT user_id, event_id, ts,
                  CAST(round(value * 1000) AS BIGINT) AS vmilli,
                  CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 1000) AS BIGINT) END AS pv
           FROM graft_q137_events)
         SELECT user_id, event_id,
                CAST(sum(vmilli) OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS trailing_hour_milli,
                last_value(pv) IGNORE NULLS OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS last_purchase_milli
         FROM ev ORDER BY user_id, event_id""")
  }

  val q137Sql: String =
    """WITH ev AS (
         SELECT user_id, event_id, ts,
                CAST(round(value * 1000) AS BIGINT) AS vmilli,
                CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 1000) AS BIGINT) END AS pv
         FROM events)
       SELECT user_id, event_id,
              CAST(sum(vmilli) OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_hour_milli,
              last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS last_purchase_milli
       FROM ev ORDER BY user_id, event_id"""

  // --- q138: hierarchy rollup without recursive CTEs --------------------
  /** Subtree rollup over an implicit binary hierarchy (parent(k) =
    * k >> 1, the heap encoding): for every ancestor node ≤ 15 (the top
    * four levels), the count and total value of ALL its descendants.
    * Spark has no recursive CTE, and none is needed: each node's
    * ancestor chain is enumerated IN-ROW as `shiftright(k, j)` for
    * j = 0..30 — a ≤31-element array per row, so the rollup is one
    * Generate + one aggregation, no iteration, no driver loop, and the
    * shuffle carries (ancestor, value) pairs only. The oracle walks the
    * SAME hierarchy with DuckDB's WITH RECURSIVE — two entirely
    * different formulations (closed-form bit arithmetic vs recursive
    * fixpoint) that must produce identical rollups, which is the
    * differential-test point. */
  def q138HierarchyRollup(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").filter(col("p_partkey") >= 1)
      .select(col("p_partkey").as("k"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
      .select(col("cents"), explode(expr(
        "filter(transform(sequence(0, 30), j -> shiftright(k, j))," +
          " a -> a >= 1 AND a <= 15)")).as("anchor"))
      .groupBy("anchor")
      .agg(count(lit(1)).as("n_desc"), sum("cents").as("cents_sum"))
      .orderBy("anchor")
  }

  val q138Sql: String =
    """WITH RECURSIVE anc AS (
         SELECT p_partkey AS node, p_partkey AS anchor,
                CAST(round(p_retailprice * 100) AS BIGINT) AS cents
         FROM part WHERE p_partkey >= 1
         UNION ALL
         SELECT node, anchor >> 1, cents FROM anc WHERE anchor > 1)
       SELECT anchor, CAST(count(*) AS BIGINT) AS n_desc,
              CAST(sum(cents) AS BIGINT) AS cents_sum
       FROM anc WHERE anchor <= 15
       GROUP BY anchor ORDER BY anchor"""

  // --- q139: gaps and islands --------------------------------------------
  /** Consecutive-activity runs per user (the gaps-and-islands classic):
    * distinct active days, islanded by the day-minus-row_number trick
    * (consecutive days share `day − rn`), reported as islands count,
    * longest run and total active days per user. All integer/date
    * arithmetic — bit-deterministic. The oracle formulates islands
    * differently (lag + new-island flag + running sum), so the compare
    * pins the semantics, not the trick. Shape: the stream reduces to
    * |user-days| rows before any window; both windows ride the user_id
    * exchange. */
  def q139GapsIslands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    val islands = days
      .withColumn("rn", row_number().over(w))
      .withColumn("island", date_sub(col("d"), col("rn")))
      .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"), max("len").as("longest_run"),
        sum("len").cast("long").as("n_active_days"))
      .orderBy("user_id")
  }

  val q139Sql: String =
    """WITH days AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       flagged AS (
         SELECT user_id, d,
                CASE WHEN lag(d) OVER w IS NULL
                       OR date_diff('day', lag(d) OVER w, d) > 1
                     THEN 1 ELSE 0 END AS new_island
         FROM days WINDOW w AS (PARTITION BY user_id ORDER BY d)),
       grouped AS (
         SELECT user_id, d,
                sum(new_island) OVER (PARTITION BY user_id ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS island
         FROM flagged),
       islands AS (
         SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
         FROM grouped GROUP BY user_id, island)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
              CAST(max(len) AS BIGINT) AS longest_run,
              CAST(sum(len) AS BIGINT) AS n_active_days
       FROM islands GROUP BY user_id ORDER BY user_id"""

  // --- q141: null-safe equi-join ----------------------------------------
  /** The `<=>` (IS NOT DISTINCT FROM) join semantics the P8
    * coalesce-join-nulls row only approximates: a nullable grouping key
    * (priorities with '3-MEDIUM' nulled out) joined null-SAFELY against
    * its own aggregate, so the NULL group matches the NULL dim row
    * instead of silently dropping — the standard trap when a dimension
    * key is optional. Output ordering pins NULLS LAST on both engines
    * (Spark's asc default is NULLS FIRST, DuckDB's is NULLS LAST).
    * Shape: one aggregate + one |groups|-row broadcast join. */
  def q141NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("p"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val dim = orders.groupBy(col("p").as("dp"))
      .agg(count(lit(1)).as("grp_n"))
    orders.join(broadcast(dim), col("p") <=> col("dp"))
      .groupBy("p")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents_sum"),
        max("grp_n").as("dim_n"))
      .orderBy(col("p").asc_nulls_last)
  }

  val q141Sql: String =
    """WITH o AS (
         SELECT nullif(o_orderpriority, '3-MEDIUM') AS p,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
       dim AS (
         SELECT p AS dp, CAST(count(*) AS BIGINT) AS grp_n
         FROM o GROUP BY 1)
       SELECT p, CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(cents) AS BIGINT) AS cents_sum,
              CAST(max(grp_n) AS BIGINT) AS dim_n
       FROM o JOIN dim ON o.p IS NOT DISTINCT FROM dim.dp
       GROUP BY p ORDER BY p NULLS LAST"""

  // --- q142: join fan-out audit -----------------------------------------
  /** [[graft.operators.JoinGuard.fanoutReport]] pointed at the classic
    * explosion scenario — a part-key self-join of lineitem (the shape
    * every naive pair-dedup starts from): the 5 hottest keys by output
    * pairs, with per-side multiplicities. The audit costs two counts
    * and a |keys|-row join; the join it warns about would cost
    * Σ n² pairs. OperatorsSpec pins `requireFanoutBelow`'s fail-fast
    * with the offending key in the error. */
  def q142FanoutAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_partkey")
    graft.operators.JoinGuard.fanoutReport(li, li, Seq("l_partkey"), 5)
  }

  val q142Sql: String =
    """WITH c AS (
         SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1)
       SELECT l_partkey, n AS n_left, n AS n_right,
              CAST(n * n AS BIGINT) AS n_pairs
       FROM c ORDER BY n_pairs DESC, l_partkey ASC LIMIT 5"""

  // --- q143: period-over-period revenue report --------------------------
  /** Month-over-month revenue: monthly cents (exact), absolute delta
    * (exact integer subtraction via lag) and percent change (ONE double
    * division of two exact integers — the only float op, deterministic
    * on both engines). The corpus reduces to |months| rows before the
    * single-partition lag window (calendar-bounded, the q134/q135
    * argument). First month's deltas are NULL, ordering is total. */
  def q143MomRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    monthly
      .withColumn("prev", lag("cents", 1).over(Window.orderBy("month")))
      .select(col("month"), col("cents"),
        (col("cents") - col("prev")).as("delta_cents"),
        ((col("cents") - col("prev")).cast("double") /
          col("prev").cast("double") * 100.0).as("pct_change"))
      .orderBy("month")
  }

  val q143Sql: String =
    """WITH monthly AS (
         SELECT strftime(o_orderdate, '%Y-%m') AS month,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
         FROM orders GROUP BY 1),
       lagged AS (
         SELECT month, cents,
                lag(cents, 1) OVER (ORDER BY month) AS prev
         FROM monthly)
       SELECT month, cents,
              CAST(cents - prev AS BIGINT) AS delta_cents,
              CAST(cents - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 100.0
                AS pct_change
       FROM lagged ORDER BY month"""

  // --- q144: generated calendar dimension -------------------------------
  /** A dimension built from NO input table: one year of days generated
    * in-plan (`sequence` + explode — the S-family's generator source,
    * the pattern that seeds date spines, retry schedules and synthetic
    * fixtures without driver-side loops). Calendar attributes use only
    * engine-agnostic integer arithmetic: day-of-week is computed from
    * an epoch-anchored datediff mod 7 (1 = Monday) because the built-in
    * dow numbering DISAGREES across engines (Spark 1=Sunday, DuckDB
    * 0=Sunday) — the cross-engine lesson of F7 made explicit. */
  def q144CalendarDim(s: SparkSession, dir: String): DataFrame = {
    s.range(1)
      .select(explode(expr(
        "sequence(DATE'1995-01-01', DATE'1995-12-31')")).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        month(col("d")).as("month"), quarter(col("d")).as("quarter"),
        // 1995-01-02 is a Monday: anchor-mod-7 is engine-agnostic
        (pmod(datediff(col("d"), to_date(lit("1995-01-02"))), lit(7)) + 1)
          .cast("int").as("dow"),
        (pmod(datediff(col("d"), to_date(lit("1995-01-02"))), lit(7)) >= 5)
          .as("is_weekend"),
        (col("d") === last_day(col("d"))).as("is_month_end"))
      .orderBy("day")
  }

  val q144Sql: String =
    """SELECT strftime(d, '%Y-%m-%d') AS day,
              CAST(month(d) AS INTEGER) AS month,
              CAST(quarter(d) AS INTEGER) AS quarter,
              CAST(((date_diff('day', DATE '1995-01-02', d) % 7 + 7) % 7)
                + 1 AS INTEGER) AS dow,
              ((date_diff('day', DATE '1995-01-02', d) % 7 + 7) % 7) >= 5
                AS is_weekend,
              d = last_day(d) AS is_month_end
       FROM (SELECT unnest(generate_series(DATE '1995-01-01',
               DATE '1995-12-31', INTERVAL 1 DAY))::DATE AS d)
       ORDER BY day"""

  // --- q145: k-anonymity audit ------------------------------------------
  /** The privacy DQ check that pairs with q140's erasure: group the
    * customer table by its quasi-identifiers (segment × nation) and
    * report the anonymity floor — smallest group, group count, and how
    * many groups/rows sit below k = 10 (re-identifiable under linkage).
    * One aggregation pass to |quasi-groups| rows, one scalar reduce;
    * all integers. */
  // --- q184: l-diversity audit ------------------------------------------
  /** l-diversity (Machanavajjhala et al., ICDE 2006) over the same
    * quasi-identifier groups as q145's k-anonymity: a group is safe only
    * if its SENSITIVE attribute (account-balance band, ¤1000 floor
    * buckets) takes ≥ l distinct values — k-anonymity alone lets an
    * attacker who locates a homogeneous group read the sensitive value
    * without re-identifying anyone. One exact count-distinct per group
    * (two-level hash agg: (QI, band) dedup then per-QI count — Spark
    * plans exactly that for countDistinct, partial-agg map-side), then
    * a metadata-sized audit rollup, same report shape as q145. */
  def q184LDiversity(s: SparkSession, dir: String): DataFrame = {
    val groups = t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("band")).as("l"))
    groups.agg(
      min("l").as("l_min"),
      count(lit(1)).as("n_groups"),
      sum(when(col("l") < 3, 1L).otherwise(0L)).cast("long")
        .as("groups_below_l"),
      sum(when(col("l") < 3, col("n")).otherwise(0L)).cast("long")
        .as("rows_at_risk"))
  }

  val q184Sql: String =
    """WITH g AS (
         SELECT c_mktsegment, c_nationkey,
                CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT
                  CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS BIGINT)
                  AS l
         FROM customer GROUP BY 1, 2)
       SELECT min(l) AS l_min, CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
                AS groups_below_l,
              CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
                AS rows_at_risk
       FROM g"""

  // --- q192: VARIANT semi-structured extraction -------------------------
  /** The events `props` JSON through Spark 4's VARIANT type:
    * `parse_json` once into the binary-encoded semi-structured value,
    * then typed `variant_get` extraction — the lakehouse path for
    * schema-on-read columns, strictly better at scale than per-access
    * `get_json_object` (q23) because the parse happens ONCE per row and
    * the binary encoding skips re-tokenizing the JSON text on every
    * field access. The census reduces to one row (count, distinct,
    * min/max/sum of the extracted key), all integers. */
  def q192VariantJson(s: SparkSession, dir: String): DataFrame = {
    val k = expr("variant_get(parse_json(props), '$.k', 'long')")
    t(s, dir, "events")
      .select(k.as("k"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_null_k"),
        countDistinct(col("k")).as("n_distinct_k"),
        min("k").as("k_min"), max("k").as("k_max"),
        sum("k").as("k_sum"))
  }

  val q192Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
              CAST(count(DISTINCT CAST(json_extract(props, '$.k')
                AS BIGINT)) AS BIGINT) AS n_distinct_k,
              min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
              max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
              CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
       FROM events"""

  // --- q193: collation-aware dedup census -------------------------------
  /** Spark 4 COLLATION at work: the corpus with every odd doc's text
    * uppercased (a deterministic in-query perturbation — the
    * mixed-case mess a real crawl delivers), counted distinct three
    * ways: binary (case variants stay distinct), UTF8_LCASE collation
    * (the engine-native case-insensitive comparator — dedup WITHOUT
    * materializing a lowercased copy of the corpus), and explicit
    * lower() (the pre-collation workaround, which at 100 TB pays a
    * full rewritten-string shuffle; the collated compare hashes the
    * collation key instead). The corpus here is ASCII, where UTF8_LCASE
    * equivalence classes coincide with lower() — which is what lets
    * DuckDB (no Spark collations) oracle the same number. */
  def q193CollatedDedup(s: SparkSession, dir: String): DataFrame = {
    val mixed = t(s, dir, "documents")
      .select(when(col("doc_id") % 2 === 1, upper(col("text")))
        .otherwise(col("text")).as("t"))
    mixed.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("t")).as("n_distinct_binary"),
      countDistinct(collate(col("t"), "UTF8_LCASE"))
        .as("n_distinct_lcase"),
      countDistinct(lower(col("t"))).as("n_distinct_lower"))
  }

  val q193Sql: String =
    """WITH m AS (
         SELECT CASE WHEN doc_id % 2 = 1 THEN upper(text)
                     ELSE text END AS t
         FROM documents)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT t) AS BIGINT) AS n_distinct_binary,
              CAST(count(DISTINCT lower(t)) AS BIGINT)
                AS n_distinct_lcase,
              CAST(count(DISTINCT lower(t)) AS BIGINT)
                AS n_distinct_lower
       FROM m"""

  // --- q194: native XML round-trip --------------------------------------
  /** Spark 4's built-in XML source (the spark-xml package graduated
    * into the engine): a slice of orders written as row-tagged XML,
    * read back with an EXPLICIT schema (the q156 no-inference
    * discipline — at shard scale inference is a full extra pass), and
    * reduced to a per-status census the oracle reproduces straight from
    * the parquet truth. Cents-exact money (q125 discipline). XML is the
    * interchange format enterprise feeds still speak; the round-trip
    * pins that the engine's reader/writer agree on escaping, nulls, and
    * numeric rendering. */
  def q194XmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_xml_")
      .toString
    try {
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .write.format("xml").option("rowTag", "order")
        .save(s"$root/feed")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey LONG, o_orderstatus STRING, cents LONG")
      val back = s.read.format("xml").option("rowTag", "order")
        .schema(schema).load(s"$root/feed")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents_sum"),
          min("o_orderkey").as("key_min"))
        .orderBy("o_orderstatus")
      val rows = back.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), back.schema)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  val q194Sql: String =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents_sum,
              min(o_orderkey) AS key_min
       FROM orders WHERE o_orderkey % 10 = 0
       GROUP BY 1 ORDER BY 1"""

  def q145KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val groups = t(s, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"))
    groups.agg(
      min("n").as("k_min"),
      count(lit(1)).as("n_groups"),
      sum(when(col("n") < 10, 1L).otherwise(0L)).cast("long")
        .as("groups_below_k"),
      sum(when(col("n") < 10, col("n")).otherwise(0L)).cast("long")
        .as("rows_at_risk"))
  }

  val q145Sql: String =
    """WITH groups AS (
         SELECT c_mktsegment, c_nationkey,
                CAST(count(*) AS BIGINT) AS n
         FROM customer GROUP BY 1, 2)
       SELECT CAST(min(n) AS BIGINT) AS k_min,
              CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
                AS groups_below_k,
              CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
                AS rows_at_risk
       FROM groups"""

  // --- q146: last-touch attribution -------------------------------------
  /** Marketing-style attribution: each purchase is credited to the same
    * user's most recent click within the preceding hour (purchases with
    * no qualifying click stay unattributed). One window pass — the
    * click timestamp carries forward via last_value IGNORE NULLS over
    * the (ts, event_id) total order, then a single interval predicate
    * decides attribution — instead of the naive purchase×click
    * interval self-join (which is q91's decomposition problem all over
    * again; the window form never builds candidate pairs at all).
    * Report: per-user-bucket purchase counts, attributed counts, and
    * exact-integer attributed value. */
  def q146Attribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
      col("event_id"), col("event_type"),
      expr("CAST(round(value * 1000) AS BIGINT)").as("vmilli"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = ev
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        col("last_click_ts").isNotNull &&
          col("last_click_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
    tagged.groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).cast("long")
          .as("n_attributed"),
        sum(when(col("attributed"), col("vmilli")).otherwise(0L))
          .cast("long").as("attributed_milli"))
      .orderBy("user_bucket")
  }

  val q146Sql: String =
    """WITH ev AS (
         SELECT user_id, ts, event_id, event_type,
                CAST(round(value * 1000) AS BIGINT) AS vmilli
         FROM events),
       tagged AS (
         SELECT user_id, ts, event_type, vmilli,
                last_value(CASE WHEN event_type = 'click' THEN ts END
                  IGNORE NULLS) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS last_click_ts
         FROM ev),
       purchases AS (
         SELECT user_id, vmilli,
                (last_click_ts IS NOT NULL AND
                 last_click_ts >= ts - INTERVAL 1 HOUR) AS attributed
         FROM tagged WHERE event_type = 'purchase')
       SELECT user_id % 10 AS user_bucket,
              CAST(count(*) AS BIGINT) AS n_purchases,
              CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
                AS n_attributed,
              CAST(sum(CASE WHEN attributed THEN vmilli ELSE 0 END)
                AS BIGINT) AS attributed_milli
       FROM purchases GROUP BY 1 ORDER BY 1"""

  // --- q147: clamped running balance (stateful recurrence, windowed) ----
  /** The running total that CLAMPS at zero — rₜ = max(0, rₜ₋₁ + xₜ),
    * the inventory/credit-balance recurrence that looks like it needs
    * per-row state (mapGroupsWithState or a UDAF) — expressed in TWO
    * plain windows via the identity
    *   rₜ = cumsumₜ − min(0, min_{s≤t} cumsumₛ):
    * the clamp only ever "absorbs" the most negative prefix, so
    * subtracting the running minimum of the prefix sums (floored at 0)
    * replays every reset exactly. Both windows share one user_id
    * exchange; all arithmetic is integer. The oracle computes the SAME
    * identity (DuckDB also has no native clamped cumsum) — and the
    * OperatorsSpec pins the identity against a literal per-row fold on
    * a fixture, so the algebra itself is tested, not just cross-engine
    * agreement. Signed deltas: purchases add value, errors subtract. */
  def q147ClampedBalance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase",
          expr("CAST(round(value * 1000) AS BIGINT)"))
          .otherwise(expr("-CAST(round(value * 1000) AS BIGINT)"))
          .as("delta"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val balances = ev
      .withColumn("csum", sum("delta").over(w))
      .withColumn("balance",
        col("csum") - least(lit(0L), min("csum").over(w)))
    balances.groupBy("user_id")
      .agg(max("balance").as("peak_balance"),
        // final balance = balance at the last (ts, event_id) row
        max(struct(col("ts"), col("event_id"), col("balance")))("balance")
          .as("final_balance"),
        count(lit(1)).as("n_moves"))
      .orderBy("user_id")
  }

  val q147Sql: String =
    """WITH ev AS (
         SELECT user_id, ts, event_id,
                CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 1000) AS BIGINT)
                  ELSE -CAST(round(value * 1000) AS BIGINT) END AS delta
         FROM events WHERE event_type IN ('purchase', 'error')),
       c AS (
         SELECT user_id, ts, event_id,
                sum(delta) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS csum
         FROM ev),
       b AS (
         SELECT user_id, ts, event_id,
                csum - least(0, min(csum) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  AS balance
         FROM c),
       ranked AS (
         SELECT user_id, balance,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn
         FROM b)
       SELECT g.user_id,
              CAST(g.peak_balance AS BIGINT) AS peak_balance,
              CAST(f.balance AS BIGINT) AS final_balance,
              g.n_moves
       FROM (SELECT user_id, max(balance) AS peak_balance,
                    CAST(count(*) AS BIGINT) AS n_moves
             FROM b GROUP BY user_id) g
       JOIN (SELECT user_id, balance FROM ranked WHERE rn = 1) f
         ON g.user_id = f.user_id
       ORDER BY g.user_id"""

  // --- q148: decile lift table (model-eval family) ----------------------
  /** The ranking-quality report an eval pipeline runs on every scored
    * corpus: rows ranked by a score (here the embedding's first
    * component — a deterministic stand-in for a model score), cut into
    * deciles, each decile's positive rate compared against the base
    * rate as lift. Positives = label 0 (10-class fixture → ~10% base).
    * Counts are integers; rate and lift are computed from exact
    * integers with the lift as cross-multiplied integers over one
    * division (pos·n_total / (n_dec·total_pos)) so no intermediate
    * float rate propagates. Decile boundaries are ntile over the total
    * (score, vec_id) order — tie-broken, engine-identical. */
  def q148DecileLift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), element_at(col("embedding"), 1).as("score"),
        when(col("label") === 0, 1L).otherwise(0L).as("pos"))
    val ranked = e.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score").desc, col("vec_id"))))
    val per = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
    val tot = per.agg(sum("n").as("n_total"), sum("n_pos").as("total_pos"))
    // degenerate fixture (zero positives) → NULL lift on BOTH engines:
    // unguarded, Spark non-ANSI x/0 is NULL but DuckDB doubles give
    // Inf/NaN — the q125/q127 cross-engine divergence discipline
    per.crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        when(col("n") * col("total_pos") > 0,
          (col("n_pos") * col("n_total")).cast("double") /
            (col("n") * col("total_pos")).cast("double")).as("lift"))
      .orderBy("decile")
  }

  val q148Sql: String =
    """WITH e AS (
         SELECT vec_id, embedding[1] AS score,
                CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
         FROM embeddings),
       ranked AS (
         SELECT pos, ntile(10) OVER (ORDER BY score DESC, vec_id)
                  AS decile
         FROM e),
       per AS (
         SELECT decile, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(pos) AS BIGINT) AS n_pos
         FROM ranked GROUP BY decile),
       tot AS (
         SELECT CAST(sum(n) AS BIGINT) AS n_total,
                CAST(sum(n_pos) AS BIGINT) AS total_pos
         FROM per)
       SELECT decile, n, n_pos,
              CASE WHEN n * total_pos > 0
                THEN CAST(n_pos * n_total AS DOUBLE) /
                     CAST(n * total_pos AS DOUBLE) END AS lift
       FROM per CROSS JOIN tot ORDER BY decile"""

  // --- q149: confusion matrix + precision/recall/F1 ---------------------
  /** Binary-classifier evaluation from exact integer confusion counts:
    * a deterministic rule (first embedding component > 0) scored
    * against a deterministic truth (even label), reduced to
    * (tp, fp, fn, tn) in ONE aggregation pass, then precision, recall,
    * accuracy and F1 each as a SINGLE division of exact integers —
    * F1 deliberately in its 2tp/(2tp+fp+fn) form so no intermediate
    * precision/recall float ever feeds another division (the q99
    * one-IEEE-op-per-statistic discipline applied to model eval). */
  def q149ConfusionMatrix(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(
      (element_at(col("embedding"), 1) > 0).as("pred"),
      (col("label") % 2 === 0).as("truth"))
    val m = e.agg(
      sum(when(col("pred") && col("truth"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && !col("truth"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && col("truth"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("pred") && !col("truth"), 1L).otherwise(0L)).as("tn"))
    // each ratio guarded: a degenerate fixture (no predicted/actual
    // positives, or an empty table) yields NULL identically on both
    // engines instead of Spark-NULL-vs-DuckDB-Inf/NaN divergence
    m.select(col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0, col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double")).as("precision"),
      when(col("tp") + col("fn") > 0, col("tp").cast("double") /
        (col("tp") + col("fn")).cast("double")).as("recall"),
      when(col("tp") + col("fp") + col("fn") + col("tn") > 0,
        (col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"))
        .as("accuracy"),
      when(col("tp") * 2 + col("fp") + col("fn") > 0,
        (col("tp") * 2).cast("double") /
          (col("tp") * 2 + col("fp") + col("fn")).cast("double")).as("f1"))
  }

  val q149Sql: String =
    """WITH e AS (
         SELECT embedding[1] > 0 AS pred, label % 2 = 0 AS truth
         FROM embeddings),
       m AS (
         SELECT
           CAST(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END)
             AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END)
             AS BIGINT) AS fp,
           CAST(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END)
             AS BIGINT) AS fn,
           CAST(sum(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0 END)
             AS BIGINT) AS tn
         FROM e)
       SELECT tp, fp, fn, tn,
              CASE WHEN tp + fp > 0 THEN
                CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
                AS precision,
              CASE WHEN tp + fn > 0 THEN
                CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
              CASE WHEN tp + fp + fn + tn > 0 THEN
                CAST(tp + tn AS DOUBLE) /
                  CAST(tp + fp + fn + tn AS DOUBLE) END AS accuracy,
              CASE WHEN tp * 2 + fp + fn > 0 THEN
                CAST(tp * 2 AS DOUBLE) /
                  CAST(tp * 2 + fp + fn AS DOUBLE) END AS f1
       FROM m"""

  val all: Map[String, Q] = Map(
    "q125_ols_regression" -> q125OlsRegression _,
    "q126_corpus_drift" -> q126CorpusDrift _,
    "q127_assortativity" -> q127Assortativity _,
    "q128_bucketed_join" -> q128BucketedJoin _,
    "q129_inverted_index" -> q129InvertedIndex _,
    "q130_stratified_split" -> q130StratifiedSplit _,
    "q131_tfidf_terms" -> q131TfidfTerms _,
    "q132_weighted_median" -> q132WeightedMedian _,
    "q133_cohort_retention" -> q133CohortRetention _,
    "q134_pareto_frontier" -> q134ParetoFrontier _,
    "q135_hourly_autocorr" -> q135HourlyAutocorr _,
    "q136_orc_roundtrip" -> q136OrcRoundtrip _,
    "q156_jsonl_scan" -> q156JsonlScan _,
    "q157_schema_evolution" -> q157SchemaEvolution _,
    "q137_window_frames" -> q137WindowFrames _,
    "q138_hierarchy_rollup" -> q138HierarchyRollup _,
    "q139_gaps_islands" -> q139GapsIslands _,
    "q141_null_safe_join" -> q141NullSafeJoin _,
    "q142_fanout_audit" -> q142FanoutAudit _,
    "q143_mom_revenue" -> q143MomRevenue _,
    "q144_calendar_dim" -> q144CalendarDim _,
    "q145_k_anonymity" -> q145KAnonymity _,
    "q146_attribution" -> q146Attribution _,
    "q147_clamped_balance" -> q147ClampedBalance _,
    "q148_decile_lift" -> q148DecileLift _,
    "q149_confusion_matrix" -> q149ConfusionMatrix _,
    "q184_l_diversity" -> q184LDiversity _,
    "q192_variant_json" -> q192VariantJson _,
    "q193_collated_dedup" -> q193CollatedDedup _,
    "q194_xml_roundtrip" -> q194XmlRoundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "q125_ols_regression" -> q125Sql,
    "q126_corpus_drift" -> q126Sql,
    "q127_assortativity" -> q127Sql,
    "q128_bucketed_join" -> q128Sql,
    "q129_inverted_index" -> q129Sql,
    "q130_stratified_split" -> q130Sql,
    "q131_tfidf_terms" -> q131Sql,
    "q132_weighted_median" -> q132Sql,
    "q133_cohort_retention" -> q133Sql,
    "q134_pareto_frontier" -> q134Sql,
    "q135_hourly_autocorr" -> q135Sql,
    "q136_orc_roundtrip" -> q136Sql,
    "q156_jsonl_scan" -> q156Sql,
    "q157_schema_evolution" -> q157Sql,
    "q137_window_frames" -> q137Sql,
    "q138_hierarchy_rollup" -> q138Sql,
    "q139_gaps_islands" -> q139Sql,
    "q141_null_safe_join" -> q141Sql,
    "q142_fanout_audit" -> q142Sql,
    "q143_mom_revenue" -> q143Sql,
    "q144_calendar_dim" -> q144Sql,
    "q145_k_anonymity" -> q145Sql,
    "q146_attribution" -> q146Sql,
    "q147_clamped_balance" -> q147Sql,
    "q148_decile_lift" -> q148Sql,
    "q149_confusion_matrix" -> q149Sql,
    "q184_l_diversity" -> q184Sql,
    "q192_variant_json" -> q192Sql,
    "q193_collated_dedup" -> q193Sql,
    "q194_xml_roundtrip" -> q194Sql,
  )
}
