package graft.queries

import graft.operators.{GridJoin, Scd2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-management and candidate-pruning operators: SCD Type 2
  * dimension maintenance, grid-bucketed spatial radius join,
  * deterministic weighted sampling, and bitmap-based distinct-set
  * intersection. Each is a classic at-scale rewrite: the naive form
  * (full-history re-rank, cross join, orderBy rand(), count-distinct
  * self-join) dies at 100 TB; the implemented form touches only the
  * delta / the density / k·P rows / fixed-width bitmaps.
  */
object WarehouseQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // --- q210: SCD Type 2 dimension apply ----------------------------------
  /** One load cycle of a Type-2 customer dimension ([[Scd2]]): the
    * initial dimension opens every customer on 2026-01-01; the update
    * batch re-segments every 7th customer (a real change), re-delivers
    * every 13th unchanged (must be a no-op), and introduces brand-new
    * members (key+1000000 for every 97th) — the three cases a Type-2
    * apply must distinguish. Output is the full post-apply dimension:
    * expired versions carry [2026-01-01, 2026-06-01) and
    * is_current=false, their replacements and the new members open at
    * 2026-06-01. The oracle derives the same three-way split
    * relationally. Scale shape: the dimension joins the (small,
    * broadcastable) delta exactly once; history streams through a
    * union untouched — no rank-over-full-history shuffle. */
  def q210Scd2(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val dim = c.select(col("c_custkey"),
        col("c_mktsegment").as("segment"),
        lit("2026-01-01").cast("date").as("effective_from"),
        lit("9999-12-31").cast("date").as("effective_to"),
        lit(true).as("is_current"))
    val changed = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        concat(lit("SEG_"), (col("c_custkey") % 3).cast("string"))
          .as("segment"))
    val redelivered = c.filter(col("c_custkey") % 13 === 0 &&
        col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val fresh = c.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        lit("NEWSEG").as("segment"))
    val updates = changed.unionByName(redelivered).unionByName(fresh)
    // dates leave the engine as yyyy-MM-dd strings — the q144
    // cross-engine date-type discipline
    Scd2.applyChanges(dim, updates, Seq("c_custkey"), Seq("segment"),
        lit("2026-06-01").cast("date"))
      .withColumn("effective_from",
        date_format(col("effective_from"), "yyyy-MM-dd"))
      .withColumn("effective_to",
        date_format(col("effective_to"), "yyyy-MM-dd"))
      .orderBy("c_custkey", "effective_from")
  }

  val q210Sql: String =
    """WITH upd AS (
         SELECT c_custkey,
                'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS segment
         FROM customer WHERE c_custkey % 7 = 0
         UNION ALL
         SELECT c_custkey, c_mktsegment
         FROM customer WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
         UNION ALL
         SELECT c_custkey + 1000000, 'NEWSEG'
         FROM customer WHERE c_custkey % 97 = 0),
       cur AS (
         SELECT c_custkey, c_mktsegment AS segment FROM customer),
       unchanged AS (
         SELECT c.c_custkey, c.segment,
                '2026-01-01' AS effective_from,
                '9999-12-31' AS effective_to, TRUE AS is_current
         FROM cur c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
         WHERE u.c_custkey IS NULL OR c.segment = u.segment),
       expired AS (
         SELECT c.c_custkey, c.segment,
                '2026-01-01' AS effective_from,
                '2026-06-01' AS effective_to, FALSE AS is_current
         FROM cur c JOIN upd u ON c.c_custkey = u.c_custkey
         WHERE c.segment <> u.segment),
       opened AS (
         SELECT u.c_custkey, u.segment,
                '2026-06-01' AS effective_from,
                '9999-12-31' AS effective_to, TRUE AS is_current
         FROM upd u LEFT JOIN cur c ON u.c_custkey = c.c_custkey
         WHERE c.c_custkey IS NULL OR c.segment <> u.segment)
       SELECT * FROM (
         SELECT * FROM unchanged
         UNION ALL SELECT * FROM expired
         UNION ALL SELECT * FROM opened)
       ORDER BY c_custkey, effective_from"""

  // --- q211: grid-bucketed spatial radius join ---------------------------
  /** "Suppliers within 3000 units of a customer" on a 100k×100k plane,
    * via [[GridJoin]]: cell-bucket one side, replicate the other to
    * its 3×3 neighborhood, equi-join on the cell, exact int64
    * squared-distance residual — candidates follow point density, the
    * cross join the oracle runs is exactly what this rewrite avoids.
    * Coordinates are deterministic fixed-point functions of the keys
    * (integer LCG-style scatter), so both engines derive identical
    * geometry with zero float ops. */
  def q211GridJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"),
      ((col("c_custkey") * 48271L) % 100000L).as("cx"),
      ((col("c_custkey") * 69621L) % 100000L).as("cy"))
    val sup = t(s, dir, "supplier").select(col("s_suppkey"),
      ((col("s_suppkey") * 48271L) % 100000L).as("sx"),
      ((col("s_suppkey") * 69621L) % 100000L).as("sy"))
    GridJoin.radiusJoin(c, sup, "cx", "cy", "sx", "sy", 3000L)
      .select("s_suppkey", "c_custkey", "dist2")
      .orderBy("s_suppkey", "c_custkey")
  }

  val q211Sql: String =
    """WITH c AS (
         SELECT c_custkey,
                (c_custkey * 48271) % 100000 AS cx,
                (c_custkey * 69621) % 100000 AS cy
         FROM customer),
       s AS (
         SELECT s_suppkey,
                (s_suppkey * 48271) % 100000 AS sx,
                (s_suppkey * 69621) % 100000 AS sy
         FROM supplier)
       SELECT s_suppkey, c_custkey,
              (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
       FROM c CROSS JOIN s
       WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 9000000
       ORDER BY s_suppkey, c_custkey"""

  // --- q212: deterministic weighted sample per group ---------------------
  /** Five orders per market-segment-like stratum (here: order status),
    * sampled with probability increasing in o_totalprice — the
    * weighted variant of q60's hash sample. Priority follows
    * Efraimidis–Spirakis (min of u^(1/w) ranks ∝ w), but with the
    * RATIONAL surrogate u/w: transcendentals (pow/ln) are not
    * bit-identical across engines, while one IEEE multiply + divide
    * is, so the same sample falls out of Spark and DuckDB exactly.
    * u is a fixed-point Knuth-hash uniform of the key — re-runs are
    * reproducible by construction, no rand() seed handshake. Top-k per
    * group compiles to WindowGroupLimit: each task keeps its local 5
    * before the exchange, so k·P rows shuffle, never the table. */
  def q212WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders").select(col("o_orderstatus"),
      col("o_orderkey"), col("o_totalprice"),
      (((col("o_orderkey") * 2654435761L) % 1000003L + 1L)
        .cast("double") / (lit(1000004.0) * col("o_totalprice")))
        .as("priority"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("priority"), col("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("o_orderstatus", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderstatus", "rk")
  }

  val q212Sql: String =
    """WITH o AS (
         SELECT o_orderstatus, o_orderkey, o_totalprice,
                CAST((o_orderkey * 2654435761) % 1000003 + 1 AS DOUBLE)
                  / (1000004.0 * o_totalprice) AS priority
         FROM orders),
       ranked AS (
         SELECT o_orderstatus, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_orderstatus
                  ORDER BY priority, o_orderkey) AS INTEGER) AS rk
         FROM o)
       SELECT o_orderstatus, rk, o_orderkey, o_totalprice
       FROM ranked WHERE rk <= 5
       ORDER BY o_orderstatus, rk"""

  // --- q213: bitmap distinct-set intersection ----------------------------
  /** |users(a) ∩ users(b)| for every event-type pair, without ever
    * shuffling a user id twice: users are packed into fixed-width
    * bitmaps — bucket = user_id div 63, bit = user_id mod 63 (63-wide
    * so no engine hits the 1<<63 overflow guard) — one bit_or
    * aggregation builds |types|·|buckets| words, and every pairwise
    * intersection is then bit_count(a AND b) summed over buckets. The
    * exact-roaring-bitmap trick (Chambi et al. 2016) in int64 chunks:
    * the alternative count-distinct self-join shuffles the full
    * (type, user) edge list per pair; this shuffles each user bit
    * once, and the pair matrix works on words, |universe|/63 of them
    * per type, regardless of event volume. */
  def q213BitmapIntersect(s: SparkSession, dir: String): DataFrame = {
    val bm = t(s, dir, "events")
      .select(col("event_type"), (col("user_id") / 63).cast("long")
          .as("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
          .as("bit"))
      .groupBy("event_type", "bucket")
      .agg(expr("bit_or(bit)").as("bm"))
    val a = bm.select(col("event_type").as("type_a"), col("bucket"),
      col("bm").as("bm_a"))
    val b = bm.select(col("event_type").as("type_b"), col("bucket"),
      col("bm").as("bm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(sum(expr("bit_count(bm_a & bm_b)")).cast("long")
        .as("n_common_users"))
      .orderBy("type_a", "type_b")
  }

  val q213Sql: String =
    """WITH bm AS (
         SELECT event_type, user_id // 63 AS bucket,
                bit_or(1::BIGINT << CAST(user_id % 63 AS INTEGER)) AS bm
         FROM events GROUP BY 1, 2),
       pairs AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                bit_count(a.bm & b.bm) AS n
         FROM bm a JOIN bm b ON a.bucket = b.bucket
         WHERE a.event_type < b.event_type)
       SELECT type_a, type_b, CAST(sum(n) AS BIGINT) AS n_common_users
       FROM pairs GROUP BY 1, 2 ORDER BY type_a, type_b"""

  // --- q214: point-in-time (temporal) dimension lookup -------------------
  /** The read side of SCD Type 2: every order joins the dimension
    * VERSION that was valid on its order date — key equi-join plus the
    * half-open `[effective_from, effective_to)` residual. No interval
    * machinery is needed: the version chain partitions time, so the
    * equi-join's fan-out is the per-key version count (here ≤2), and
    * exactly one version survives the residual per fact row (the
    * invariant WarehouseSpec pins). The census rolls revenue cents up
    * by the AS-OF segment — facts before the 1998-06-01 re-segmentation
    * aggregate under the old segment, later facts under the new one. */
  def q214PitJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val dim = c.select(col("c_custkey"),
      col("c_mktsegment").as("segment"),
      lit("1995-01-01").cast("date").as("effective_from"),
      lit("9999-12-31").cast("date").as("effective_to"),
      lit(true).as("is_current"))
    val updates = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        concat(lit("SEG_"), (col("c_custkey") % 3).cast("string"))
          .as("segment"))
    val versioned = Scd2.applyChanges(dim, updates,
      Seq("c_custkey"), Seq("segment"), lit("1998-06-01").cast("date"))
    t(s, dir, "orders")
      .join(versioned, col("o_custkey") === col("c_custkey") &&
        col("o_orderdate") >= col("effective_from") &&
        col("o_orderdate") < col("effective_to"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .cast("long").as("cents"))
      .orderBy("segment")
  }

  val q214Sql: String =
    """WITH upd AS (
         SELECT c_custkey,
                'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS segment
         FROM customer WHERE c_custkey % 7 = 0),
       versioned AS (
         SELECT c.c_custkey, c.c_mktsegment AS segment,
                DATE '1995-01-01' AS effective_from,
                CASE WHEN u.c_custkey IS NULL OR c.c_mktsegment = u.segment
                     THEN DATE '9999-12-31' ELSE DATE '1998-06-01'
                END AS effective_to
         FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
         UNION ALL
         SELECT u.c_custkey, u.segment, DATE '1998-06-01',
                DATE '9999-12-31'
         FROM upd u JOIN customer c ON u.c_custkey = c.c_custkey
         WHERE c.c_mktsegment <> u.segment)
       SELECT v.segment, CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
       FROM orders o JOIN versioned v
         ON o.o_custkey = v.c_custkey
        AND o.o_orderdate >= v.effective_from
        AND o.o_orderdate < v.effective_to
       GROUP BY 1 ORDER BY 1"""

  // --- q215: functional-dependency audit ---------------------------------
  /** Schema-constraint discovery/validation: for each candidate
    * dependency lhs → rhs, does every lhs value map to exactly one rhs
    * value? One |distinct lhs|-row aggregation per candidate (partial
    * aggs do the heavy lifting map-side), reduced to a one-row verdict:
    * total groups, violating groups, and the worst group's distinct-rhs
    * count. The profiling primitive behind key detection, denormalized
    *-copy drift checks, and "is this column derivable" questions — at
    * 100 TB each candidate costs one column-pruned scan + one partial
    * agg, never a sort or a self-join. */
  def q215FdAudit(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def audit(lhs: String, rhs: String): DataFrame =
      o.groupBy(lhs).agg(countDistinct(rhs).as("n_rhs"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L))
            .cast("long").as("n_violating"),
          max("n_rhs").cast("long").as("max_distinct_rhs"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_groups"), col("n_violating"), col("max_distinct_rhs"))
    audit("o_orderkey", "o_custkey")
      .unionByName(audit("o_custkey", "o_orderstatus"))
      .unionByName(audit("o_custkey", "o_orderpriority"))
      .orderBy("lhs", "rhs")
  }

  val q215Sql: String =
    """WITH a AS (
         SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violating,
                CAST(max(n_rhs) AS BIGINT) AS max_distinct_rhs
         FROM (SELECT count(DISTINCT o_custkey) AS n_rhs
               FROM orders GROUP BY o_orderkey)),
       b AS (
         SELECT 'o_custkey', 'o_orderstatus',
                CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST(max(n_rhs) AS BIGINT)
         FROM (SELECT count(DISTINCT o_orderstatus) AS n_rhs
               FROM orders GROUP BY o_custkey)),
       c AS (
         SELECT 'o_custkey', 'o_orderpriority',
                CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST(max(n_rhs) AS BIGINT)
         FROM (SELECT count(DISTINCT o_orderpriority) AS n_rhs
               FROM orders GROUP BY o_custkey))
       SELECT * FROM (
         SELECT * FROM a UNION ALL SELECT * FROM b
         UNION ALL SELECT * FROM c)
       ORDER BY lhs, rhs"""

  // --- q216: Benford leading-digit audit ---------------------------------
  /** Fraud/data-quality screening via Benford's law: the leading-digit
    * distribution of order totals against the log-curve expectation,
    * with the per-digit χ² contribution. The expected shares are
    * HARD-CODED double literals (log10(1+1/d) precomputed) — the same
    * decimal text parses to the same IEEE double in both engines, so
    * no engine evaluates a transcendental and the χ² terms (subtract,
    * square, divide — single correctly-rounded ops in fixed order)
    * hash-match exactly. One integer aggregation pass; nine rows out. */
  def q216Benford(s: SparkSession, dir: String): DataFrame = {
    val benford = Seq(
      1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
      3 -> "0.12493873660829992", 4 -> "0.09691001300805642",
      5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
      7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
      9 -> "0.04575749056067514")
    val expShare = benford.tail.foldLeft(
      when(col("digit") === 1, lit(benford.head._2.toDouble))) {
        case (acc, (d, p)) => acc.when(col("digit") === d, lit(p.toDouble))
      }
    val per = t(s, dir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    per.crossJoin(broadcast(
        per.agg(sum("n_obs").cast("long").as("n_total"))))
      .select(col("digit"), col("n_obs"),
        (col("n_total").cast("double") * expShare).as("expected"))
      .withColumn("chi2_term",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) /
          col("expected"))
      .orderBy("digit")
  }

  val q216Sql: String =
    """WITH per AS (
         SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                  AS VARCHAR), 1, 1) AS INTEGER) AS digit,
                CAST(count(*) AS BIGINT) AS n_obs
         FROM orders GROUP BY 1),
       tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM per),
       e AS (
         SELECT digit, n_obs,
                CAST(n_total AS DOUBLE) *
                CASE digit
                  WHEN 1 THEN 0.3010299956639812
                  WHEN 2 THEN 0.17609125905568124
                  WHEN 3 THEN 0.12493873660829992
                  WHEN 4 THEN 0.09691001300805642
                  WHEN 5 THEN 0.07918124604762482
                  WHEN 6 THEN 0.06694678963061322
                  WHEN 7 THEN 0.05799194697768673
                  WHEN 8 THEN 0.05115252244738129
                  WHEN 9 THEN 0.04575749056067514
                END AS expected
         FROM per CROSS JOIN tot)
       SELECT digit, n_obs, expected,
              (CAST(n_obs AS DOUBLE) - expected) *
              (CAST(n_obs AS DOUBLE) - expected) / expected AS chi2_term
       FROM e ORDER BY digit"""

  // --- q217: chi-square independence (contingency table) -----------------
  /** Are event type and time-of-day independent? The χ² contingency
    * audit between two categoricals: observed cell counts vs
    * expected = row_total·col_total/n, with the per-cell χ² term.
    * All totals are exact integers from ONE aggregation pass (cells)
    * plus two window-free rollups joined back (both tiny); each
    * expected/term is then single correctly-rounded IEEE steps — the
    * q216 discipline. No float is ever SUMMED across cells (summation
    * order is the cross-engine hazard), so the table hash-matches;
    * the scalar χ² statistic is the trivial client-side sum of the
    * emitted terms. */
  def q217Chi2Independence(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_type"),
      (hour(col("ts")) >= 12).cast("int").as("pm"))
    val cells = e.groupBy("event_type", "pm")
      .agg(count(lit(1)).as("n_obs"))
    val rows = cells.groupBy("event_type")
      .agg(sum("n_obs").cast("long").as("row_total"))
    val cols = cells.groupBy("pm")
      .agg(sum("n_obs").cast("long").as("col_total"))
    val tot = cells.agg(sum("n_obs").cast("long").as("n"))
    cells.join(rows, "event_type").join(cols, "pm")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("pm"), col("n_obs"),
        ((col("row_total") * col("col_total")).cast("double") /
          col("n").cast("double")).as("expected"))
      .withColumn("chi2_term",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) /
          col("expected"))
      .orderBy("event_type", "pm")
  }

  val q217Sql: String =
    """WITH e AS (
         SELECT event_type,
                CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS pm
         FROM events),
       cells AS (
         SELECT event_type, pm, CAST(count(*) AS BIGINT) AS n_obs
         FROM e GROUP BY 1, 2),
       r AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS row_total
             FROM cells GROUP BY 1),
       c AS (SELECT pm, CAST(sum(n_obs) AS BIGINT) AS col_total
             FROM cells GROUP BY 1),
       tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM cells),
       j AS (
         SELECT cells.event_type, cells.pm, cells.n_obs,
                CAST(row_total * col_total AS DOUBLE) /
                  CAST(n AS DOUBLE) AS expected
         FROM cells JOIN r USING (event_type) JOIN c USING (pm)
              CROSS JOIN tot)
       SELECT event_type, pm, n_obs, expected,
              (CAST(n_obs AS DOUBLE) - expected) *
              (CAST(n_obs AS DOUBLE) - expected) / expected AS chi2_term
       FROM j ORDER BY event_type, pm"""

  // --- q218: majority-vote golden record (entity resolution) -------------
  /** Three conflicting source systems vote on each customer's segment
    * — the survivorship step of entity resolution / MDM consolidation.
    * Sources are derived deterministically (source 1 is truth; 2 and 3
    * corrupt every 5th / 3rd key), the golden value is the modal vote
    * with the house tie-break (ties → largest value, [[ModeAgg]]'s A4
    * discipline), and the report censuses vote strength: unanimous /
    * majority / tie-broken, with how many golden values match truth.
    * One (key, value) count aggregation + one max-struct reduce — the
    * same two-shuffle shape at any corpus size; no per-pair compare
    * join (3 sources → 3 rows per key, not 3² comparisons). */
  def q218MajorityVote(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val src1 = c.select(col("c_custkey"),
      col("c_mktsegment").as("segment"))
    val src2 = c.select(col("c_custkey"),
      when(col("c_custkey") % 5 === 0, lit("ERR2"))
        .otherwise(col("c_mktsegment")).as("segment"))
    val src3 = c.select(col("c_custkey"),
      when(col("c_custkey") % 3 === 0, lit("ERR3"))
        .otherwise(col("c_mktsegment")).as("segment"))
    val votes = src1.unionByName(src2).unionByName(src3)
    val golden = votes.groupBy("c_custkey", "segment")
      .agg(count(lit(1)).as("n_votes"))
      .groupBy("c_custkey")
      .agg(max(struct(col("n_votes"), col("segment"))).as("m"))
      .select(col("c_custkey"), col("m.segment").as("golden"),
        col("m.n_votes").as("n_votes"))
    golden.join(src1.withColumnRenamed("segment", "truth"), "c_custkey")
      .select(
        when(col("n_votes") === 3, "unanimous")
          .when(col("n_votes") === 2, "majority")
          .otherwise("tie_broken").as("vote_type"),
        when(col("golden") === col("truth"), 1L).otherwise(0L)
          .as("correct"))
      .groupBy("vote_type")
      .agg(count(lit(1)).as("n_keys"),
        sum("correct").cast("long").as("n_match_truth"))
      .orderBy("vote_type")
  }

  val q218Sql: String =
    """WITH src AS (
         SELECT c_custkey, c_mktsegment AS segment FROM customer
         UNION ALL
         SELECT c_custkey,
                CASE WHEN c_custkey % 5 = 0 THEN 'ERR2'
                     ELSE c_mktsegment END
         FROM customer
         UNION ALL
         SELECT c_custkey,
                CASE WHEN c_custkey % 3 = 0 THEN 'ERR3'
                     ELSE c_mktsegment END
         FROM customer),
       counted AS (
         SELECT c_custkey, segment, CAST(count(*) AS BIGINT) AS n_votes
         FROM src GROUP BY 1, 2),
       golden AS (
         SELECT c_custkey, segment AS golden, n_votes
         FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                 ORDER BY n_votes DESC, segment DESC) AS rn
               FROM counted)
         WHERE rn = 1),
       labeled AS (
         SELECT CASE WHEN g.n_votes = 3 THEN 'unanimous'
                     WHEN g.n_votes = 2 THEN 'majority'
                     ELSE 'tie_broken' END AS vote_type,
                CASE WHEN g.golden = c.c_mktsegment THEN 1 ELSE 0 END
                  AS correct
         FROM golden g JOIN customer c ON g.c_custkey = c.c_custkey)
       SELECT vote_type, CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(correct) AS BIGINT) AS n_match_truth
       FROM labeled GROUP BY 1 ORDER BY 1"""

  // --- q219: largest-remainder proration ---------------------------------
  /** Allocate each order's total (in cents) across its line items
    * proportionally to quantity so the parts sum EXACTLY to the whole
    * — the Hamilton / largest-remainder method every finance ETL needs
    * (floor the proportional shares, then hand the leftover cents to
    * the largest fractional remainders, ties broken by line number).
    * Pure int64 arithmetic: share = ⌊cents·qty/Σqty⌋, remainder =
    * (cents·qty) mod Σqty — no float ever appears, so allocation is
    * bit-identical on any engine and WarehouseSpec's conservation
    * invariant (Σ alloc = cents, per order, always) is exact. Windows
    * partition by order — bounded partitions, no global sort. */
  def q219Proration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val byOrder = Window.partitionBy("l_orderkey")
    val ranked = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("sum_qty", sum("qty").over(byOrder))
      .withColumn("base",
        expr("(cents * qty) div sum_qty"))
      .withColumn("rem", (col("cents") * col("qty")) % col("sum_qty"))
      .withColumn("deficit",
        (col("cents") - sum("base").over(byOrder)).cast("long"))
      .withColumn("rk", row_number().over(
        byOrder.orderBy(col("rem").desc, col("l_linenumber"),
          col("qty"))))
    ranked
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"),
        (col("base") +
          when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .cast("long").as("alloc_cents"))
      // duplicate (orderkey, linenumber) rows exist in the harness
      // data: order by every output column so the positional compare
      // cannot see a tie
      .orderBy("l_orderkey", "l_linenumber", "qty", "alloc_cents")
  }

  val q219Sql: String =
    """WITH li AS (
         SELECT l_orderkey, l_linenumber,
                CAST(l_quantity AS BIGINT) AS qty
         FROM lineitem WHERE l_orderkey % 100 = 0),
       o AS (
         SELECT o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders WHERE o_orderkey % 100 = 0),
       j AS (
         SELECT l_orderkey, l_linenumber, qty, cents,
                CAST(sum(qty) OVER (PARTITION BY l_orderkey) AS BIGINT)
                  AS sum_qty
         FROM li JOIN o ON l_orderkey = o_orderkey),
       shares AS (
         SELECT l_orderkey, l_linenumber, qty, cents,
                (cents * qty) // sum_qty AS base,
                (cents * qty) % sum_qty AS rem
         FROM j),
       ranked AS (
         SELECT *,
                cents - CAST(sum(base) OVER (PARTITION BY l_orderkey)
                  AS BIGINT) AS deficit,
                row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY rem DESC, l_linenumber, qty) AS rk
         FROM shares)
       SELECT l_orderkey, l_linenumber, qty,
              CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
       FROM ranked
       ORDER BY l_orderkey, l_linenumber, qty, alloc_cents"""

  // --- q223: FIFO lot allocation (interval-overlap matching) -------------
  /** First-in-first-out inventory costing without a sequential scan:
    * per part, "purchase" lots (even line numbers) and "sales" (odd)
    * each form a cumulative-quantity number line; FIFO matching IS the
    * interval overlap alloc(i,j) = min(Pᵢ,Sⱼ) − max(Pᵢ₋₁,Sⱼ₋₁) on
    * overlapping pairs — a per-part equi-join + range residual, pure
    * int64, no recursion, no driver loop (the classic
    * relational-FIFO rewrite). For sorted interval partitions the
    * surviving pairs number ≤ m+n−1 per part, so output is linear in
    * lines; censused per part-bucket: matched qty, unmatched sales
    * (demand beyond supply), pair count. */
  def q223FifoAllocation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem").select(col("l_partkey").as("part"),
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_quantity").cast("long").as("qty"),
      (col("l_linenumber") % 2 === 0).as("is_purchase"))
    def cumLine(purchase: Boolean) = {
      // ROWS frame + qty tie-break, both load-bearing: the harness
      // lineitem has DUPLICATE (orderkey, linenumber) rows, so the
      // default RANGE frame would hand peers the same cumulative sum
      // (overlapping intervals → phantom pairs), and without qty in
      // the order two engines may split the tie at different
      // boundaries; with it, equal-keyed rows are either qty-ordered
      // or fully interchangeable
      val w = Window.partitionBy("part").orderBy("ok", "ln", "qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.filter(col("is_purchase") === purchase)
        .withColumn("hi", sum("qty").over(w))
        .withColumn("lo", col("hi") - col("qty"))
        .select(col("part"), col("lo"), col("hi"))
    }
    val p = cumLine(purchase = true)
      .withColumnRenamed("lo", "p_lo").withColumnRenamed("hi", "p_hi")
    val sl = cumLine(purchase = false)
      .withColumnRenamed("lo", "s_lo").withColumnRenamed("hi", "s_hi")
    val matched = p.join(sl, Seq("part"))
      .filter(col("p_lo") < col("s_hi") && col("s_lo") < col("p_hi"))
      .withColumn("alloc",
        least(col("p_hi"), col("s_hi")) -
          greatest(col("p_lo"), col("s_lo")))
    val allocPer = matched.groupBy("part")
      .agg(sum("alloc").as("matched_qty"), count(lit(1)).as("n_pairs"))
    val salesPer = sl.groupBy("part")
      .agg(max("s_hi").as("sales_qty"))
    salesPer.join(allocPer, Seq("part"), "left_outer")
      .groupBy((col("part") % 50).as("part_bucket"))
      .agg(sum(coalesce(col("matched_qty"), lit(0L))).cast("long")
          .as("matched_qty"),
        sum(col("sales_qty") - coalesce(col("matched_qty"), lit(0L)))
          .cast("long").as("unmatched_sales_qty"),
        sum(coalesce(col("n_pairs"), lit(0L))).cast("long")
          .as("n_pairs"))
      .orderBy("part_bucket")
  }

  val q223Sql: String =
    """WITH li AS (
         SELECT l_partkey AS part, l_orderkey AS ok, l_linenumber AS ln,
                CAST(l_quantity AS BIGINT) AS qty,
                l_linenumber % 2 = 0 AS is_purchase
         FROM lineitem),
       p AS (
         SELECT part,
                sum(qty) OVER w - qty AS p_lo, sum(qty) OVER w AS p_hi
         FROM li WHERE is_purchase
         WINDOW w AS (PARTITION BY part ORDER BY ok, ln, qty
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       s AS (
         SELECT part,
                sum(qty) OVER w - qty AS s_lo, sum(qty) OVER w AS s_hi
         FROM li WHERE NOT is_purchase
         WINDOW w AS (PARTITION BY part ORDER BY ok, ln, qty
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       matched AS (
         SELECT p.part,
                least(p_hi, s_hi) - greatest(p_lo, s_lo) AS alloc
         FROM p JOIN s ON p.part = s.part
         WHERE p_lo < s_hi AND s_lo < p_hi),
       alloc_per AS (
         SELECT part, CAST(sum(alloc) AS BIGINT) AS matched_qty,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM matched GROUP BY part),
       sales_per AS (
         SELECT part, CAST(max(s_hi) AS BIGINT) AS sales_qty
         FROM s GROUP BY part)
       SELECT sp.part % 50 AS part_bucket,
              CAST(sum(coalesce(matched_qty, 0)) AS BIGINT)
                AS matched_qty,
              CAST(sum(sales_qty - coalesce(matched_qty, 0)) AS BIGINT)
                AS unmatched_sales_qty,
              CAST(sum(coalesce(n_pairs, 0)) AS BIGINT) AS n_pairs
       FROM sales_per sp LEFT JOIN alloc_per a ON sp.part = a.part
       GROUP BY 1 ORDER BY 1"""

  // --- q224: business-day SLA latency ------------------------------------
  /** Weekday count between order and ship date per line — the SLA
    * metric every fulfillment report needs — via the CLOSED-FORM
    * weekday counter f(d) = 5·(n div 7) + min(n mod 7, 5), n = days
    * since an anchor MONDAY (1994-12-26, before the data's range so n
    * never goes negative — truncating div vs floor div on negatives is
    * a real cross-engine trap, sidestepped structurally). No calendar
    * table join, no per-day explosion: two datediffs and integer
    * arithmetic per row, then a tiny histogram. */
  def q224BusinessDaySla(s: SparkSession, dir: String): DataFrame = {
    val j = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("n1",
        datediff(col("o_orderdate"), to_date(lit("1994-12-26"))))
      .withColumn("n2",
        datediff(col("l_shipdate"), to_date(lit("1994-12-26"))))
      .withColumn("biz_days",
        (lit(5) * expr("n2 div 7") + least(expr("n2 % 7"), lit(5))) -
          (lit(5) * expr("n1 div 7") + least(expr("n1 % 7"), lit(5))))
    j.groupBy("biz_days").agg(count(lit(1)).as("n_lines"))
      .orderBy("biz_days")
  }

  val q224Sql: String =
    """WITH j AS (
         SELECT date_diff('day', DATE '1994-12-26', o.o_orderdate)
                  AS n1,
                date_diff('day', DATE '1994-12-26', l.l_shipdate)
                  AS n2
         FROM lineitem l JOIN orders o
           ON l.l_orderkey = o.o_orderkey),
       b AS (
         SELECT (5 * (n2 // 7) + least(n2 % 7, 5)) -
                (5 * (n1 // 7) + least(n1 % 7, 5)) AS biz_days
         FROM j)
       SELECT CAST(biz_days AS INTEGER) AS biz_days,
              CAST(count(*) AS BIGINT) AS n_lines
       FROM b GROUP BY 1 ORDER BY 1"""

  // --- q225: cumulative distinct users (growth curve) --------------------
  /** Users-to-date per day — the growth metric that looks like it
    * needs a running COUNT(DISTINCT) (quadratic re-scan as a naive
    * window) but is exactly "cumulative sum of first-seen events": one
    * min-aggregation per user, one count per day, one window cumsum
    * over the day series. 100 TB shape: the distinct state never
    * materializes — each user reduces to one (user, first_day) row
    * map-side. */
  def q225CumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = t(s, dir, "events")
      .groupBy("user_id")
      .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("day"))
    firstSeen.groupBy("day").agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users",
        sum("n_new").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .orderBy("day")
  }

  val q225Sql: String =
    """WITH fs AS (
         SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
         FROM events GROUP BY 1),
       per AS (
         SELECT day, CAST(count(*) AS BIGINT) AS n_new
         FROM fs GROUP BY 1)
       SELECT day, n_new,
              CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
       FROM per ORDER BY day"""

  // --- q226: token-fingerprint clustering (OpenRefine key collision) -----
  /** The data-cleaning clustering OpenRefine made standard: canonical
    * key = distinct tokens, sorted, rejoined — names differing only in
    * token order/duplication collide on one fingerprint, and a plain
    * hash aggregation finds every cluster (no pairwise string
    * similarity, no cross join; the method's entire point at scale).
    * Report: fingerprints carrying >1 part, with how many distinct
    * raw spellings collided into each. */
  def q226FingerprintCluster(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        array_join(array_sort(array_distinct(
          split(lower(col("p_name")), " "))), " ").as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_parts"),
        countDistinct("p_name").as("n_spellings"))
      .filter(col("n_parts") > 1)
      .orderBy("fingerprint")

  val q226Sql: String =
    """WITH f AS (
         SELECT p_partkey, p_name,
                array_to_string(list_sort(list_distinct(
                  string_split(lower(p_name), ' '))), ' ')
                  AS fingerprint
         FROM part)
       SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_parts,
              CAST(count(DISTINCT p_name) AS BIGINT) AS n_spellings
       FROM f GROUP BY 1 HAVING count(*) > 1
       ORDER BY fingerprint"""

  // --- q230: Horvitz-Thompson estimate from a hash sample ----------------
  /** Can a 1/16 sample answer the revenue question? The estimator
    * audit: per order status, the EXACT cents total next to the
    * Horvitz-Thompson estimate from the q60-style deterministic hash
    * sample (inclusion p = 1/16 ⇒ estimate = 16·sample total — integer
    * arithmetic, no float inflation), with relative error as the one
    * guarded division. Membership is a pure function of the key, so
    * the estimate is reproducible and the whole audit costs two
    * aggregation passes (one over the sample, one over the truth). */
  def q230HtEstimate(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderstatus"),
      col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      ((col("o_orderkey") * 2654435761L) % 16 === 0).as("in_sample"))
    val exact = o.groupBy("o_orderstatus")
      .agg(sum("cents").cast("long").as("exact_cents"),
        count(lit(1)).as("n_rows"))
    val est = o.filter(col("in_sample"))
      .groupBy("o_orderstatus")
      .agg((sum("cents") * 16).cast("long").as("est_cents"),
        (count(lit(1)) * 16).cast("long").as("est_rows"))
    exact.join(est, Seq("o_orderstatus"), "left_outer")
      .select(col("o_orderstatus"), col("n_rows"), col("exact_cents"),
        coalesce(col("est_rows"), lit(0L)).as("est_rows"),
        coalesce(col("est_cents"), lit(0L)).as("est_cents"),
        when(col("exact_cents") > 0,
          (coalesce(col("est_cents"), lit(0L)) - col("exact_cents"))
            .cast("double") / col("exact_cents").cast("double"))
          .as("rel_err"))
      .orderBy("o_orderstatus")
  }

  val q230Sql: String =
    """WITH o AS (
         SELECT o_orderstatus, o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                (o_orderkey * 2654435761) % 16 = 0 AS in_sample
         FROM orders),
       exact AS (
         SELECT o_orderstatus,
                CAST(sum(cents) AS BIGINT) AS exact_cents,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM o GROUP BY 1),
       est AS (
         SELECT o_orderstatus,
                CAST(sum(cents) * 16 AS BIGINT) AS est_cents,
                CAST(count(*) * 16 AS BIGINT) AS est_rows
         FROM o WHERE in_sample GROUP BY 1)
       SELECT exact.o_orderstatus, n_rows, exact_cents,
              coalesce(est_rows, 0) AS est_rows,
              coalesce(est_cents, 0) AS est_cents,
              CASE WHEN exact_cents > 0 THEN
                CAST(coalesce(est_cents, 0) - exact_cents AS DOUBLE) /
                  CAST(exact_cents AS DOUBLE) END AS rel_err
       FROM exact LEFT JOIN est USING (o_orderstatus)
       ORDER BY o_orderstatus"""

  // --- q231: multi-grain rollup chain (hour → day → month) ---------------
  /** The materialized-view re-aggregation chain: hourly totals roll to
    * daily, daily to monthly — each tier aggregates the PREVIOUS
    * tier's output, never the fact table (the property that makes a
    * 100 TB metrics stack affordable: the day job reads |hours| rows,
    * the month job |days|). Integer cents make every tier
    * order-independent, so chained ≡ direct-from-raw — which is
    * exactly what the oracle checks by computing the monthly report
    * straight off the facts. */
  def q231GrainChain(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd-HH")
        .as("hour"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("cents"), count(lit(1)).as("n"))
    val daily = hourly
      .groupBy(substring(col("hour"), 1, 10).as("day"))
      .agg(sum("cents").as("cents"), sum("n").as("n"),
        count(lit(1)).as("n_hours"))
    daily
      .groupBy(substring(col("day"), 1, 7).as("month"))
      .agg(sum("cents").cast("long").as("cents"),
        sum("n").cast("long").as("n_lines"),
        sum("n_hours").cast("long").as("n_hours"),
        count(lit(1)).as("n_days"))
      .orderBy("month")
  }

  val q231Sql: String =
    """WITH hourly AS (
         SELECT strftime(l_shipdate, '%Y-%m-%d-%H') AS hour,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1),
       daily AS (
         SELECT substr(hour, 1, 10) AS day,
                CAST(sum(cents) AS BIGINT) AS cents,
                CAST(sum(n) AS BIGINT) AS n,
                CAST(count(*) AS BIGINT) AS n_hours
         FROM hourly GROUP BY 1)
       SELECT substr(day, 1, 7) AS month,
              CAST(sum(cents) AS BIGINT) AS cents,
              CAST(sum(n) AS BIGINT) AS n_lines,
              CAST(sum(n_hours) AS BIGINT) AS n_hours,
              CAST(count(*) AS BIGINT) AS n_days
       FROM daily GROUP BY 1 ORDER BY 1"""

  // --- q232: partition-layout evolution ----------------------------------
  /** A sink whose partitioning CHANGED mid-life (Iceberg's "partition
    * evolution", done manually the way plain-parquet lakehouses do):
    * history written partitioned by MONTH, the current epoch by DAY —
    * one logical table, two physical layouts. The reader unions two
    * pruned scans, each filtered in its own layout's vocabulary
    * (month-prefix vs day-range), and the census proves no row is
    * lost or doubled across the layout seam. Real writes, read back;
    * oracle = the same window straight off the facts. */
  def q232PartitionEvolution(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .as("cents"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")), "graft_pevo_")
      .toString
    try {
      val seam = "1996-07"
      // sink only the seam-spanning window: partitionBy("day") over
      // years of history is the small-files cliff itself (measured
      // 28 s at sf0.01 for ~2000 tiny directories); the layout-seam
      // semantics needs two layouts and a boundary, not the archive
      val win = li.filter(col("month") >= "1996-05" &&
        col("month") < "1996-09")
      win.filter(col("month") < seam)
        .write.partitionBy("month").parquet(s"$root/by_month")
      win.filter(col("month") >= seam)
        .write.partitionBy("day").parquet(s"$root/by_day")
      // read window [1996-05-01, 1996-09-01) spanning the seam, each
      // side pruned in its own layout's vocabulary
      val hist = s.read.parquet(s"$root/by_month")
        .filter(col("month") >= "1996-05" && col("month") < "1996-07")
      val cur = s.read.parquet(s"$root/by_day")
        .filter(col("day") >= "1996-07-01" && col("day") < "1996-09-01")
      val out = hist.select(col("month"), col("cents"))
        .unionByName(cur.select(substring(col("day"), 1, 7).as("month"),
          col("cents")))
        .groupBy("month")
        .agg(count(lit(1)).as("n_lines"),
          sum("cents").cast("long").as("cents"))
        .orderBy("month")
      val rows = out.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  val q232Sql: String =
    """WITH li AS (
         SELECT strftime(l_shipdate, '%Y-%m') AS month,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
         FROM lineitem
         WHERE strftime(l_shipdate, '%Y-%m-%d') >= '1996-05-01'
           AND strftime(l_shipdate, '%Y-%m-%d') < '1996-09-01')
       SELECT month, CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(cents) AS BIGINT) AS cents
       FROM li GROUP BY 1 ORDER BY 1"""

  // --- q233: data-subject access report (GDPR Art. 15) -------------------
  /** The subject-access-request flow completing the privacy family
    * (erasure q140, k-anonymity q145, l-diversity q184): for a probe
    * set of data subjects, what does every table hold about them?
    * One row per (subject, table) with row count and a cents checksum
    * — the auditable inventory an erasure is later verified against.
    * The probe set broadcasts; each table contributes one semi-joined
    * aggregation pass (lineitem routes through orders for its subject
    * key); nothing scans more than once. */
  def q233SubjectAccess(s: SparkSession, dir: String): DataFrame = {
    val subjects = t(s, dir, "customer")
      .filter(col("c_custkey") % 500 === 0)
      .select(col("c_custkey").as("subject"))
    val c = t(s, dir, "customer")
      .join(broadcast(subjects), col("c_custkey") === col("subject"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
          .cast("long").as("cents"))
      .select(col("subject"), lit("customer").as("table_name"),
        col("n_rows"), col("cents"))
    val o = t(s, dir, "orders")
      .join(broadcast(subjects), col("o_custkey") === col("subject"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .cast("long").as("cents"))
      .select(col("subject"), lit("orders").as("table_name"),
        col("n_rows"), col("cents"))
    val liKeys = t(s, dir, "orders")
      .join(broadcast(subjects), col("o_custkey") === col("subject"))
      .select(col("o_orderkey"), col("subject"))
    val li = t(s, dir, "lineitem")
      .join(liKeys, col("l_orderkey") === col("o_orderkey"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .cast("long").as("cents"))
      .select(col("subject"), lit("lineitem").as("table_name"),
        col("n_rows"), col("cents"))
    c.unionByName(o).unionByName(li)
      .orderBy("subject", "table_name")
  }

  val q233Sql: String =
    """WITH subjects AS (
         SELECT c_custkey AS subject FROM customer
         WHERE c_custkey % 500 = 0),
       c AS (
         SELECT subject, 'customer' AS table_name,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                  AS BIGINT) AS cents
         FROM customer JOIN subjects ON c_custkey = subject
         GROUP BY 1),
       o AS (
         SELECT subject, 'orders',
                CAST(count(*) AS BIGINT),
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT)
         FROM orders JOIN subjects ON o_custkey = subject
         GROUP BY 1),
       li AS (
         SELECT subject, 'lineitem',
                CAST(count(*) AS BIGINT),
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT)
         FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN subjects ON o_custkey = subject
         GROUP BY 1)
       SELECT * FROM (
         SELECT * FROM c UNION ALL SELECT * FROM o
         UNION ALL SELECT * FROM li)
       ORDER BY subject, table_name"""

  // --- q234: churn label generation --------------------------------------
  /** Training-label generation for a churn model: per calendar month,
    * how many users were active, and how many of those never appear in
    * the following month (the churn positive class). One distinct
    * (user, month) reduce, one self left-anti on (user, month+1) — no
    * per-user window over raw events, label cost ∝ |user-months|.
    * Month arithmetic is engine-shared (truncate + one-month add). */
  def q234ChurnLabels(s: SparkSession, dir: String): DataFrame = {
    val um = t(s, dir, "events")
      .select(col("user_id"),
        date_trunc("month", col("ts")).cast("date").as("month"))
      .distinct()
    val nxt = um.select(col("user_id"),
      add_months(col("month"), -1).as("month"))
    val labeled = um.join(nxt, Seq("user_id", "month"), "left_anti")
      .groupBy("month").agg(count(lit(1)).as("n_churned"))
    um.groupBy("month").agg(count(lit(1)).as("n_active"))
      .join(labeled, Seq("month"), "left_outer")
      .select(date_format(col("month"), "yyyy-MM").as("month"),
        col("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("month")
  }

  val q234Sql: String =
    """WITH um AS (
         SELECT DISTINCT user_id,
                CAST(date_trunc('month', ts) AS DATE) AS month
         FROM events),
       churned AS (
         SELECT a.month, CAST(count(*) AS BIGINT) AS n_churned
         FROM um a LEFT JOIN um b
           ON a.user_id = b.user_id
          AND b.month = CAST(a.month + INTERVAL 1 MONTH AS DATE)
         WHERE b.user_id IS NULL
         GROUP BY 1)
       SELECT strftime(a.month, '%Y-%m') AS month,
              CAST(count(*) AS BIGINT) AS n_active,
              coalesce(any_value(c.n_churned), 0) AS n_churned
       FROM um a LEFT JOIN churned c ON a.month = c.month
       GROUP BY a.month, c.n_churned ORDER BY 1"""

  // --- q235: deterministic negative sampling -----------------------------
  /** Recommender/contrastive training needs (user, item⁻) pairs that
    * are VERIFIED absent from the positives — for every distinct
    * (customer, part) purchase, two hash-scattered candidate parts are
    * drawn (pure key arithmetic: reproducible, no rand() handshake)
    * and anti-joined against the positive set; the census reports candidate
    * vs clean-negative counts per customer bucket, so collision loss
    * is visible, never silent. Cost:
    * one distinct reduce + one anti-join of 2|P| candidates — never a
    * |users|×|items| enumeration. */
  def q235NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    val pos = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user"),
        col("l_partkey").as("item")).distinct()
    val maxItem = t(s, dir, "part").agg(max("p_partkey").as("max_item"))
    val cands = pos.crossJoin(broadcast(maxItem))
      .select(col("user"), col("item"), col("max_item"),
        explode(array(lit(1L), lit(2L))).as("k"))
      .select(col("user"),
        (((col("user") * 7919L + col("item") * 104729L + col("k"))
          % col("max_item")) + 1L).as("item"))
    val clean = cands.join(pos, Seq("user", "item"), "left_anti")
    val nPos = pos.groupBy((col("user") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_pos"))
    val nCand = cands.groupBy((col("user") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_cand"))
    val nClean = clean.groupBy((col("user") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_clean_neg"))
    nPos.join(nCand, "bucket").join(nClean, "bucket")
      .orderBy("bucket")
  }

  val q235Sql: String =
    """WITH pos AS (
         SELECT DISTINCT o_custkey AS u, l_partkey AS item
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       mi AS (SELECT max(p_partkey) AS max_item FROM part),
       cands AS (
         SELECT u, ((u * 7919 + item * 104729 + k) % max_item) + 1
                  AS item
         FROM pos CROSS JOIN mi
              CROSS JOIN (SELECT 1 AS k UNION ALL SELECT 2)),
       clean AS (
         SELECT c.u, c.item FROM cands c
         LEFT JOIN pos p ON c.u = p.u AND c.item = p.item
         WHERE p.u IS NULL)
       SELECT pos.u % 10 AS bucket,
              CAST(count(*) AS BIGINT) AS n_pos,
              any_value(nc.n_cand) AS n_cand,
              any_value(ncl.n_clean_neg) AS n_clean_neg
       FROM pos
            JOIN (SELECT u % 10 AS bucket,
                         CAST(count(*) AS BIGINT) AS n_cand
                  FROM cands GROUP BY 1) nc ON pos.u % 10 = nc.bucket
            JOIN (SELECT u % 10 AS bucket,
                         CAST(count(*) AS BIGINT) AS n_clean_neg
                  FROM clean GROUP BY 1) ncl ON pos.u % 10 = ncl.bucket
       GROUP BY 1 ORDER BY 1"""

  // --- q236: RFM customer segmentation -----------------------------------
  /** The marketing warehouse's canonical segmentation: each customer
    * scored 1-4 on Recency (days since last order), Frequency (order
    * count) and Monetary (cents), segment = the three digits, census
    * per segment. The textbook ntile-over-everything is a
    * single-partition sort cliff; here each metric's three quartile
    * CUT POINTS come off the value histogram (q227's
    * bounded-by-value-range discipline: rank-pick at ⌈n/4⌉, ⌈n/2⌉,
    * ⌈3n/4⌉ over cumulative counts of DISTINCT values), broadcast, and
    * every customer scores map-side by comparison — no global sort
    * touches the customer table. Score = 1 + #thresholds strictly
    * below the value, mirrored verbatim in the oracle. */
  def q236RfmSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
    val maxDate = o.agg(max(col("o_orderdate")).as("max_d"))
    val rfm = o.groupBy(col("o_custkey").as("cust"))
      .agg(max("o_orderdate").as("last_d"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("monetary"))
      .crossJoin(broadcast(maxDate))
      .withColumn("recency",
        datediff(col("max_d"), col("last_d")).cast("long"))
      .select("cust", "recency", "frequency", "monetary")
    val nCust = rfm.count()
    def cuts(metric: String): Array[Long] = {
      val w = Window.orderBy(metric)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hist = rfm.groupBy(metric).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(w))
      Array(0.25, 0.5, 0.75).map { q =>
        val target = math.ceil(nCust * q).toLong
        hist.filter(col("cum") >= target)
          .agg(min(metric)).first().getLong(0)
      }
    }
    def score(metric: String, c: Array[Long]) =
      (lit(1) + when(col(metric) > c(0), 1).otherwise(0) +
        when(col(metric) > c(1), 1).otherwise(0) +
        when(col(metric) > c(2), 1).otherwise(0)).cast("int")
    val (rc, fc, mc) = (cuts("recency"), cuts("frequency"),
      cuts("monetary"))
    rfm.select(
        concat(score("recency", rc).cast("string"),
          score("frequency", fc).cast("string"),
          score("monetary", mc).cast("string")).as("segment"))
      .groupBy("segment").agg(count(lit(1)).as("n_customers"))
      .orderBy("segment")
  }

  val q236Sql: String =
    """WITH rfm AS (
         SELECT o_custkey AS cust,
                CAST(date_diff('day', max(o_orderdate),
                  (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
                  AS recency,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary
         FROM orders GROUP BY 1),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rfm),
       cuts AS (
         SELECT m.metric,
                max(CASE WHEN rk = 1 THEN v END) AS c1,
                max(CASE WHEN rk = 2 THEN v END) AS c2,
                max(CASE WHEN rk = 3 THEN v END) AS c3
         FROM (
           SELECT metric, rk,
                  min(v) FILTER (WHERE cum >= target) AS v
           FROM (
             SELECT metric, v, cum, rk,
                    CAST(ceil(n * q) AS BIGINT) AS target
             FROM (
               SELECT metric, v,
                      sum(c) OVER (PARTITION BY metric ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
               FROM (
                 SELECT 'r' AS metric, recency AS v,
                        CAST(count(*) AS BIGINT) AS c
                 FROM rfm GROUP BY 2
                 UNION ALL
                 SELECT 'f', frequency, CAST(count(*) AS BIGINT)
                 FROM rfm GROUP BY 2
                 UNION ALL
                 SELECT 'm', monetary, CAST(count(*) AS BIGINT)
                 FROM rfm GROUP BY 2))
             CROSS JOIN n
             CROSS JOIN (SELECT 1 AS rk, 0.25 AS q
                         UNION ALL SELECT 2, 0.5
                         UNION ALL SELECT 3, 0.75))
           GROUP BY metric, rk) m
         GROUP BY 1),
       scored AS (
         SELECT CAST(1 + (CASE WHEN recency > r.c1 THEN 1 ELSE 0 END)
                       + (CASE WHEN recency > r.c2 THEN 1 ELSE 0 END)
                       + (CASE WHEN recency > r.c3 THEN 1 ELSE 0 END)
                  AS VARCHAR) ||
                CAST(1 + (CASE WHEN frequency > f.c1 THEN 1 ELSE 0 END)
                       + (CASE WHEN frequency > f.c2 THEN 1 ELSE 0 END)
                       + (CASE WHEN frequency > f.c3 THEN 1 ELSE 0 END)
                  AS VARCHAR) ||
                CAST(1 + (CASE WHEN monetary > m.c1 THEN 1 ELSE 0 END)
                       + (CASE WHEN monetary > m.c2 THEN 1 ELSE 0 END)
                       + (CASE WHEN monetary > m.c3 THEN 1 ELSE 0 END)
                  AS VARCHAR) AS segment
         FROM rfm
              CROSS JOIN (SELECT c1, c2, c3 FROM cuts
                          WHERE metric = 'r') r
              CROSS JOIN (SELECT c1, c2, c3 FROM cuts
                          WHERE metric = 'f') f
              CROSS JOIN (SELECT c1, c2, c3 FROM cuts
                          WHERE metric = 'm') m)
       SELECT segment, CAST(count(*) AS BIGINT) AS n_customers
       FROM scored GROUP BY 1 ORDER BY 1"""

  // --- q237: duplicate-payment detection (1-D temporal grid join) --------
  /** The fraud/reconciliation classic: same payer, same amount, two
    * order dates within 7 days — suspected double charge. [[GridJoin]]
    * in one dimension: bucket = epoch-day div 7 on the (payer, cents)
    * key line, one side replicated to ±1 buckets, equi-join +
    * |Δdays| ≤ 7 residual, keys ordered to emit each pair once.
    * Candidates are confined to exact (payer, cents) collisions per
    * bucket — never a time-window self-join of the full table. */
  def q237DuplicatePayments(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      datediff(col("o_orderdate"), to_date(lit("1990-01-01")))
        .cast("long").as("day"))
    val a = o.withColumn("bucket", expr("day div 7"))
    val b = o.withColumn("nb", explode(array(lit(-1L), lit(0L),
        lit(1L))))
      .withColumn("bucket", expr("day div 7") + col("nb")).drop("nb")
    a.as("a").join(b.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
        col("a.cents") === col("b.cents") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.o_orderkey") < col("b.o_orderkey"))
      .filter(abs(col("a.day") - col("b.day")) <= 7)
      .select(col("a.o_custkey").as("payer"), col("a.cents").as("cents"),
        col("a.o_orderkey").as("order_a"),
        col("b.o_orderkey").as("order_b"),
        abs(col("a.day") - col("b.day")).as("gap_days"))
      .orderBy("payer", "cents", "order_a", "order_b")
  }

  val q237Sql: String =
    """WITH o AS (
         SELECT o_orderkey, o_custkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                CAST(date_diff('day', DATE '1990-01-01', o_orderdate)
                  AS BIGINT) AS day
         FROM orders)
       SELECT a.o_custkey AS payer, a.cents AS cents,
              a.o_orderkey AS order_a, b.o_orderkey AS order_b,
              abs(a.day - b.day) AS gap_days
       FROM o a JOIN o b
         ON a.o_custkey = b.o_custkey AND a.cents = b.cents
        AND a.o_orderkey < b.o_orderkey
        AND abs(a.day - b.day) <= 7
       ORDER BY payer, cents, order_a, order_b"""

  // --- q238: as-of join with tolerance -----------------------------------
  /** [[graft.operators.AsofJoin.asofBackward]] plus the matching-gap
    * bound every market-data join carries (DuckDB ASOF has no native
    * tolerance — the oracle nulls stale matches with a CASE, this side
    * nulls them the same way): each event takes the latest prior
    * same-user 'view' within 30 minutes; older matches are STALE and
    * yield nulls, not silently-wrong joins. The census counts matched /
    * stale / unmatched purchases — the three-way outcome a tolerance
    * join must distinguish. */
  def q238AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "v_ts").orderBy(col("v_id").desc)))
      .filter(col("rn") === 1).drop("rn")
    val joined = graft.operators.AsofJoin.asofBackward(purchases, views,
      "user_id", leftTs = "p_ts", rightTs = "v_ts",
      valueCols = Seq("v_id", "v_ts"))
    val fresh = col("v_ts").isNotNull &&
      col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES")
    joined.select(
        when(col("v_ts").isNull, "unmatched")
          .when(!fresh, "stale").otherwise("matched").as("outcome"))
      .groupBy("outcome").agg(count(lit(1)).as("n_purchases"))
      .orderBy("outcome")
  }

  val q238Sql: String =
    """WITH p AS (
         SELECT event_id, user_id, ts AS p_ts
         FROM events WHERE event_type = 'purchase'),
       v AS (
         SELECT user_id, ts AS v_ts, event_id AS v_id
         FROM events WHERE event_type = 'view'
         QUALIFY row_number() OVER (PARTITION BY user_id, ts
           ORDER BY event_id DESC) = 1),
       j AS (
         SELECT p.event_id, p.p_ts, v.v_ts
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.p_ts >= v.v_ts),
       labeled AS (
         SELECT CASE WHEN v_ts IS NULL THEN 'unmatched'
                     WHEN v_ts < p_ts - INTERVAL 30 MINUTE THEN 'stale'
                     ELSE 'matched' END AS outcome
         FROM j)
       SELECT outcome, CAST(count(*) AS BIGINT) AS n_purchases
       FROM labeled GROUP BY 1 ORDER BY 1"""

  // --- q239: bitemporal as-known-at query --------------------------------
  /** Bitemporal versioning (Snodgrass): every dimension row carries
    * VALID time (when the fact was true in the world) and TRANSACTION
    * time (when the warehouse learned it) — corrections rewrite
    * history along the second axis without erasing what reports used
    * to say. The fixture: segments valid from 1995/1998 as first
    * recorded, plus a CORRECTION (recorded 1999-01-01) that backdates
    * every 11th customer's 1998 segment. The query answers the audit
    * question: "the 1997-06-01 segment census, as the warehouse knew
    * it on 1998-06-01 vs as it knows it now" — two point lookups,
    * each one key join + two interval residuals, fan-out bounded by
    * versions per key. */
  def q239Bitemporal(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val eot = lit("9999-12-31").cast("date")
    // original belief: one version valid [1995-01-01, ∞), recorded
    // 1995-01-01
    val v0 = c.select(col("c_custkey"),
      col("c_mktsegment").as("segment"),
      lit("1995-01-01").cast("date").as("valid_from"), eot.as("valid_to"),
      lit("1995-01-01").cast("date").as("tx_from"),
      when(col("c_custkey") % 11 === 0,
        lit("1999-01-01").cast("date")).otherwise(eot).as("tx_to"))
    // correction recorded 1999-01-01: every 11th customer's segment was
    // RETRO_X since 1996-01-01 (supersedes v0 for those keys)
    val corr = c.filter(col("c_custkey") % 11 === 0)
    val v1a = corr.select(col("c_custkey"),
      col("c_mktsegment").as("segment"),
      lit("1995-01-01").cast("date").as("valid_from"),
      lit("1996-01-01").cast("date").as("valid_to"),
      lit("1999-01-01").cast("date").as("tx_from"), eot.as("tx_to"))
    val v1b = corr.select(col("c_custkey"),
      concat(lit("RETRO_"), (col("c_custkey") % 2).cast("string"))
        .as("segment"),
      lit("1996-01-01").cast("date").as("valid_from"), eot.as("valid_to"),
      lit("1999-01-01").cast("date").as("tx_from"), eot.as("tx_to"))
    val dim = v0.unionByName(v1a).unionByName(v1b)
    def asKnownAt(txAt: String, validAt: String, label: String) =
      dim.filter(col("tx_from") <= lit(txAt).cast("date") &&
          col("tx_to") > lit(txAt).cast("date") &&
          col("valid_from") <= lit(validAt).cast("date") &&
          col("valid_to") > lit(validAt).cast("date"))
        .groupBy("segment").agg(count(lit(1)).as("n"))
        .select(lit(label).as("as_known"), col("segment"), col("n"))
    asKnownAt("1998-06-01", "1997-06-01", "then")
      .unionByName(asKnownAt("2026-01-01", "1997-06-01", "now"))
      .orderBy("as_known", "segment")
  }

  val q239Sql: String =
    """WITH v0 AS (
         SELECT c_custkey, c_mktsegment AS segment,
                DATE '1995-01-01' AS valid_from,
                DATE '9999-12-31' AS valid_to,
                DATE '1995-01-01' AS tx_from,
                CASE WHEN c_custkey % 11 = 0 THEN DATE '1999-01-01'
                     ELSE DATE '9999-12-31' END AS tx_to
         FROM customer),
       v1a AS (
         SELECT c_custkey, c_mktsegment,
                DATE '1995-01-01', DATE '1996-01-01',
                DATE '1999-01-01', DATE '9999-12-31'
         FROM customer WHERE c_custkey % 11 = 0),
       v1b AS (
         SELECT c_custkey,
                'RETRO_' || CAST(c_custkey % 2 AS VARCHAR),
                DATE '1996-01-01', DATE '9999-12-31',
                DATE '1999-01-01', DATE '9999-12-31'
         FROM customer WHERE c_custkey % 11 = 0),
       dim AS (
         SELECT * FROM v0 UNION ALL SELECT * FROM v1a
         UNION ALL SELECT * FROM v1b),
       census AS (
         SELECT 'then' AS as_known, segment,
                CAST(count(*) AS BIGINT) AS n
         FROM dim
         WHERE tx_from <= DATE '1998-06-01'
           AND tx_to > DATE '1998-06-01'
           AND valid_from <= DATE '1997-06-01'
           AND valid_to > DATE '1997-06-01'
         GROUP BY 2
         UNION ALL
         SELECT 'now', segment, CAST(count(*) AS BIGINT)
         FROM dim
         WHERE tx_from <= DATE '2026-01-01'
           AND tx_to > DATE '2026-01-01'
           AND valid_from <= DATE '1997-06-01'
           AND valid_to > DATE '1997-06-01'
         GROUP BY 2)
       SELECT * FROM census ORDER BY as_known, segment"""

  // --- q240: diversified top-k (group quotas) ----------------------------
  /** Search-style diversified ranking: the 10 highest-value orders
    * overall, but NO customer segment may contribute more than 2 —
    * the result-diversification rule every feed/search ranker applies.
    * Two WindowGroupLimit tiers: rank-within-segment ≤ 2 first (k·P
    * rows survive map-side), then global top-10 via
    * TakeOrderedAndProject — the full table is never globally
    * sorted. */
  def q240DiversifiedTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    o.withColumn("seg_rank", row_number().over(Window
        .partitionBy("segment")
        .orderBy(col("cents").desc, col("o_orderkey"))))
      .filter(col("seg_rank") <= 2)
      .orderBy(col("cents").desc, col("o_orderkey"))
      .limit(10)
      .select("segment", "seg_rank", "o_orderkey", "cents")
      .orderBy(col("cents").desc, col("o_orderkey"))
  }

  val q240Sql: String =
    """WITH o AS (
         SELECT c_mktsegment AS segment, o_orderkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey),
       ranked AS (
         SELECT segment, o_orderkey, cents,
                CAST(row_number() OVER (PARTITION BY segment
                  ORDER BY cents DESC, o_orderkey) AS INTEGER)
                  AS seg_rank
         FROM o)
       SELECT segment, seg_rank, o_orderkey, cents
       FROM ranked WHERE seg_rank <= 2
       ORDER BY cents DESC, o_orderkey LIMIT 10"""

  // --- q241: conformal prediction interval calibration -------------------
  /** Split-conformal calibration (Vovk; the distribution-free ML-eval
    * standard): fit the exact-moment OLS price model on the TRAIN
    * split (q125's DECIMAL discipline), take the calibration split's
    * absolute residuals, and pick q̂ = the ⌈0.9·(n+1)⌉-th smallest —
    * an exact rank-pick off the residual HISTOGRAM (q227 discipline),
    * in integer cents·denominator space so no float rank boundary
    * exists. The report: q̂ (scaled back to cents, one division) and
    * the TEST-split coverage — the fraction of held-out rows whose
    * truth lands inside ±q̂, which conformal theory promises ≥ 90%.
    * Splits are hash-deterministic; every stage is one aggregation
    * or one broadcast join. */
  def q241Conformal(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val li = t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long").as("x"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"),
      pmod(col("l_orderkey") * 2654435761L + col("l_linenumber"),
        lit(3L)).as("split"))
    val m = li.filter(col("split") === 0)
      .select(col("x").cast(dec).as("xd"), col("y").cast(dec).as("yd"))
      .agg(count(lit(1)).cast(dec).as("n"), sum("xd").as("sx"),
        sum("yd").as("sy"), sum(col("xd") * col("xd")).as("sxx"),
        sum(col("xd") * col("yd")).as("sxy"))
      // slope = num/den exact decimals; keep both so residuals stay
      // integer-exact: r = |y·den − (num·x + b_num)| with
      // b_num = (sy·den − num·sx)/n … carried as decimals
      .select(col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        col("sx"), col("sy"))
    val withRes = li.filter(col("split") =!= 0)
      .crossJoin(broadcast(m))
      // n·den·y − (n·num·x + n·b_num·…) collapses to the integer form
      // n·den·y − n·num·x − (sy·den − num·sx): all decimal-exact
      .withColumn("resid",
        abs(col("n") * col("den") * col("y").cast(dec) -
          col("n") * col("num") * col("x").cast(dec) -
          (col("sy") * col("den") - col("num") * col("sx"))))
    val calib = withRes.filter(col("split") === 1)
    val nCal = calib.count()
    val target = math.ceil(0.9 * (nCal + 1)).toLong
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("resid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhatRow = calib.groupBy("resid").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .filter(col("cum") >= target)
      .agg(min("resid").as("qhat"))
    val test = withRes.filter(col("split") === 2)
      .crossJoin(broadcast(qhatRow))
    test.agg(count(lit(1)).as("n_test"),
        sum(when(col("resid") <= col("qhat"), 1L).otherwise(0L))
          .cast("long").as("n_covered"))
      .crossJoin(broadcast(qhatRow))
      .crossJoin(broadcast(m.select(col("n"), col("den"))))
      .select(col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") /
          col("n_test").cast("double")).as("coverage"),
        (col("qhat").cast("double") /
          (col("n") * col("den")).cast("double")).as("qhat_cents"))
  }

  val q241Sql: String =
    """WITH li AS (
         SELECT l_orderkey, l_linenumber,
                CAST(l_quantity AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
                ((l_orderkey * 2654435761 + l_linenumber) % 3 + 3) % 3
                  AS split
         FROM lineitem),
       m AS (
         SELECT CAST(count(*) AS HUGEINT) AS n,
                CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) *
                  CAST(y AS HUGEINT)) - sum(CAST(x AS HUGEINT)) *
                  sum(CAST(y AS HUGEINT)) AS num,
                CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) *
                  CAST(x AS HUGEINT)) - sum(CAST(x AS HUGEINT)) *
                  sum(CAST(x AS HUGEINT)) AS den,
                sum(CAST(x AS HUGEINT)) AS sx,
                sum(CAST(y AS HUGEINT)) AS sy
         FROM li WHERE split = 0),
       wr AS (
         SELECT split,
                abs(n * den * CAST(y AS HUGEINT) -
                    n * num * CAST(x AS HUGEINT) -
                    (sy * den - num * sx)) AS resid
         FROM li CROSS JOIN m WHERE split <> 0),
       nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM wr
              WHERE split = 1),
       qh AS (
         SELECT min(resid) AS qhat FROM (
           SELECT resid,
                  sum(c) OVER (ORDER BY resid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM (SELECT resid, CAST(count(*) AS BIGINT) AS c
                 FROM wr WHERE split = 1 GROUP BY 1))
         CROSS JOIN nc
         WHERE cum >= CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT))
       SELECT CAST(count(*) AS BIGINT) AS n_test,
              CAST(sum(CASE WHEN resid <= qhat THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
              CAST(sum(CASE WHEN resid <= qhat THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage,
              CAST(any_value(qhat) AS DOUBLE) /
                CAST(any_value(n * den) AS DOUBLE) AS qhat_cents
       FROM wr CROSS JOIN qh CROSS JOIN m
       WHERE split = 2"""

  // --- q242: two-threshold hysteresis alerting ---------------------------
  /** Monitoring's debounce standard: an alert RAISES when the hourly
    * event rate crosses above `hi` and CLEARS only when it falls below
    * `lo` — the two-threshold hysteresis that stops flapping. The
    * sequential state machine is rewritten relationally: a row's alarm
    * state is decided by its MOST RECENT crossing (last_value of the
    * crossing direction over the time order, ignoring nulls) — one
    * window pass over exact integer counts, no recursion. Report: per
    * event type, hours in alarm, number of raises, and the first raise
    * hour. */
  def q242HysteresisAlerts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hi = 25L; val lo = 15L
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd-HH").as("hour"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val state = hourly
      .withColumn("crs",
        when(col("c") > hi, lit(1)).when(col("c") < lo, lit(0)))
      .withColumn("alarm",
        coalesce(last("crs", ignoreNulls = true).over(w), lit(0)))
      .withColumn("prev_alarm",
        coalesce(lag("alarm", 1).over(
          Window.partitionBy("event_type").orderBy("hour")), lit(0)))
    state.groupBy("event_type")
      .agg(sum("alarm").cast("long").as("hours_in_alarm"),
        sum(when(col("alarm") === 1 && col("prev_alarm") === 0, 1L)
          .otherwise(0L)).cast("long").as("n_raises"),
        min(when(col("alarm") === 1, col("hour")))
          .as("first_alarm_hour"))
      .orderBy("event_type")
  }

  val q242Sql: String =
    """WITH hourly AS (
         SELECT event_type, strftime(ts, '%Y-%m-%d-%H') AS hour,
                CAST(count(*) AS BIGINT) AS c
         FROM events GROUP BY 1, 2),
       crossed AS (
         SELECT *, CASE WHEN c > 25 THEN 1
                        WHEN c < 15 THEN 0 END AS crs
         FROM hourly),
       st AS (
         SELECT event_type, hour,
                coalesce(last_value(crs IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                  AS alarm
         FROM crossed),
       st2 AS (
         SELECT *, coalesce(lag(alarm, 1) OVER (
                  PARTITION BY event_type ORDER BY hour), 0)
                  AS prev_alarm
         FROM st)
       SELECT event_type,
              CAST(sum(alarm) AS BIGINT) AS hours_in_alarm,
              CAST(sum(CASE WHEN alarm = 1 AND prev_alarm = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_raises,
              min(CASE WHEN alarm = 1 THEN hour END)
                AS first_alarm_hour
       FROM st2 GROUP BY 1 ORDER BY 1"""

  // --- q243: restatement-aware aggregates --------------------------------
  /** Financial restatements: facts arrive, then corrected VERSIONS of
    * the same fact arrive later — reports must show the latest
    * restatement, and auditors want the restatement IMPACT (latest vs
    * originally-reported, per period). Versions are synthesized
    * deterministically (every 9th order restated once at +500 cents,
    * every 81st twice at +700 total); latest-wins is one max-struct
    * reduce per key (A4 discipline, no window over raw versions), and
    * the impact report is two integer aggregates joined — original
    * cents, restated cents, net drift. */
  def q243RestatementImpact(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy").as("year"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val v0 = o.select(col("o_orderkey"), col("year"), col("cents"),
      lit(0L).as("rev"))
    val v1 = o.filter(col("o_orderkey") % 9 === 0)
      .select(col("o_orderkey"), col("year"),
        (col("cents") + 500L).as("cents"), lit(1L).as("rev"))
    val v2 = o.filter(col("o_orderkey") % 81 === 0)
      .select(col("o_orderkey"), col("year"),
        (col("cents") + 700L).as("cents"), lit(2L).as("rev"))
    val versions = v0.unionByName(v1).unionByName(v2)
    val latest = versions.groupBy("o_orderkey", "year")
      .agg(max(struct(col("rev"), col("cents"))).as("m"))
      .select(col("year"), col("m.cents").as("cents"))
    val orig = versions.filter(col("rev") === 0)
      .groupBy("year").agg(sum("cents").cast("long").as("orig_cents"))
    latest.groupBy("year")
      .agg(sum("cents").cast("long").as("restated_cents"),
        count(lit(1)).as("n_orders"))
      .join(orig, "year")
      .withColumn("drift_cents",
        col("restated_cents") - col("orig_cents"))
      .select("year", "n_orders", "orig_cents", "restated_cents",
        "drift_cents")
      .orderBy("year")
  }

  val q243Sql: String =
    """WITH o AS (
         SELECT o_orderkey, strftime(o_orderdate, '%Y') AS year,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
       versions AS (
         SELECT o_orderkey, year, cents, 0 AS rev FROM o
         UNION ALL
         SELECT o_orderkey, year, cents + 500, 1 FROM o
         WHERE o_orderkey % 9 = 0
         UNION ALL
         SELECT o_orderkey, year, cents + 700, 2 FROM o
         WHERE o_orderkey % 81 = 0),
       latest AS (
         SELECT year, cents FROM (
           SELECT year, cents, row_number() OVER (
             PARTITION BY o_orderkey, year
             ORDER BY rev DESC, cents DESC) AS rn
           FROM versions)
         WHERE rn = 1),
       orig AS (
         SELECT year, CAST(sum(cents) AS BIGINT) AS orig_cents
         FROM versions WHERE rev = 0 GROUP BY 1)
       SELECT latest.year, CAST(count(*) AS BIGINT) AS n_orders,
              any_value(orig_cents) AS orig_cents,
              CAST(sum(cents) AS BIGINT) AS restated_cents,
              CAST(sum(cents) AS BIGINT) - any_value(orig_cents)
                AS drift_cents
       FROM latest JOIN orig ON latest.year = orig.year
       GROUP BY 1 ORDER BY 1"""

  // --- q244: SLA burn-rate alerting (multi-window) -----------------------
  /** Google-SRE burn-rate alerting: with an error budget of 2% bad
    * events, page when the short window (1 h) burns ≥ 10× budget AND
    * the long window (6 h) confirms ≥ 5× — the two-window AND that
    * filters blips without missing real burns. "Bad" = deterministic
    * rule (error event type). Rates stay RATIONAL: burn ≥ k·budget is
    * checked as 50·bad ≥ k·total in integers (budget 2% ⇒ 1/50), so
    * no float ratio exists anywhere. Rolling sums are ROWS-frame
    * windows over the dense hourly grid. */
  def q244BurnRate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd-HH").as("hour"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("bad"))
    val w1 = Window.orderBy("hour").rowsBetween(0, 0)
    val w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    val rates = hourly
      .withColumn("bad1", sum("bad").over(w1))
      .withColumn("tot1", sum("total").over(w1))
      .withColumn("bad6", sum("bad").over(w6))
      .withColumn("tot6", sum("total").over(w6))
      .withColumn("page",
        col("bad1") * 50L >= col("tot1") * 10L &&
          col("bad6") * 50L >= col("tot6") * 5L)
    rates.agg(count(lit(1)).as("n_hours"),
      sum(when(col("page"), 1L).otherwise(0L)).cast("long")
        .as("n_paging_hours"),
      min(when(col("page"), col("hour"))).as("first_page_hour"),
      sum("bad").cast("long").as("total_bad"),
      sum("total").cast("long").as("total_events"))
  }

  val q244Sql: String =
    """WITH hourly AS (
         SELECT strftime(ts, '%Y-%m-%d-%H') AS hour,
                CAST(count(*) AS BIGINT) AS total,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                  END) AS BIGINT) AS bad
         FROM events GROUP BY 1),
       rates AS (
         SELECT hour, total, bad,
                bad AS bad1, total AS tot1,
                sum(bad) OVER w6 AS bad6, sum(total) OVER w6 AS tot6
         FROM hourly
         WINDOW w6 AS (ORDER BY hour
           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
       flagged AS (
         SELECT *, (bad1 * 50 >= tot1 * 10 AND bad6 * 50 >= tot6 * 5)
                  AS page
         FROM rates)
       SELECT CAST(count(*) AS BIGINT) AS n_hours,
              CAST(sum(CASE WHEN page THEN 1 ELSE 0 END) AS BIGINT)
                AS n_paging_hours,
              min(CASE WHEN page THEN hour END) AS first_page_hour,
              CAST(sum(bad) AS BIGINT) AS total_bad,
              CAST(sum(total) AS BIGINT) AS total_events
       FROM flagged"""

  // --- q245: generic column profiler -------------------------------------
  /** The data-profiling report every onboarding pipeline runs first:
    * one row per column with null count, distinct count, min/max (as
    * strings), and the tie-broken modal value — assembled from one
    * aggregation pass per column plus the A4 max-struct mode. Numeric
    * render goes through an integer cents cast so min/max strings are
    * engine-identical (double→string formatting is NOT portable —
    * the one formatting trap this report has to dodge). */
  def q245Profile(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_orderstatus"),
      col("o_orderpriority"),
      expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)")
        .as("o_totalprice_cents"))
    def profile(c: String): DataFrame = {
      val mode = o.filter(col(c).isNotNull)
        .groupBy(col(c).as("v")).agg(count(lit(1)).as("f"))
        .agg(max(struct(col("f"), col("v"))).as("m"))
        .select(col("m.v").as("top_value"), col("m.f").as("top_freq"))
      o.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
            .as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).as("min_str"), max(col(c)).as("max_str"))
        .crossJoin(mode)
        .select(lit(c).as("column_name"), col("n_rows"),
          col("n_nulls"), col("n_distinct"), col("min_str"),
          col("max_str"), col("top_value"), col("top_freq"))
    }
    Seq("o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice_cents")
      .map(profile).reduce(_ unionByName _)
      .orderBy("column_name")
  }

  val q245Sql: String =
    """WITH o AS (
         SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
                o_orderstatus, o_orderpriority,
                CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                  AS VARCHAR) AS o_totalprice_cents
         FROM orders),
       u AS (
         SELECT 'o_orderkey' AS column_name, o_orderkey AS v FROM o
         UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM o
         UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM o
         UNION ALL SELECT 'o_totalprice_cents', o_totalprice_cents
         FROM o),
       base AS (
         SELECT column_name, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_nulls,
                CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                min(v) AS min_str, max(v) AS max_str
         FROM u GROUP BY 1),
       modal AS (
         SELECT column_name, v AS top_value,
                CAST(f AS BIGINT) AS top_freq
         FROM (
           SELECT column_name, v, f, row_number() OVER (
             PARTITION BY column_name ORDER BY f DESC, v DESC) AS rn
           FROM (SELECT column_name, v, count(*) AS f FROM u
                 WHERE v IS NOT NULL GROUP BY 1, 2))
         WHERE rn = 1)
       SELECT base.column_name, n_rows, n_nulls, n_distinct,
              min_str, max_str, top_value, top_freq
       FROM base JOIN modal USING (column_name)
       ORDER BY column_name"""

  // --- q308: drill-across two-fact conformed report ---------------------
  /** Drill-across: one report combining measures from TWO fact tables
    * (orders revenue, events activity) at their shared conformed grain
    * — the customer's nation. Kimball's rule, kept literally: each
    * fact aggregates to the conformed grain SEPARATELY (two
    * independent star rollups, one shuffle each, dimensions
    * broadcast), and only the nation-sized summaries full-outer merge
    * — facts never meet at row grain, where the orders×events fan-out
    * would be quadratic per customer and semantically wrong (double
    * counting both measures). The events/orders rate divides under a
    * q148-style degenerate guard, mirrored as CASE in the oracle. */
  def q308DrillAcross(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    val c = t(s, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val ordersSide = t(s, dir, "orders")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .cast("long").as("order_cents"))
    val eventsSide = t(s, dir, "events")
      .join(broadcast(c), col("user_id") === col("c_custkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_active_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)"))
          .cast("long").as("event_value_cents"))
    ordersSide.join(eventsSide, Seq("n_name"), "full_outer")
      .select(col("n_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("order_cents"), lit(0L)).as("order_cents"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_active_users"), lit(0L)).as("n_active_users"),
        coalesce(col("event_value_cents"), lit(0L))
          .as("event_value_cents"))
      .withColumn("events_per_order",
        when(col("n_orders") > 0L,
          col("n_events").cast("double") /
            col("n_orders").cast("double")))
      .orderBy("n_name")
  }

  lazy val q308Sql: String =
    """WITH c AS (
         SELECT c_custkey, n_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey),
       os AS (
         SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS order_cents
         FROM orders JOIN c ON o_custkey = c_custkey
         GROUP BY 1),
       es AS (
         SELECT n_name, CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT user_id) AS BIGINT)
                  AS n_active_users,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS event_value_cents
         FROM events JOIN c ON user_id = c_custkey
         GROUP BY 1)
       SELECT coalesce(os.n_name, es.n_name) AS n_name,
              coalesce(n_orders, 0) AS n_orders,
              coalesce(order_cents, 0) AS order_cents,
              coalesce(n_events, 0) AS n_events,
              coalesce(n_active_users, 0) AS n_active_users,
              coalesce(event_value_cents, 0) AS event_value_cents,
              CASE WHEN coalesce(n_orders, 0) > 0
                THEN CAST(coalesce(n_events, 0) AS DOUBLE) /
                     CAST(n_orders AS DOUBLE) END AS events_per_order
       FROM os FULL OUTER JOIN es ON os.n_name = es.n_name
       ORDER BY 1"""

  val all: Map[String, Q] = Map(
    "q308_drill_across" -> q308DrillAcross _,
    "q210_scd2" -> q210Scd2 _,
    "q211_grid_join" -> q211GridJoin _,
    "q212_weighted_sample" -> q212WeightedSample _,
    "q213_bitmap_intersect" -> q213BitmapIntersect _,
    "q214_pit_join" -> q214PitJoin _,
    "q215_fd_audit" -> q215FdAudit _,
    "q216_benford" -> q216Benford _,
    "q217_chi2_independence" -> q217Chi2Independence _,
    "q218_majority_vote" -> q218MajorityVote _,
    "q219_proration" -> q219Proration _,
    "q223_fifo_allocation" -> q223FifoAllocation _,
    "q224_business_day_sla" -> q224BusinessDaySla _,
    "q225_cumulative_users" -> q225CumulativeUsers _,
    "q226_fingerprint_cluster" -> q226FingerprintCluster _,
    "q230_ht_estimate" -> q230HtEstimate _,
    "q231_grain_chain" -> q231GrainChain _,
    "q232_partition_evolution" -> q232PartitionEvolution _,
    "q233_subject_access" -> q233SubjectAccess _,
    "q234_churn_labels" -> q234ChurnLabels _,
    "q235_negative_sampling" -> q235NegativeSampling _,
    "q236_rfm_segments" -> q236RfmSegments _,
    "q237_duplicate_payments" -> q237DuplicatePayments _,
    "q238_asof_tolerance" -> q238AsofTolerance _,
    "q239_bitemporal" -> q239Bitemporal _,
    "q240_diversified_topk" -> q240DiversifiedTopk _,
    "q241_conformal" -> q241Conformal _,
    "q242_hysteresis_alerts" -> q242HysteresisAlerts _,
    "q243_restatement_impact" -> q243RestatementImpact _,
    "q244_burn_rate" -> q244BurnRate _,
    "q245_profile" -> q245Profile _,
    "q263_record_linkage" -> q263RecordLinkage _,
    "q285_shift_allocation" -> q285ShiftAllocation _,
    "q288_fk_integrity" -> q288FkIntegrity _,
    "q293_supplier_hhi" -> q293SupplierHhi _,
    "q287_partition_advisor" -> q287PartitionAdvisor _,
  )

  val oracles: Map[String, String] = Map(
    "q308_drill_across" -> q308Sql,
    "q210_scd2" -> q210Sql,
    "q211_grid_join" -> q211Sql,
    "q212_weighted_sample" -> q212Sql,
    "q213_bitmap_intersect" -> q213Sql,
    "q214_pit_join" -> q214Sql,
    "q215_fd_audit" -> q215Sql,
    "q216_benford" -> q216Sql,
    "q217_chi2_independence" -> q217Sql,
    "q218_majority_vote" -> q218Sql,
    "q219_proration" -> q219Sql,
    "q223_fifo_allocation" -> q223Sql,
    "q224_business_day_sla" -> q224Sql,
    "q225_cumulative_users" -> q225Sql,
    "q226_fingerprint_cluster" -> q226Sql,
    "q230_ht_estimate" -> q230Sql,
    "q231_grain_chain" -> q231Sql,
    "q232_partition_evolution" -> q232Sql,
    "q233_subject_access" -> q233Sql,
    "q234_churn_labels" -> q234Sql,
    "q235_negative_sampling" -> q235Sql,
    "q236_rfm_segments" -> q236Sql,
    "q237_duplicate_payments" -> q237Sql,
    "q238_asof_tolerance" -> q238Sql,
    "q239_bitemporal" -> q239Sql,
    "q240_diversified_topk" -> q240Sql,
    "q241_conformal" -> q241Sql,
    "q242_hysteresis_alerts" -> q242Sql,
    "q243_restatement_impact" -> q243Sql,
    "q244_burn_rate" -> q244Sql,
    "q245_profile" -> q245Sql,
    "q263_record_linkage" -> q263Sql,
    "q285_shift_allocation" -> q285Sql,
    "q288_fk_integrity" -> q288Sql,
    "q293_supplier_hhi" -> q293Sql,
    "q287_partition_advisor" -> q287Sql,
  )

  // --- q263: probabilistic record linkage scorecard ---------------------
  // --- q285: interval×interval overlap allocation (downtime per shift) -
  /** Machine-seconds lost per SHIFT: each event opens a downtime
    * interval (q252's construction), the calendar provides three fixed
    * 8-hour shifts per day, and every downtime second is allocated to
    * the shift it falls in — the interval-INTERSECTION join behind
    * utilization, billing, and SLA allocation. Scale shape: an
    * interval is first CROPPED to the days it covers (explode over its
    * own day span — data-shaped, ≤ 2 rows here), then joined to
    * shifts by DAY equality — the q91 bucket-equi decomposition, no
    * inequality-only join ever reaches the planner. Overlap math is
    * exact epoch-micros; events are independent, so concurrent
    * downtimes allocate independently (machine-seconds, not wall
    * coverage — q252 is the union-length complement). */
  def q285ShiftAllocation(s: SparkSession, dir: String): DataFrame = {
    // Sources.table, not the bare local reader: unix_micros needs the
    // normalized TimestampType the harness-read path guarantees
    val iv = graft.io.Sources.table(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          (expr("CAST(round(value * 100) AS BIGINT)") % 7200L + 60L) *
            1000000L).as("en"))
    val dayUs = 86400000000L
    val cropped = iv
      .select(col("event_id"), col("st"), col("en"),
        explode(sequence(
          (col("st") / dayUs).cast("long"),
          ((col("en") - 1L) / dayUs).cast("long"))).as("day"))
      .select(col("event_id"), col("day"),
        greatest(col("st"), col("day") * dayUs).as("cs"),
        least(col("en"), (col("day") + 1L) * dayUs).as("ce"))
    val shifts = cropped.select(col("day")).distinct()
      .select(col("day"), explode(sequence(lit(0L), lit(2L))).as("sh"))
      .select(col("day"), col("sh"),
        (col("day") * dayUs + col("sh") * 28800000000L).as("ss"),
        (col("day") * dayUs + (col("sh") + 1L) * 28800000000L).as("se"))
    cropped.join(shifts, "day")
      .select(col("sh"),
        greatest(least(col("ce"), col("se")) -
          greatest(col("cs"), col("ss")), lit(0L)).as("ov"))
      .groupBy("sh")
      .agg((sum("ov")).as("downtime_micros"),
        sum(when(col("ov") > 0L, 1L).otherwise(0L)).as("n_slices"))
      .orderBy("sh")
  }

  // lazy: declared below the `oracles` map (q263Sql pattern)
  lazy val q285Sql: String =
    """WITH iv AS (
         SELECT event_id, epoch_us(ts) AS st,
                epoch_us(ts) +
                  (CAST(round(value * 100) AS BIGINT) % 7200 + 60)
                    * 1000000 AS en
         FROM events),
       cropped AS (
         SELECT event_id, day,
                greatest(st, day * 86400000000) AS cs,
                least(en, (day + 1) * 86400000000) AS ce
         FROM iv, unnest(generate_series(st // 86400000000,
                  (en - 1) // 86400000000)) AS u(day)),
       shifts AS (
         SELECT day, sh,
                day * 86400000000 + sh * 28800000000 AS ss,
                day * 86400000000 + (sh + 1) * 28800000000 AS se
         FROM (SELECT DISTINCT day FROM cropped),
              unnest(generate_series(0, 2)) AS v(sh)),
       ov AS (
         SELECT sh, greatest(least(ce, se) - greatest(cs, ss), 0) AS ov
         FROM cropped JOIN shifts USING (day))
       SELECT CAST(sh AS BIGINT) AS sh,
              CAST(sum(ov) AS BIGINT) AS downtime_micros,
              CAST(sum(CASE WHEN ov > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_slices
       FROM ov GROUP BY 1 ORDER BY 1"""

  // --- q287: shuffle-partition sizing advisor ---------------------------
  /** The pre-flight sizing report for a planned shuffle on a key: from
    * ONE key-count aggregation — total rows, distinct keys, the exact
    * p50/p99/max per-key multiplicities (histogram-rank percentiles,
    * the q109 discipline), a skew verdict (max > 10·p99), and the
    * shuffle-partition recommendation ceil(total / 1M rows). This is
    * [[graft.operators.JoinGuard]]'s sibling for aggregations: both
    * price a shuffle before paying for it, and together they are what
    * an operator consults before choosing q65's salting or q128's
    * bucketing. All-integer output. */
  def q287PartitionAdvisor(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val hist = counts.groupBy("n").agg(count(lit(1)).as("keys"))
    val w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    val ranked = hist
      .withColumn("cum", sum("keys").over(w))
      .withColumn("tot", sum("keys").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // every statistic derives from the |distinct multiplicities|-row
    // histogram in ONE reduce — the key-count scan runs exactly once
    // (total = Σ n·keys, percentiles as conditional mins over the
    // cumulative rank)
    ranked.agg(
        sum(col("n") * col("keys")).as("total_rows"),
        sum("keys").as("n_keys"),
        min(when(col("cum") * 2 >= col("tot"), col("n")))
          .as("p50_key_rows"),
        min(when(col("cum") * 100 >= col("tot") * 99, col("n")))
          .as("p99_key_rows"),
        max("n").as("max_key_rows"))
      .select(col("total_rows"), col("n_keys"), col("p50_key_rows"),
        col("p99_key_rows"), col("max_key_rows"),
        (col("max_key_rows") > col("p99_key_rows") * 10L).as("skewed"),
        ((col("total_rows") + 999999L) / 1000000L).cast("long")
          .as("recommended_partitions"))
  }

  lazy val q287Sql: String =
    """WITH counts AS (
         SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1),
       hist AS (
         SELECT n, CAST(count(*) AS BIGINT) AS keys
         FROM counts GROUP BY 1),
       ranked AS (
         SELECT n, keys,
                sum(keys) OVER (ORDER BY n ROWS UNBOUNDED PRECEDING)
                  AS cum,
                sum(keys) OVER () AS tot
         FROM hist),
       p AS (
         SELECT (SELECT min(n) FROM ranked WHERE cum * 2 >= tot) AS p50,
                (SELECT min(n) FROM ranked
                 WHERE cum * 100 >= tot * 99) AS p99)
       SELECT CAST(sum(n) AS BIGINT) AS total_rows,
              CAST(count(*) AS BIGINT) AS n_keys,
              CAST(p50 AS BIGINT) AS p50_key_rows,
              CAST(p99 AS BIGINT) AS p99_key_rows,
              CAST(max(n) AS BIGINT) AS max_key_rows,
              max(n) > p99 * 10 AS skewed,
              CAST((sum(n) + 999999) // 1000000 AS BIGINT)
                AS recommended_partitions
       FROM counts CROSS JOIN p
       GROUP BY p50, p99"""

  // --- q288: referential-integrity sweep --------------------------------
  /** Every foreign-key edge of the schema audited in one report: child
    * rows whose key has no parent (left-anti count) plus the child's
    * total — the FK half of the DQ suite (q215 audits FUNCTIONAL
    * dependencies; this audits containment). Each edge is one
    * key-projected anti-join, dimension parents broadcast; the seven
    * single-row results union into the report, so the sweep costs one
    * pruned scan per child table regardless of width. */
  def q288FkIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // each child's total is counted ONCE and shared by its edges
    // (lineitem has three) — the sweep then costs one key-pruned
    // anti-join scan per edge plus one count per table
    val totals = scala.collection.mutable.Map.empty[String, Long]
    def edge(name: String, child: DataFrame, ck: String,
             parent: DataFrame, pk: String): DataFrame = {
      val tbl = name.substring(0, name.indexOf('.'))
      val total = totals.getOrElseUpdate(tbl, child.count())
      val orphans = child.select(col(ck)).filter(col(ck).isNotNull)
        .join(parent.select(col(pk).as(ck)), Seq(ck), "left_anti")
        .count()
      Seq((name, total, orphans)).toDF("fk_edge", "n_child", "n_orphans")
    }
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val p = t(s, dir, "part")
    val su = t(s, dir, "supplier")
    edge("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(edge("lineitem.partkey->part", li, "l_partkey",
        p, "p_partkey"))
      .unionByName(edge("lineitem.suppkey->supplier", li, "l_suppkey",
        su, "s_suppkey"))
      .unionByName(edge("orders.custkey->customer", o, "o_custkey",
        c, "c_custkey"))
      .unionByName(edge("customer.nationkey->nation", c, "c_nationkey",
        n, "n_nationkey"))
      .unionByName(edge("supplier.nationkey->nation", su, "s_nationkey",
        n, "n_nationkey"))
      .unionByName(edge("nation.regionkey->region", n, "n_regionkey",
        r, "r_regionkey"))
      .orderBy("fk_edge")
  }

  lazy val q288Sql: String = {
    def e(name: String, child: String, ck: String, parent: String,
          pk: String) =
      s"""SELECT '$name' AS fk_edge,
            (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
            (SELECT CAST(count(*) AS BIGINT) FROM $child
             WHERE $ck IS NOT NULL
               AND $ck NOT IN (SELECT $pk FROM $parent)) AS n_orphans"""
    Seq(
      e("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      e("lineitem.partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      e("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      e("orders.custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      e("customer.nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      e("supplier.nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      e("nation.regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY fk_edge")
  }

  // --- q293: supplier concentration risk (Herfindahl index) -------------
  /** Herfindahl–Hirschman concentration of supplier revenue within
    * each part type — the procurement-risk scorecard (HHI → 1 means
    * one supplier owns the category; the q261 Gini is the customer-side
    * sibling). HHI = Σ shareᵢ² = Σ centsᵢ² / (Σ cents)², so the
    * numerator and denominator accumulate as exact decimal(38,0)
    * (centsᵢ² brushes int64 at sf1 — the JoinGuard wrap lesson) and
    * divide once in the double domain. One fact rollup to
    * |type × supplier| rows, one reduce per type. */
  def q293SupplierHhi(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val li = t(s, dir, "lineitem").select(col("l_partkey"),
      col("l_suppkey"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"))
    val p = t(s, dir, "part").select("p_partkey", "p_type")
    val bySupp = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_type", "l_suppkey")
      .agg(sum("pc").cast(dec).as("cents"))
    bySupp.groupBy("p_type")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents") * col("cents")).as("num"),
        sum("cents").as("tot"))
      .select(col("p_type"), col("n_suppliers"),
        col("tot").cast("long").as("total_cents"),
        (col("num").cast("double") /
          (col("tot") * col("tot")).cast("double")).as("hhi"))
      .orderBy("p_type")
  }

  lazy val q293Sql: String =
    """WITH by_supp AS (
         SELECT p_type, l_suppkey,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS DECIMAL(38,0)) AS cents
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2)
       SELECT p_type, CAST(count(*) AS BIGINT) AS n_suppliers,
              CAST(sum(cents) AS BIGINT) AS total_cents,
              CAST(sum(cents * cents) AS DOUBLE) /
                CAST(sum(cents) * sum(cents) AS DOUBLE) AS hhi
       FROM by_supp GROUP BY 1 ORDER BY 1"""

  /** Fellegi–Sunter-style record linkage between two "systems" — the
    * customer base and a deterministically perturbed copy (every 3rd
    * segment re-coded, every 7th balance off by 7¢, every 5th balance
    * shifted a whole $250) — scored inside NATION blocks: agreement
    * weights name +40 / balance-within-10¢ +20 / balance-bucket +25 /
    * segment +15, integer so both engines band identically. Output is
    * the score-band histogram with the true-match count per band
    * (same custkey = ground truth), i.e. the calibration table a
    * linkage threshold is chosen from. Scale shape: the only join is
    * block-equi (never a cross join); block sizes are data-shaped, so
    * at corpus scale the block key must compose finer evidence
    * (q167's sorted-neighborhood window and FuzzyJoin's q-gram prefix
    * filter are the adjacent tiers) — the cost meter is
    * JoinGuard.fanoutReport on the block key, which prices this exact
    * join before running it. */
  def q263RecordLinkage(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    val a = c.select(col("c_custkey").as("a_key"),
      col("c_nationkey").as("block"),
      col("c_name").as("a_name"), col("c_mktsegment").as("a_seg"),
      cents.as("a_bal"))
    val b = c.select(col("c_custkey").as("b_key"),
      col("c_nationkey").as("block"),
      col("c_name").as("b_name"),
      when(col("c_custkey") % 3 === 0, lit("RECODED"))
        .otherwise(col("c_mktsegment")).as("b_seg"),
      (cents +
        when(col("c_custkey") % 5 === 0, 25000L).otherwise(0L) +
        when(col("c_custkey") % 7 === 0, 7L).otherwise(0L)).as("b_bal"))
    a.join(b, "block")
      .select(
        (when(col("a_name") === col("b_name"), 40L).otherwise(0L) +
          when(abs(col("a_bal") - col("b_bal")) <= 10L, 20L)
            .otherwise(0L) +
          when(floor(col("a_bal") / 100000L) ===
            floor(col("b_bal") / 100000L), 25L).otherwise(0L) +
          when(col("a_seg") === col("b_seg"), 15L).otherwise(0L))
          .as("score"),
        when(col("a_key") === col("b_key"), 1L).otherwise(0L).as("tm"))
      .groupBy("score")
      .agg(count(lit(1)).as("n_pairs"), sum("tm").as("n_true"))
      .orderBy("score")
  }

  // lazy: declared below the `oracles` map that references it — a
  // plain val would still be null when the map initializes
  lazy val q263Sql: String =
    """WITH a AS (
         SELECT c_custkey AS a_key, c_nationkey AS block,
                c_name AS a_name, c_mktsegment AS a_seg,
                CAST(round(c_acctbal * 100) AS BIGINT) AS a_bal
         FROM customer),
       b AS (
         SELECT c_custkey AS b_key, c_nationkey AS block,
                c_name AS b_name,
                CASE WHEN c_custkey % 3 = 0 THEN 'RECODED'
                  ELSE c_mktsegment END AS b_seg,
                CAST(round(c_acctbal * 100) AS BIGINT) +
                  CASE WHEN c_custkey % 5 = 0 THEN 25000 ELSE 0 END +
                  CASE WHEN c_custkey % 7 = 0 THEN 7 ELSE 0 END AS b_bal
         FROM customer),
       scored AS (
         SELECT (CASE WHEN a_name = b_name THEN 40 ELSE 0 END +
                 CASE WHEN abs(a_bal - b_bal) <= 10 THEN 20 ELSE 0 END +
                 CASE WHEN floor(CAST(a_bal AS DOUBLE) / 100000) =
                      floor(CAST(b_bal AS DOUBLE) / 100000)
                   THEN 25 ELSE 0 END +
                 CASE WHEN a_seg = b_seg THEN 15 ELSE 0 END) AS score,
                CASE WHEN a_key = b_key THEN 1 ELSE 0 END AS tm
         FROM a JOIN b USING (block))
       SELECT CAST(score AS BIGINT) AS score,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(tm) AS BIGINT) AS n_true
       FROM scored GROUP BY 1 ORDER BY 1"""
}
