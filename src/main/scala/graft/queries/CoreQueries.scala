package graft.queries

import graft.functions.ScalarFunctions._
import graft.io.Sources
import graft.operators.{ModeAgg, Upsert}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator demos over the harness TPC-H-ish tables — one query
  * per SURVEY §2 operator row, each paired with DuckDB oracle SQL.
  *
  * Conventions for oracle-exact determinism (SURVEY §5):
  *   - every query ends in a total ORDER BY (both engines);
  *   - every computed column is aliased identically on both sides;
  *   - integer aggregates are BIGINT on both sides (DuckDB sums to
  *     HUGEINT, so oracles wrap in CAST(... AS BIGINT));
  *   - Spark `round` == DuckDB `round` (both half-away-from-zero on
  *     DOUBLE — verified empirically).
  */
object CoreQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  // --- q01: scan + projection + cast + arithmetic (P1/P6, S1) ---------
  def q01ScanProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_extendedprice"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  val q01Sql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_extendedprice,
       l_extendedprice * (1 - l_discount) AS net_price
       FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  // --- q02: null / blank / regex predicates (P3/P4/P5) ----------------
  def q02FilterPredicates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_acctbal").isNotNull &&
        trim(col("c_mktsegment")) =!= "" &&
        col("c_name").rlike("^Customer#[0-9]+$") &&
        col("c_acctbal") > 0)
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  val q02Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
       WHERE c_acctbal IS NOT NULL AND trim(c_mktsegment) != ''
         AND regexp_matches(c_name, '^Customer#[0-9]+$') AND c_acctbal > 0
       ORDER BY c_custkey"""

  // --- q03: multi-key hash aggregate (A1) — TPC-H Q1 shape ------------
  def q03AggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        avg("l_discount").as("avg_disc"),
        max("l_quantity").as("max_qty"),
        min("l_extendedprice").as("min_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q03Sql: String =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       avg(l_quantity) AS avg_qty,
       avg(l_discount) AS avg_disc,
       max(l_quantity) AS max_qty,
       min(l_extendedprice) AS min_price,
       CAST(count(*) AS BIGINT) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // --- q04: count(*) per group (A2/A5) ---------------------------------
  def q04CountPerGroup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q04Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // --- q05: exact count(distinct) per group (A3) -----------------------
  def q05CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"))
      .orderBy("l_returnflag")

  val q05Sql: String =
    """SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --- q06: tie-broken mode per group (A4/W1/O3 — reference signature) -
  def q06Mode(s: SparkSession, dir: String): DataFrame =
    ModeAgg.modeOf(
        t(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"), "l_quantity")
      .withColumnRenamed("l_quantity", "mode_quantity")
      .orderBy("l_returnflag")

  val q06Sql: String =
    """WITH c AS (
         SELECT l_returnflag, l_quantity, count(*) AS freq
         FROM lineitem GROUP BY 1, 2),
       r AS (
         SELECT l_returnflag, l_quantity,
                row_number() OVER (PARTITION BY l_returnflag
                  ORDER BY freq DESC, l_quantity DESC) AS rn
         FROM c)
       SELECT l_returnflag, l_quantity AS mode_quantity FROM r
       WHERE rn = 1 ORDER BY l_returnflag"""

  // --- q07: left join + grouped max / count(distinct) (J1, A1, A3) -----
  // the reference's trip_lengths / stops_per_trip shape
  // (`src/queries.py:13-21,36-44`): orders≈trips, lineitem≈stop_times.
  def q07LeftJoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select("o_custkey", "o_orderkey")
      .join(t(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_custkey", "o_orderkey")
      .agg(
        max("l_quantity").as("trip_len"),
        countDistinct("l_partkey").as("stops_per_trip"))
      .orderBy("o_custkey", "o_orderkey")

  val q07Sql: String =
    """SELECT o.o_custkey, o.o_orderkey,
       max(l.l_quantity) AS trip_len,
       CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS stops_per_trip
       FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_custkey, o.o_orderkey
       ORDER BY o.o_custkey, o.o_orderkey"""

  // --- q08: left-join chain over small dims (J2) — broadcast both ------
  def q08JoinChain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_name"), lit("unknown")).as("nation"),
        coalesce(col("r_name"), lit("unknown")).as("region"))
      .orderBy("c_custkey")

  val q08Sql: String =
    """SELECT c_custkey, c_name,
       coalesce(n_name, 'unknown') AS nation,
       coalesce(r_name, 'unknown') AS region
       FROM customer
       LEFT JOIN nation ON c_nationkey = n_nationkey
       LEFT JOIN region ON n_regionkey = r_regionkey
       ORDER BY c_custkey"""

  // --- q09: 5-way star join + aggregate (J3) — broadcast-hash dims -----
  def q09StarJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("r_name", "p_brand")
      .agg(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "p_brand")

  val q09Sql: String =
    """SELECT r_name, p_brand,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       JOIN part     ON l_partkey = p_partkey
       GROUP BY r_name, p_brand ORDER BY r_name, p_brand"""

  // --- q10: join on computed expression key (J4/J5) --------------------
  // the reference's weather join: `w.id = '12375-' || strftime(ts, ...)`
  // (`src/queries.py:145`).
  def q10ExprKeyJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val dim = ev
      .groupBy(concat(lit("12375-"), hourKey(col("ts"))).as("w_id"))
      .agg(avg("value").as("hourly_avg"))
    ev.join(broadcast(dim),
        concat(lit("12375-"), hourKey(col("ts"))) === col("w_id"))
      .select(col("event_id"), col("w_id"), col("hourly_avg"), col("value"))
      .orderBy("event_id")
  }

  val q10Sql: String =
    """WITH dim AS (
         SELECT '12375-' || strftime(date_trunc('hour', ts), '%Y-%m-%d-%H')
                  AS w_id,
                avg(value) AS hourly_avg
         FROM events GROUP BY 1)
       SELECT e.event_id, d.w_id, d.hourly_avg, e.value
       FROM events e
       JOIN dim d ON '12375-' ||
         strftime(date_trunc('hour', e.ts), '%Y-%m-%d-%H') = d.w_id
       ORDER BY e.event_id"""

  // --- q11: anti join (J7 — the MERGE WHEN NOT MATCHED semantics) ------
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame =
    Upsert.newRowsOnly(
        t(s, dir, "customer").select("c_custkey", "c_name"),
        t(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        Seq("c_custkey"))
      .orderBy("c_custkey")

  val q11Sql: String =
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  // --- q12: semi join (EXISTS) -----------------------------------------
  def q12SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select("c_custkey", "c_name")
      .join(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .orderBy("c_custkey")

  val q12Sql: String =
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey"""

  // --- q13: global sort + limit, deterministic tie-break (O1/O2) -------
  def q13TopKOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  val q13Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""

  // --- q14: union all + deterministic keep-first dedup (U1/U2) ---------
  def q14UnionDedup(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), lit(1).as("src"))
    val b = o.select(col("o_orderkey"), lit(2).as("src"))
    Upsert.dedupKeepFirst(a.unionByName(b), Seq("o_orderkey"), Seq("src"))
      .orderBy("o_orderkey")
  }

  val q14Sql: String =
    """WITH u AS (
         SELECT o_orderkey, 1 AS src FROM orders WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT o_orderkey, 2 AS src FROM orders),
       r AS (
         SELECT o_orderkey, src,
                row_number() OVER (PARTITION BY o_orderkey ORDER BY src ASC)
                  AS rn
         FROM u)
       SELECT o_orderkey, src FROM r WHERE rn = 1 ORDER BY o_orderkey"""

  // --- q15: CASE bucketing — season / time-of-day / threshold class ----
  // (F9/F10/F12 over events.ts and events.value)
  def q15Buckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        season(col("ts")).as("season"),
        timeOfDay(hour(col("ts"))).as("time_of_day"),
        fallType(col("value")).as("fall_type"),
        col("value"))
      .groupBy("season", "time_of_day", "fall_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .orderBy("season", "time_of_day", "fall_type")

  val q15Sql: String =
    """SELECT
         CASE WHEN month(ts) IN (12, 1, 2) THEN 'winter'
              WHEN month(ts) IN (3, 4, 5) THEN 'spring'
              WHEN month(ts) IN (6, 7, 8) THEN 'summer'
              ELSE 'autumn' END AS season,
         CASE WHEN hour(ts) BETWEEN 6 AND 9 THEN 'morning'
              WHEN hour(ts) BETWEEN 10 AND 13 THEN 'midday'
              WHEN hour(ts) BETWEEN 14 AND 17 THEN 'afternoon'
              WHEN hour(ts) BETWEEN 18 AND 22 THEN 'evening'
              ELSE 'night' END AS time_of_day,
         CASE WHEN value < 2.0 THEN 'snow' ELSE 'rain' END AS fall_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(value) AS sum_value
       FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // --- q16: delay-string parse round-trip (F3/F14) ---------------------
  // Renders "N min" / "N min przed czasem" strings from lineitem rows,
  // then parses them back with the codegen'd expression.
  def q16DelayParse(s: SparkSession, dir: String): DataFrame = {
    val rendered = t(s, dir, "lineitem").select(
      col("l_returnflag"),
      when(col("l_linenumber") % 3 === 0,
        concat(col("l_linenumber").cast("string"), lit(" min przed czasem")))
        .otherwise(concat(col("l_linenumber").cast("string"), lit(" min")))
        .as("delay_str"))
    rendered
      .select(col("l_returnflag"),
        parseDelayMinutes(col("delay_str")).as("delay_mins"))
      .groupBy("l_returnflag")
      .agg(sum("delay_mins").cast("long").as("total_delay"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val q16Sql: String =
    """WITH rendered AS (
         SELECT l_returnflag,
           CASE WHEN l_linenumber % 3 = 0
                THEN l_linenumber || ' min przed czasem'
                ELSE l_linenumber || ' min' END AS delay_str
         FROM lineitem),
       parsed AS (
         SELECT l_returnflag,
           (CASE WHEN delay_str LIKE '%przed czasem%' THEN -1 ELSE 1 END) *
             CAST(regexp_extract(delay_str, '^([0-9]+)', 1) AS INTEGER)
             AS delay_mins
         FROM rendered)
       SELECT l_returnflag, CAST(sum(delay_mins) AS BIGINT) AS total_delay,
              CAST(count(*) AS BIGINT) AS n
       FROM parsed GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --- q17: full time dimension (F4-F10, T2) ----------------------------
  // the reference's TimeDim build (`dags/idh_etl.py:74-99`) over the
  // distinct event hours.
  def q17TimeDim(s: SparkSession, dir: String): DataFrame =
    timeDimFrame(s, dir).orderBy("full_timestamp")

  /** [[q17TimeDim]] without the oracle ordering — the publish input. */
  def timeDimFrame(s: SparkSession, dir: String): DataFrame = {
    val hours = t(s, dir, "events")
      .select(hourFloor(col("ts")).as("full_timestamp")).distinct()
    hours.select(
        dateIntKey(col("full_timestamp")).as("id"),
        col("full_timestamp"),
        hour(col("full_timestamp")).cast("long").as("hour_"),
        weekdayName(col("full_timestamp")).as("weekday"),
        isoWeekday(col("full_timestamp")).cast("long").as("weekday_num"),
        monthName(col("full_timestamp")).as("month_"),
        month(col("full_timestamp")).cast("long").as("month_num"),
        season(col("full_timestamp")).as("season"),
        year(col("full_timestamp")).cast("long").as("year_"),
        timeOfDay(hour(col("full_timestamp"))).as("time_of_day"),
        isBusinessDay(col("full_timestamp")).as("is_business_day"))
  }

  val q17Sql: String =
    """WITH hours AS (
         SELECT DISTINCT date_trunc('hour', ts) AS full_timestamp FROM events)
       SELECT
         CAST(strftime(full_timestamp, '%Y%m%d') AS BIGINT) AS id,
         full_timestamp,
         CAST(hour(full_timestamp) AS BIGINT) AS hour_,
         dayname(full_timestamp) AS weekday,
         CAST(isodow(full_timestamp) AS BIGINT) AS weekday_num,
         monthname(full_timestamp) AS month_,
         CAST(month(full_timestamp) AS BIGINT) AS month_num,
         CASE WHEN month(full_timestamp) IN (12, 1, 2) THEN 'winter'
              WHEN month(full_timestamp) IN (3, 4, 5) THEN 'spring'
              WHEN month(full_timestamp) IN (6, 7, 8) THEN 'summer'
              ELSE 'autumn' END AS season,
         CAST(year(full_timestamp) AS BIGINT) AS year_,
         CASE WHEN hour(full_timestamp) BETWEEN 6 AND 9 THEN 'morning'
              WHEN hour(full_timestamp) BETWEEN 10 AND 13 THEN 'midday'
              WHEN hour(full_timestamp) BETWEEN 14 AND 17 THEN 'afternoon'
              WHEN hour(full_timestamp) BETWEEN 18 AND 22 THEN 'evening'
              ELSE 'night' END AS time_of_day,
         isodow(full_timestamp) <= 5 AS is_business_day
       FROM hours ORDER BY full_timestamp"""

  // --- q18: surrogate-key build (F1/F2) ---------------------------------
  def q18SurrogateKey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(weatherKey(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd"), hour(col("ts"))).as("sk"))
      .distinct()
      .orderBy("sk")

  val q18Sql: String =
    """SELECT DISTINCT user_id || '-' || strftime(ts, '%Y-%m-%d') || '-' ||
         lpad(CAST(hour(ts) AS VARCHAR), 2, '0') AS sk
       FROM events ORDER BY sk"""

  // --- q19: null defaults + round + integer cast (P7/P8/F15) ------------
  def q19RoundDefaults(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        // simulate a nullable gauge: null when quantity > 45
        when(col("l_quantity") > 45, lit(null).cast("double"))
          .otherwise(col("l_discount") * 100).as("gauge"))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(coalesce(col("gauge"), lit(0.0))).cast("long").as("fall_mm"),
        coalesce(when(col("gauge") > 900, col("gauge")), lit(1013.0))
          .as("pressure_hpa"))
      .orderBy("l_orderkey", "l_linenumber")

  val q19Sql: String =
    """WITH g AS (
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CASE WHEN l_quantity > 45 THEN NULL
                ELSE l_discount * 100 END AS gauge
         FROM lineitem)
       SELECT l_orderkey, l_linenumber,
         CAST(round(coalesce(gauge, 0.0)) AS BIGINT) AS fall_mm,
         coalesce(CASE WHEN gauge > 900 THEN gauge END, 1013.0)
           AS pressure_hpa
       FROM g ORDER BY l_orderkey, l_linenumber"""

  // --- q20: window rank, top-k per group (W1/O3) ------------------------
  def q20WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  val q20Sql: String =
    """WITH r AS (
         SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
         FROM orders)
       SELECT o_custkey, o_orderkey, o_totalprice, rn FROM r
       WHERE rn <= 3 ORDER BY o_custkey, rn"""

  // --- q21: analytic window functions (lag/lead/frames — extension) ----
  def q21WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("next_value", lead("value", 1).over(w))
      .withColumn("moving3", sum("value").over(w.rowsBetween(-2, 0)))
      .drop("ts")
      .orderBy("user_id", "event_id")
  }

  val q21Sql: String =
    """SELECT user_id, event_id, value,
         lag(value, 1) OVER w AS prev_value,
         lead(value, 1) OVER w AS next_value,
         sum(value) OVER (PARTITION BY user_id
           ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving3
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       ORDER BY user_id, event_id"""

  // --- q22: insert-only upsert semantics (S8/T3) ------------------------
  def q22Upsert(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val existing = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_totalprice"), lit("existing").as("src"))
    val incoming = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"), lit("new").as("src"))
    val delta = Upsert.newRowsOnly(incoming, existing, Seq("o_orderkey"))
    existing.unionByName(delta).orderBy("o_orderkey")
  }

  val q22Sql: String =
    """SELECT o_orderkey, o_totalprice, 'existing' AS src FROM orders
       WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT o_orderkey, o_totalprice, 'new' AS src FROM orders
       WHERE o_orderstatus = 'O' AND o_orderkey % 3 != 0
       ORDER BY o_orderkey"""

  // --- q23: JSON extraction (extension over events.props) ---------------
  def q23Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  val q23Sql: String =
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
       FROM events GROUP BY k ORDER BY k"""

  // --- q24: hourly tumbling aggregation (T1/T2 batch form) ---------------
  def q24HourlyAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(hourFloor(col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .orderBy("hour_ts")

  val q24Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         sum(value) AS sum_value
       FROM events GROUP BY 1 ORDER BY 1"""

  // --- q266-q268: canonical TPC-H join-aggregate shapes -----------------
  // Revenue Σ price·(1−disc) is summed EXACTLY: cents × (100 − disc%)
  // integer per row ("centi-cent" units), decimal(38,0) accumulation
  // (the q125 discipline — a BIGINT sum wraps around sf100), one final
  // BIGINT cast. Float-summation order never matters because no float
  // is ever summed.
  private def revScaled(priceCol: String, discCol: String): Column =
    (expr(s"CAST(round($priceCol * 100) AS BIGINT)") *
      (lit(100L) - expr(s"CAST(round($discCol * 100) AS BIGINT)")))
      .cast("decimal(38,0)")

  private val revSql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100) AS BIGINT))"

  /** TPC-H Q3 (shipping priority), adapted to the harness schema: top
    * unshipped-revenue orders for one market segment at a cutoff
    * date. Shape: segment filter prunes customer (dimension,
    * broadcast), date filters push to both fact scans, ONE
    * aggregation on l_orderkey, TakeOrdered top-10. */
  def q266Tpch3(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < "1996-03-15")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > "1996-03-15")
      .select(col("l_orderkey"),
        revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum("rv").cast("long").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q266Sql: String =
    s"""SELECT l_orderkey,
              strftime(o_orderdate, '%Y-%m-%d') AS order_date,
              CAST(sum($revSql) AS BIGINT) AS revenue
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1996-03-15'
         AND l_shipdate > TIMESTAMP '1996-03-15'
       GROUP BY 1, 2
       ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""

  /** TPC-H Q5 (local supplier volume), adapted: revenue by nation for
    * one region-year where the supplier and customer share a nation.
    * The canonical snowflake — six tables, two join paths meeting on
    * the nation key. Every dimension chain (customer→nation→region,
    * supplier→nation) broadcasts; only the fact⋈orders join shuffles. */
  def q267Tpch5(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = t(s, dir, "customer")
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1997-01-01")
      .select("o_orderkey", "o_custkey")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val l = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_suppkey"),
      revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum("rv").cast("long").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val q267Sql: String =
    s"""SELECT n_name, CAST(sum($revSql) AS BIGINT) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY 1 ORDER BY revenue DESC, n_name ASC"""

  /** TPC-H Q10 (returned-item reporting), adapted: top-20 customers by
    * revenue lost to returns in one quarter. Fact filters push down
    * (return flag + order-date window); customer/nation broadcast;
    * TakeOrderedAndProject caps the result. */
  def q268Tpch10(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
      col("c_nationkey"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1996-04-01")
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "bal_cents", "n_name")
      .agg(sum("rv").cast("long").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q268Sql: String =
    s"""SELECT c_custkey, c_name,
              CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
              n_name, CAST(sum($revSql) AS BIGINT) AS revenue
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-04-01'
         AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       GROUP BY 1, 2, 3, 4
       ORDER BY revenue DESC, c_custkey ASC LIMIT 20"""

  /** TPC-H Q4 (order priority checking), adapted: orders in one
    * quarter with at least one late line item, counted by priority.
    * The canonical EXISTS — planned as a LEFT SEMI join, so each order
    * contributes once no matter how many lines are late (a plain
    * inner join would double-count; the fan-out bug EXISTS exists to
    * avoid). Late-line filter pushes to the fact scan. */
  def q269Tpch4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1996-07-01" &&
        col("o_orderdate") < "1996-10-01")
    val late = t(s, dir, "lineitem")
      // "committed < receipt" stand-in for the harness schema: the
      // line shipped more than 90 days after the order quarter opened
      .filter(col("l_shipdate") >= "1996-09-29")
      .select("l_orderkey")
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q269Sql: String =
    """SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-07-01'
         AND o_orderdate < TIMESTAMP '1996-10-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate >= TIMESTAMP '1996-09-29')
       GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q18 (large-volume customers), adapted: customers whose
    * single order exceeds 300 total quantity — the HAVING-subquery
    * shape. One fact aggregation feeds BOTH the filter and the
    * output (never a re-scan); the customer join happens after the
    * reduction, when only the qualifying orders remain. */
  def q270Tpch18(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300L)
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"))
    val c = t(s, dir, "customer").select("c_custkey", "c_name")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "order_date",
        "price_cents", "total_qty")
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(100)
  }

  val q270Sql: String =
    """WITH big AS (
         SELECT l_orderkey,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                  AS total_qty
         FROM lineitem GROUP BY 1
         HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
       SELECT c_name, c_custkey, o_orderkey,
              strftime(o_orderdate, '%Y-%m-%d') AS order_date,
              CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
              total_qty
       FROM big JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY price_cents DESC, o_orderkey ASC LIMIT 100"""

  /** TPC-H Q17-style correlated scalar subquery, via the SQL surface:
    * line items whose quantity is below 50% of the average quantity
    * for THEIR part. Written as `spark.sql` against temp views to
    * exercise the parser/analyzer path — Catalyst de-correlates the
    * scalar subquery into an aggregate + join (the plan a hand-written
    * DataFrame version would build), so the correlated form costs the
    * same as the manual rewrite. Quantities compare as exact integers
    * scaled by 2·count (avg/2 ⇔ 2·q·n < Σq — no division, no
    * engine-specific avg rounding). */
  def q271Tpch17(s: SparkSession, dir: String): DataFrame = {
    val v = s"graft_q271_li_${java.util.UUID.randomUUID.toString.take(8)}"
    t(s, dir, "lineitem").createOrReplaceTempView(v)
    try s.sql(
      s"""SELECT l_partkey,
                CAST(count(*) AS BIGINT) AS n_small_lines,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                  AS small_qty
         FROM $v outer_li
         WHERE CAST(l_quantity AS BIGINT) * 2 *
               (SELECT count(*) FROM $v
                WHERE l_partkey = outer_li.l_partkey) <
               (SELECT sum(CAST(l_quantity AS BIGINT)) FROM $v
                WHERE l_partkey = outer_li.l_partkey)
         GROUP BY l_partkey
         ORDER BY l_partkey""")
    // dropping the view after sql() is safe: analysis already bound
    // the view's plan by value into the returned frame
    finally s.catalog.dropTempView(v)
  }

  val q271Sql: String =
    """SELECT l_partkey,
              CAST(count(*) AS BIGINT) AS n_small_lines,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                AS small_qty
       FROM lineitem outer_li
       WHERE CAST(l_quantity AS BIGINT) * 2 *
             (SELECT count(*) FROM lineitem
              WHERE l_partkey = outer_li.l_partkey) <
             (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem
              WHERE l_partkey = outer_li.l_partkey)
       GROUP BY l_partkey
       ORDER BY l_partkey"""

  /** TPC-H Q12 (shipping-priority audit), adapted to the harness
    * schema: per return flag, how many lines belong to urgent
    * (1-URGENT/2-HIGH) vs other-priority orders within a ship-date
    * year. The two-level conditional-count shape — both counts ride
    * ONE aggregation pass as CASE sums, never two filtered scans. */
  def q277Tpch12(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .select("l_orderkey", "l_returnflag")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q277Sql: String =
    """SELECT l_returnflag,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority NOT IN
                  ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q14 (promotion effect), adapted: the share of one month's
    * revenue from PROMO-type parts. Exact parts + one final double
    * division (q261 discipline): both revenue sums are integer-exact,
    * the percentage divides once in the double domain — identical in
    * both engines. Part joins broadcast. */
  def q278Tpch14(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select("p_partkey", "p_type")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-03-01" &&
        col("l_shipdate") < "1997-04-01")
      .select(col("l_partkey"),
        revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rv"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("pr"),
        sum("rv").as("tr"))
      .select(col("pr").cast("long").as("promo_rev"),
        col("tr").cast("long").as("total_rev"),
        (col("pr").cast("double") * 100.0 / col("tr").cast("double"))
          .as("promo_pct"))
  }

  val q278Sql: String =
    s"""WITH m AS (
         SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revSql
                  ELSE 0 END) AS BIGINT) AS promo_rev,
                CAST(sum($revSql) AS BIGINT) AS total_rev
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-03-01'
           AND l_shipdate < TIMESTAMP '1997-04-01')
       SELECT promo_rev, total_rev,
              CAST(promo_rev AS DOUBLE) * 100.0 /
                CAST(total_rev AS DOUBLE) AS promo_pct
       FROM m"""

  /** TPC-H Q19 (discounted revenue), adapted: revenue from three
    * disjunctive brand/size/quantity bands — the multi-OR predicate
    * that exercises filter pushdown and CNF conversion. The part join
    * broadcasts; each OR arm combines part and lineitem conditions so
    * the predicate can only resolve post-join, while the shared
    * `l_quantity <= 30` envelope still pushes to the fact scan. */
  def q279Tpch19(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        revScaled("l_extendedprice", "l_discount").as("rv"))
      .filter(col("qty") <= 30L)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("qty").between(1L, 11L)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
          col("qty").between(10L, 20L)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 30) &&
          col("qty").between(20L, 30L)))
      .agg(sum("rv").cast("long").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q279Sql: String =
    s"""SELECT CAST(sum($revSql) AS BIGINT) AS revenue,
              CAST(count(*) AS BIGINT) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE CAST(l_quantity AS BIGINT) <= 30 AND (
         (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
          AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
             AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
             AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30))"""

  /** TPC-H Q6 (forecasting revenue change), adapted: would-be revenue
    * gain from eliminating discounts in a band — Σ price·discount over
    * one ship year, a discount band, and a quantity cap. The last
    * canonical TPC-H shape implementable on this harness (Q2/Q11/Q16/
    * Q20 need partsupp, which the fixture lacks). Pure scan-side
    * query: ZERO joins, ZERO shuffles past the final single-group agg
    * — every predicate pushes to the parquet scan (date as min/max
    * stats, quantity/discount as row-group pruning), the classic
    * "filter-rate benchmark" of the suite. Revenue Σ price·disc is
    * exact: cents × disc% integers ("centi-cents"), decimal(38,0)
    * accumulation, one BIGINT cast (the q266 discipline — never a
    * float sum). The discount band compares the ROUNDED integer
    * percent (5..7), sidestepping the double-literal `between 0.05
    * and 0.07` boundary ambiguity that makes naive Q6 ports diverge
    * across engines. Because the round/cast forms can't reach the
    * parquet scan, each rides a redundant PUSHABLE envelope — plain
    * double comparisons that are provable supersets (discount ⊇
    * [0.0449, 0.0751]; quantity < 24.0 ≡ trunc-cast < 24 for all
    * doubles) — so row-group stats still prune; the exact band
    * re-filters post-scan. */
  def q309Tpch6(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1997-01-01" &&
        col("l_discount") >= 0.0449 && col("l_discount") <= 0.0751 &&
        col("l_quantity") < 24.0 &&
        expr("CAST(round(l_discount * 100) AS BIGINT)").between(5L, 7L) &&
        col("l_quantity").cast("long") < 24L)
      .select((expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        expr("CAST(round(l_discount * 100) AS BIGINT)"))
        .cast("decimal(38,0)").as("dv"))
      .agg(sum("dv").cast("long").as("discount_rev"),
        count(lit(1)).as("n_lines"))
  }

  val q309Sql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                AS discount_rev,
              CAST(count(*) AS BIGINT) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
         AND CAST(l_quantity AS BIGINT) < 24"""

  /** TPC-H Q7 (volume shipping), adapted: bilateral trade revenue
    * between two nations per ship year — lines whose supplier sits in
    * one nation and whose ordering customer sits in the other. Both
    * dimension chains (supplier→nation, orders→customer→nation) prune
    * to the two-nation subset BEFORE touching the fact, so each side
    * broadcasts; the only shuffle is fact⋈orders. The nation-pair
    * inequality resolves post-join on two broadcast-carried strings. */
  def q296Tpch7(s: SparkSession, dir: String): DataFrame = {
    val ns = t(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select("n_nationkey", "n_name")
    val sup = t(s, dir, "supplier")
      .join(ns, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(ns, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("rv").cast("long").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q296Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              CAST(year(l_shipdate) AS BIGINT) AS l_year,
              CAST(sum($revSql) AS BIGINT) AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       WHERE sn.n_name IN ('NATION_1', 'NATION_2')
         AND cn.n_name IN ('NATION_1', 'NATION_2')
         AND sn.n_name <> cn.n_name
         AND l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** TPC-H Q8 (national market share), adapted: for MEDIUM-type parts
    * sold to ASIA-region customers, the share of each order year's
    * revenue whose SUPPLIER sits in NATION_2. Numerator and
    * denominator ride one aggregation as conditional sums of exact
    * scaled cents (the q278 discipline); the share divides once in
    * the double domain. All dimensions broadcast after their filters. */
  def q297Tpch8(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val cn = t(s, dir, "nation")
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = t(s, dir, "customer")
      .join(cn, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val sn = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name"))
    val p = t(s, dir, "part").filter(col("p_type") === "MEDIUM")
      .select("p_partkey")
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_partkey"), col("l_suppkey"),
      revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("n_name") === "NATION_2", col("rv"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("nr"),
        sum("rv").as("tr"))
      .select(col("o_year"), col("nr").cast("long").as("nation_rev"),
        col("tr").cast("long").as("total_rev"),
        (col("nr").cast("double") / col("tr").cast("double"))
          .as("mkt_share"))
      .orderBy("o_year")
  }

  val q297Sql: String =
    s"""WITH flat AS (
         SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CASE WHEN sn.n_name = 'NATION_2' THEN $revSql
                  ELSE 0 END AS nrv,
                $revSql AS rv
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region ON cn.n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND p_type = 'MEDIUM')
       SELECT o_year, CAST(sum(nrv) AS BIGINT) AS nation_rev,
              CAST(sum(rv) AS BIGINT) AS total_rev,
              CAST(sum(nrv) AS DOUBLE) / CAST(sum(rv) AS DOUBLE)
                AS mkt_share
       FROM flat GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q22 (global sales opportunity), adapted: per "country code"
    * (odd nation keys stand in for the phone-prefix set), customers
    * holding more than the average positive balance of that population
    * who have gone dormant — no order since 1999 (this corpus has no
    * customer who NEVER ordered, so the canonical "no orders at all"
    * clause would be vacuously empty; the date-scoped variant keeps
    * the anti-join load-bearing at every SF). The above-average test
    * is exact integer cross-multiplication (bal·n > Σbal — no double
    * avg to diverge on), the single-row population stats broadcast to
    * every customer, and the dormancy clause is a LEFT ANTI join on
    * the date-filtered, key-projected orders scan. */
  def q298Tpch22(s: SparkSession, dir: String): DataFrame = {
    val codes = Seq(1, 3, 5, 7, 9, 11, 13).map(_.toLong)
    val c = t(s, dir, "customer")
      .filter(col("c_nationkey").cast("long").isin(codes: _*))
      .select(col("c_custkey"),
        col("c_nationkey").cast("long").as("cntrycode"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
    val stats = c.filter(col("bal_cents") > 0L)
      .agg(count(lit(1)).as("n_pos"), sum("bal_cents").as("sum_pos"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1999-01-01")
      .select(col("o_custkey").as("c_custkey"))
    c.crossJoin(broadcast(stats))
      .filter(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .join(o, Seq("c_custkey"), "left_anti")
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        sum("bal_cents").as("total_bal_cents"))
      .orderBy("cntrycode")
  }

  val q298Sql: String =
    """WITH pop AS (
         SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS cntrycode,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
         FROM customer
         WHERE CAST(c_nationkey AS BIGINT) IN (1, 3, 5, 7, 9, 11, 13))
       SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
              CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
       FROM pop
       WHERE bal_cents * (SELECT count(*) FROM pop WHERE bal_cents > 0)
             > (SELECT sum(bal_cents) FROM pop WHERE bal_cents > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = pop.c_custkey
                           AND o_orderdate >= TIMESTAMP '1999-01-01')
       GROUP BY 1 ORDER BY 1"""

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    * harness schema: for finalized multi-supplier orders, the supplier
    * whose line was the ONLY late one (shipped >60 days after the
    * order date). The canonical EXISTS + NOT-EXISTS pair collapses
    * into ONE per-order aggregation — distinct suppliers, distinct
    * late suppliers, and the sole late supplier all reduce in a single
    * pass over the joined fact, so the fact is scanned once (the
    * textbook plan re-scans lineitem twice for the two correlated
    * subqueries). Top-100 by wait count. */
  def q299Tpch21(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey",
      "l_shipdate")
    val late = col("l_shipdate") > date_add(col("o_orderdate"), 60)
    val perOrder = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"),
        max(when(late, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1L && col("n_late_supp") === 1L)
    val sup = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    perOrder.join(sup, col("late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  val q299Sql: String =
    """WITH per_order AS (
         SELECT l_orderkey,
                count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT CASE WHEN l_shipdate >
                    o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS n_late_supp,
                max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS late_supp
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY 1
         HAVING count(DISTINCT l_suppkey) > 1
            AND count(DISTINCT CASE WHEN l_shipdate >
                  o_orderdate + INTERVAL 60 DAY
                THEN l_suppkey END) = 1)
       SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM per_order JOIN supplier ON late_supp = s_suppkey
       GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 100"""

  /** TPC-H Q15 (top supplier), adapted: the supplier(s) with maximum
    * revenue in one quarter — the view + scalar-max shape. The max
    * rides an empty-frame window over the ALREADY-AGGREGATED
    * supplier-sized frame (|suppliers| rows, dimension-sized — the
    * single-partition window is bounded by the dimension, never the
    * fact), so the revenue ranking is computed once and filtered in
    * place instead of a second aggregation + join. */
  def q300Tpch15(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1996-10-01" &&
        col("l_shipdate") < "1997-01-01")
      .select(col("l_suppkey"),
        revScaled("l_extendedprice", "l_discount").as("rv"))
    val rev = l.groupBy("l_suppkey")
      .agg(sum("rv").cast("long").as("total_rev"))
    val mx = Window.partitionBy()
    rev.withColumn("mx", max("total_rev").over(mx))
      .filter(col("total_rev") === col("mx"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  val q300Sql: String =
    s"""WITH rev AS (
         SELECT l_suppkey, CAST(sum($revSql) AS BIGINT) AS total_rev
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-10-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1)
       SELECT s_suppkey, s_name, total_rev
       FROM rev JOIN supplier ON l_suppkey = s_suppkey
       WHERE total_rev = (SELECT max(total_rev) FROM rev)
       ORDER BY s_suppkey"""

  /** TPC-H Q9 (product-type profit), adapted: profit on red parts by
    * supplier nation and ship year. The harness schema has no
    * partsupp, so unit cost is the deterministic 55%-of-retail proxy
    * — profit stays exact-integer at the cents·100 scale (revenue =
    * price_cents·(100−disc), cost = qty·retail_cents·55), so both
    * engines agree bit-for-bit. part filters by name BEFORE the join
    * and broadcasts; nation/supplier broadcast; one fact pass. */
  def q301Tpch9(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)")
          .as("retail_cents"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    val l = t(s, dir, "lineitem").select(col("l_partkey"),
      col("l_suppkey"),
      year(col("l_shipdate")).cast("long").as("l_year"),
      col("l_quantity").cast("long").as("qty"),
      revScaled("l_extendedprice", "l_discount").as("rv"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("l_year"),
        (col("rv") - (col("qty") * col("retail_cents") * lit(55L))
          .cast("decimal(38,0)")).as("profit"))
      .groupBy("nation", "l_year")
      .agg(sum("profit").cast("long").as("sum_profit"))
      .orderBy(col("nation").asc, col("l_year").desc)
  }

  val q301Sql: String =
    s"""SELECT n_name AS nation,
              CAST(year(l_shipdate) AS BIGINT) AS l_year,
              CAST(sum($revSql -
                CAST(l_quantity AS BIGINT) *
                CAST(round(p_retailprice * 100) AS BIGINT) * 55)
                AS BIGINT) AS sum_profit
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY 1, 2 ORDER BY nation ASC, l_year DESC"""

  // --- q312-q315: partsupp synthesis + the subquery-decorrelation ------
  // --- TPC-H canon (Q2, Q11, Q16, Q20) ---------------------------------

  /** Deterministic `partsupp` synthesis: the harness ships no partsupp
    * table, so the four classic subquery shapes that need it (TPC-H
    * Q2/Q11/Q16/Q20) derive one from the distinct (l_partkey,
    * l_suppkey) pairs that actually trade, with integer
    * supplycost/availqty computed by fixed modular arithmetic — the
    * same rows in both engines with zero randomness, mirrored verbatim
    * as the `partsupp` CTE in every oracle. Cost ∈ [1, 1000], qty ∈
    * [1, 9999]: small enough that every downstream product/sum stays
    * far inside BIGINT. */
  private def partsuppDF(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"),
        ((col("l_partkey") * 7 + col("l_suppkey") * 13) % 1000 + 1)
          .as("ps_supplycost"),
        ((col("l_partkey") * 31 + col("l_suppkey") * 17) % 9999 + 1)
          .as("ps_availqty"))

  /** The oracle-side mirror of [[partsuppDF]]. */
  private val partsuppSql: String =
    """partsupp AS (
         SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                (l_partkey * 7 + l_suppkey * 13) % 1000 + 1
                  AS ps_supplycost,
                (l_partkey * 31 + l_suppkey * 17) % 9999 + 1
                  AS ps_availqty
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))"""

  /** Per-invocation uniquely-named temp views for the subquery family
    * (correlated subqueries need the SQL surface — `spark.sql` —
    * and the view names must not collide across concurrent
    * invocations on one session, the q128 discipline). The views are
    * dropped in a finally; analysis has already bound their plans by
    * value into the returned frame. */
  private def withTpchViews(s: SparkSession, dir: String,
                            tables: Seq[String])
                           (mk: (String => String) => String): DataFrame = {
    val tag = java.util.UUID.randomUUID.toString.take(8)
    def vn(tb: String) = s"graft_tpch_${tag}_$tb"
    try {
      tables.foreach { tb =>
        val df = if (tb == "partsupp") partsuppDF(s, dir) else t(s, dir, tb)
        df.createOrReplaceTempView(vn(tb))
      }
      s.sql(mk(vn))
    } finally tables.foreach(tb => s.catalog.dropTempView(vn(tb)))
  }

  /** TPC-H Q2 (minimum-cost supplier), the correlated-scalar-MIN
    * decorrelation shape: for each mid-size LARGE part, the EUROPE
    * suppliers offering it at exactly the region-wide minimum
    * supplycost for that part. Catalyst decorrelates the per-part MIN
    * into an aggregate + join; at 100 TB the inner aggregate is
    * partsupp-sized (never lineitem-sized) and the dimension chain
    * (supplier⋈nation⋈region) broadcasts on both sides. Account
    * balances compare as exact cents. Spec: TPC-H 3.0 §2.4.2, adapted
    * to the harness part schema (no p_mfgr; single-word p_type). */
  def q312Tpch2(s: SparkSession, dir: String): DataFrame =
    withTpchViews(s, dir,
      Seq("part", "supplier", "nation", "region", "partsupp")) { vn =>
      s"""SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
                s_name, n_name, p_partkey, p_brand
         FROM ${vn("part")}, ${vn("partsupp")}, ${vn("supplier")},
              ${vn("nation")}, ${vn("region")}
         WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
           AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'EUROPE'
           AND ps_supplycost = (
             SELECT min(ps_supplycost)
             FROM ${vn("partsupp")}, ${vn("supplier")}, ${vn("nation")},
                  ${vn("region")}
             WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
               AND s_nationkey = n_nationkey
               AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
         ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
         LIMIT 100"""
    }

  val q312Sql: String =
    s"""WITH $partsuppSql
       SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
              s_name, n_name, p_partkey, p_brand
       FROM part, partsupp, supplier, nation, region
       WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND ps_supplycost = (
           SELECT min(ps_supplycost)
           FROM partsupp, supplier, nation, region
           WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
             AND s_nationkey = n_nationkey
             AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
       ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
       LIMIT 100"""

  /** TPC-H Q11 (important stock identification): per-part inventory
    * value within one nation, kept only when it exceeds a fixed
    * fraction of the nation's total — the scalar-subquery-in-HAVING
    * shape. The fraction compares as exact integers (value × 5000 >
    * total) — no division, no float threshold. At scale both sides of
    * the comparison come from the SAME nation-filtered partsupp
    * rollup; Catalyst plans the scalar as a broadcast single-row
    * aggregate, so the fact passes once. Spec: TPC-H 3.0 §2.4.11. */
  def q313Tpch11(s: SparkSession, dir: String): DataFrame =
    withTpchViews(s, dir, Seq("supplier", "nation", "partsupp")) { vn =>
      s"""SELECT ps_partkey,
                CAST(sum(ps_supplycost * ps_availqty) AS BIGINT)
                  AS part_value
         FROM ${vn("partsupp")}, ${vn("supplier")}, ${vn("nation")}
         WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name = 'NATION_7'
         GROUP BY ps_partkey
         HAVING sum(ps_supplycost * ps_availqty) * 5000 > (
           SELECT sum(ps_supplycost * ps_availqty)
           FROM ${vn("partsupp")}, ${vn("supplier")}, ${vn("nation")}
           WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND n_name = 'NATION_7')
         ORDER BY part_value DESC, ps_partkey"""
    }

  val q313Sql: String =
    s"""WITH $partsuppSql
       SELECT ps_partkey,
              CAST(sum(ps_supplycost * ps_availqty) AS BIGINT)
                AS part_value
       FROM partsupp, supplier, nation
       WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         AND n_name = 'NATION_7'
       GROUP BY ps_partkey
       HAVING sum(ps_supplycost * ps_availqty) * 5000 > (
         SELECT sum(ps_supplycost * ps_availqty)
         FROM partsupp, supplier, nation
         WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
           AND n_name = 'NATION_7')
       ORDER BY part_value DESC, ps_partkey"""

  /** TPC-H Q16 (parts/supplier relationship): distinct supplier count
    * per (brand, type, size) bucket over a NOT-IN-excluded supplier
    * set — the anti-join + count-distinct shape. The NOT IN subquery
    * ("suppliers with complaints" becomes negative account balance on
    * the harness schema, which has no s_comment) is supplier-sized:
    * Catalyst turns it into a broadcast null-aware anti join, so the
    * partsupp pass is one scan. Spec: TPC-H 3.0 §2.4.16. */
  def q314Tpch16(s: SparkSession, dir: String): DataFrame =
    withTpchViews(s, dir, Seq("part", "supplier", "partsupp")) { vn =>
      s"""SELECT p_brand, p_type, p_size,
                CAST(count(DISTINCT ps_suppkey) AS BIGINT)
                  AS supplier_cnt
         FROM ${vn("partsupp")}, ${vn("part")}
         WHERE p_partkey = ps_partkey
           AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 4, 9, 14, 19, 24, 30, 36)
           AND ps_suppkey NOT IN (
             SELECT s_suppkey FROM ${vn("supplier")}
             WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
    }

  val q314Sql: String =
    s"""WITH $partsuppSql
       SELECT p_brand, p_type, p_size,
              CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       FROM partsupp, part
       WHERE p_partkey = ps_partkey
         AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 9, 14, 19, 24, 30, 36)
         AND ps_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** TPC-H Q20 (potential part promotion), the nested-semi-join shape:
    * suppliers in one nation whose stock of red parts exceeds half of
    * what they actually shipped of that part in 1997 — IN (partsupp
    * filtered by IN (part) and a correlated per-(part, supplier)
    * lineitem sum). The half-of-shipped threshold compares as exact
    * integers (availqty × 2 > Σqty); a (part, supplier) pair with no
    * 1997 shipments yields a NULL sum, and NULL-comparison exclusion
    * is the canon's semantics in both engines. Catalyst decorrelates
    * the inner sum into a grouped aggregate joined on both keys —
    * lineitem is scanned once, date-pruned. Spec: TPC-H 3.0 §2.4.20. */
  def q315Tpch20(s: SparkSession, dir: String): DataFrame =
    withTpchViews(s, dir,
      Seq("part", "supplier", "nation", "lineitem", "partsupp")) { vn =>
      s"""SELECT s_name, s_suppkey
         FROM ${vn("supplier")}, ${vn("nation")}
         WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
           AND s_suppkey IN (
             SELECT ps_suppkey FROM ${vn("partsupp")}
             WHERE ps_partkey IN (
                 SELECT p_partkey FROM ${vn("part")}
                 WHERE p_name LIKE 'red%')
               AND ps_availqty * 2 > (
                 SELECT sum(CAST(l_quantity AS BIGINT))
                 FROM ${vn("lineitem")}
                 WHERE l_partkey = ps_partkey
                   AND l_suppkey = ps_suppkey
                   AND l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'))
         ORDER BY s_name, s_suppkey"""
    }

  val q315Sql: String =
    s"""WITH $partsuppSql
       SELECT s_name, s_suppkey
       FROM supplier, nation
       WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
         AND s_suppkey IN (
           SELECT ps_suppkey FROM partsupp
           WHERE ps_partkey IN (
               SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             AND ps_availqty * 2 > (
               SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem
               WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                 AND l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate < TIMESTAMP '1998-01-01'))
       ORDER BY s_name, s_suppkey"""

  val all: Map[String, Q] = Map(
    "q312_tpch2" -> q312Tpch2 _,
    "q313_tpch11" -> q313Tpch11 _,
    "q314_tpch16" -> q314Tpch16 _,
    "q315_tpch20" -> q315Tpch20 _,
    "q309_tpch6" -> q309Tpch6 _,
    "q296_tpch7" -> q296Tpch7 _,
    "q297_tpch8" -> q297Tpch8 _,
    "q298_tpch22" -> q298Tpch22 _,
    "q299_tpch21" -> q299Tpch21 _,
    "q300_tpch15" -> q300Tpch15 _,
    "q301_tpch9" -> q301Tpch9 _,
    "q277_tpch12" -> q277Tpch12 _,
    "q278_tpch14" -> q278Tpch14 _,
    "q279_tpch19" -> q279Tpch19 _,
    "q266_tpch3" -> q266Tpch3 _,
    "q267_tpch5" -> q267Tpch5 _,
    "q268_tpch10" -> q268Tpch10 _,
    "q269_tpch4" -> q269Tpch4 _,
    "q270_tpch18" -> q270Tpch18 _,
    "q271_tpch17" -> q271Tpch17 _,
    "q01_scan_project" -> q01ScanProject _,
    "q02_filter_predicates" -> q02FilterPredicates _,
    "q03_agg_pricing" -> q03AggPricing _,
    "q04_count_per_group" -> q04CountPerGroup _,
    "q05_count_distinct" -> q05CountDistinct _,
    "q06_mode_tiebreak" -> q06Mode _,
    "q07_left_join_agg" -> q07LeftJoinAgg _,
    "q08_join_chain" -> q08JoinChain _,
    "q09_star_join" -> q09StarJoin _,
    "q10_expr_key_join" -> q10ExprKeyJoin _,
    "q11_anti_join" -> q11AntiJoin _,
    "q12_semi_join" -> q12SemiJoin _,
    "q13_topk_orders" -> q13TopKOrders _,
    "q14_union_dedup" -> q14UnionDedup _,
    "q15_buckets" -> q15Buckets _,
    "q16_delay_parse" -> q16DelayParse _,
    "q17_time_dim" -> q17TimeDim _,
    "q18_surrogate_key" -> q18SurrogateKey _,
    "q19_round_defaults" -> q19RoundDefaults _,
    "q20_window_rank" -> q20WindowRank _,
    "q21_window_analytics" -> q21WindowAnalytics _,
    "q22_upsert" -> q22Upsert _,
    "q23_json" -> q23Json _,
    "q24_hourly_agg" -> q24HourlyAgg _,
  )

  val oracles: Map[String, String] = Map(
    "q312_tpch2" -> q312Sql,
    "q313_tpch11" -> q313Sql,
    "q314_tpch16" -> q314Sql,
    "q315_tpch20" -> q315Sql,
    "q309_tpch6" -> q309Sql,
    "q296_tpch7" -> q296Sql,
    "q297_tpch8" -> q297Sql,
    "q298_tpch22" -> q298Sql,
    "q299_tpch21" -> q299Sql,
    "q300_tpch15" -> q300Sql,
    "q301_tpch9" -> q301Sql,
    "q266_tpch3" -> q266Sql,
    "q267_tpch5" -> q267Sql,
    "q268_tpch10" -> q268Sql,
    "q269_tpch4" -> q269Sql,
    "q270_tpch18" -> q270Sql,
    "q271_tpch17" -> q271Sql,
    "q277_tpch12" -> q277Sql,
    "q278_tpch14" -> q278Sql,
    "q279_tpch19" -> q279Sql,
    "q01_scan_project" -> q01Sql,
    "q02_filter_predicates" -> q02Sql,
    "q03_agg_pricing" -> q03Sql,
    "q04_count_per_group" -> q04Sql,
    "q05_count_distinct" -> q05Sql,
    "q06_mode_tiebreak" -> q06Sql,
    "q07_left_join_agg" -> q07Sql,
    "q08_join_chain" -> q08Sql,
    "q09_star_join" -> q09Sql,
    "q10_expr_key_join" -> q10Sql,
    "q11_anti_join" -> q11Sql,
    "q12_semi_join" -> q12Sql,
    "q13_topk_orders" -> q13Sql,
    "q14_union_dedup" -> q14Sql,
    "q15_buckets" -> q15Sql,
    "q16_delay_parse" -> q16Sql,
    "q17_time_dim" -> q17Sql,
    "q18_surrogate_key" -> q18Sql,
    "q19_round_defaults" -> q19Sql,
    "q20_window_rank" -> q20Sql,
    "q21_window_analytics" -> q21Sql,
    "q22_upsert" -> q22Sql,
    "q23_json" -> q23Sql,
    "q24_hourly_agg" -> q24Sql,
  )
}
