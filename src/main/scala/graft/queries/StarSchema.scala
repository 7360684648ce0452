package graft.queries

import graft.functions.ScalarFunctions._
import graft.io.Sources
import graft.operators.ModeAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's six star-schema builders (`src/queries.py` in
  * jakublaba/idh-etl-demo), run end-to-end over staging analogs derived
  * deterministically from the harness tables:
  *
  *   events   → delays  (route / vehicle / stop keys from user_id,
  *                       hour-truncated ts, rendered+parsed delay string)
  *   events   → weather (hourly station aggregate, surrogate key
  *                       '12375-' || yyyy-MM-dd-HH — the reference's
  *                       computed-key join J4, `src/queries.py:145`)
  *   orders   → trips, routes
  *   lineitem → stop_times
  *   customer → stops   (shared stop_name → the J6 fan-out,
  *                       `src/queries.py:148`)
  *   supplier → vehicles
  *
  * Every builder reproduces the reference SQL's exact shape — including
  * the LineDim routes ⟕ delays ⟕ vehicles row multiplication
  * (`src/queries.py:70-74`) — so the DuckDB oracle runs the same logical
  * query over the same staging CTEs.
  *
  * Scale notes: the fact build is a star join — every dimension is
  * broadcast (they are orders of magnitude smaller than the fact), so the
  * only shuffle in DelayFact is none at all: fact rows stream through
  * broadcast-hash joins. LineDim's mode computation shuffles only
  * (route, value) pairs (see [[graft.operators.ModeAgg]]).
  */
object StarSchema {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  // ---- staging analogs (Spark) ----------------------------------------

  /** delays: the loader pipeline F3/F4/U1 — renders the Polish delay
    * string then parses it back through the codegen'd expression, exactly
    * what `src/delays.py:27-36` does to its scrape. */
  def delays(s: SparkSession, dir: String): DataFrame = {
    val n = round(abs(col("value")) * 10).cast("int")
    val rendered = when(col("event_id") % 3 === 0,
      concat(n.cast("string"), lit(" min przed czasem")))
      .otherwise(concat(n.cast("string"), lit(" min")))
    t(s, dir, "events").select(
      concat(lit("R"), (col("user_id") % 100).cast("string")).as("route"),
      (col("user_id") % 100 + 1).cast("string").as("vehicle_no"),
      concat(lit("stop-"), (col("user_id") % 50).cast("string"))
        .as("stop_name"),
      hourFloor(col("ts")).as("timestamp"),
      parseDelayMinutes(rendered).as("delay_mins"))
  }

  def routes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        concat(lit("R"), (col("o_custkey") % 100).cast("string"))
          .as("route_id"),
        ((col("o_custkey") % 100) % 4).cast("int").as("route_type"))
      .distinct()

  def trips(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").as("trip_id"),
      concat(lit("R"), (col("o_custkey") % 100).cast("string"))
        .as("route_id"))

  def stopTimes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey").as("trip_id"),
      concat(lit("S"), (col("l_partkey") % 50).cast("string")).as("stop_id"),
      col("l_quantity").as("shape_dist_traveled"))

  def stops(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 500).select(
      concat(lit("S"), col("c_custkey").cast("string")).as("stop_id"),
      concat(lit("stop-"), (col("c_custkey") % 50).cast("string"))
        .as("stop_name"),
      (col("c_acctbal") / 1000.0).as("stop_lat"),
      (col("c_custkey").cast("double") / 100.0).as("stop_lon"))

  def vehicles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(
      col("s_suppkey").cast("string").as("vehicle_number"),
      concat(lit("mfg-"), (col("s_suppkey") % 7).cast("string"))
        .as("manufacturer"),
      concat(lit("type-"), (col("s_suppkey") % 5).cast("string"))
        .as("vtype"),
      (lit(1990) + col("s_suppkey") % 35).as("production_year"),
      concat(lit("carrier-"), (col("s_suppkey") % 3).cast("string"))
        .as("carrier"))

  /** weather: the hourly station aggregate with the reference's derived
    * columns (`src/weather.py:51-121`) — fall_type threshold F12, the
    * additive score → general_circumstances F13 (codegen'd, replacing the
    * reference's row-wise pandas apply). */
  def weather(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(hourFloor(col("ts")).as("h"))
      .agg(
        avg("value").as("temperature"),
        round(abs(min(col("value")))).cast("long").as("fall_mm"),
        (count(lit(1)) % 20).as("wind_speed_mps"),
        (sum("event_id") % 360).as("wind_direction_deg"),
        (lit(40.0) + (count(lit(1)) % 60).cast("double"))
          .as("humidity_percent"))
    hourly.select(
      concat(lit("12375-"), hourKey(col("h"))).as("id"),
      col("temperature"),
      col("fall_mm"),
      fallType(col("temperature")).as("fall_type"),
      col("wind_speed_mps"),
      col("wind_direction_deg"),
      col("humidity_percent"),
      lit(1013L).as("pressure_hpa"),
      generalCircumstancesOf(col("temperature"),
        col("wind_speed_mps").cast("double"),
        col("humidity_percent"),
        col("fall_mm").cast("double")).as("general_circumstances"))
  }

  def timeDim(s: SparkSession, dir: String): DataFrame =
    CoreQueries.q17TimeDim(s, dir)

  // ---- staging analogs (DuckDB oracle CTEs) ---------------------------

  private[queries] val delaysSql =
    """delays AS (
         SELECT 'R' || CAST(user_id % 100 AS VARCHAR) AS route,
                CAST(user_id % 100 + 1 AS VARCHAR) AS vehicle_no,
                'stop-' || CAST(user_id % 50 AS VARCHAR) AS stop_name,
                date_trunc('hour', ts) AS timestamp,
                (CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END) *
                  CAST(round(abs(value) * 10) AS INTEGER) AS delay_mins
         FROM events)"""

  private[queries] val routesSql =
    """routes AS (
         SELECT DISTINCT 'R' || CAST(o_custkey % 100 AS VARCHAR) AS route_id,
                CAST((o_custkey % 100) % 4 AS INTEGER) AS route_type
         FROM orders)"""

  private val tripsSql =
    """trips AS (
         SELECT o_orderkey AS trip_id,
                'R' || CAST(o_custkey % 100 AS VARCHAR) AS route_id
         FROM orders)"""

  private val stopTimesSql =
    """stop_times AS (
         SELECT l_orderkey AS trip_id,
                'S' || CAST(l_partkey % 50 AS VARCHAR) AS stop_id,
                l_quantity AS shape_dist_traveled
         FROM lineitem)"""

  private val stopsSql =
    """stops AS (
         SELECT 'S' || CAST(c_custkey AS VARCHAR) AS stop_id,
                'stop-' || CAST(c_custkey % 50 AS VARCHAR) AS stop_name,
                c_acctbal / 1000.0 AS stop_lat,
                CAST(c_custkey AS DOUBLE) / 100.0 AS stop_lon
         FROM customer WHERE c_custkey <= 500)"""

  private[queries] val vehiclesSql =
    """vehicles AS (
         SELECT CAST(s_suppkey AS VARCHAR) AS vehicle_number,
                'mfg-' || CAST(s_suppkey % 7 AS VARCHAR) AS manufacturer,
                'type-' || CAST(s_suppkey % 5 AS VARCHAR) AS vtype,
                1990 + s_suppkey % 35 AS production_year,
                'carrier-' || CAST(s_suppkey % 3 AS VARCHAR) AS carrier
         FROM supplier)"""

  private val weatherSql =
    """weather AS (
         SELECT '12375-' || strftime(h, '%Y-%m-%d-%H') AS id,
                temperature, fall_mm,
                CASE WHEN temperature < 2.0 THEN 'snow' ELSE 'rain' END
                  AS fall_type,
                wind_speed_mps, wind_direction_deg, humidity_percent,
                CAST(1013 AS BIGINT) AS pressure_hpa,
                CASE WHEN score >= 6 THEN 'ludicrously-divine'
                     WHEN score >= 4 THEN 'titanically-passable'
                     WHEN score >= 2 THEN 'nobly-sufficient'
                     WHEN score >= 0 THEN 'courageously-subpar'
                     ELSE 'opera-level-atrocious' END
                  AS general_circumstances
         FROM (
           SELECT *,
                  (CASE WHEN temperature BETWEEN 10.0 AND 25.0 THEN 2
                        WHEN temperature >= 2.0 AND temperature < 10.0 THEN 1
                        WHEN temperature < 2.0 OR temperature > 35.0 THEN -1
                        ELSE 0 END) +
                  (CASE WHEN wind_speed_mps < 5.0 THEN 2
                        WHEN wind_speed_mps < 10.0 THEN 1
                        WHEN wind_speed_mps > 15.0 THEN -1 ELSE 0 END) +
                  (CASE WHEN humidity_percent < 70.0 THEN 1
                        WHEN humidity_percent > 90.0 THEN -1 ELSE 0 END) +
                  (CASE WHEN fall_mm = 0.0 THEN 2
                        WHEN fall_mm > 5.0 THEN -1 ELSE 0 END) AS score
           FROM (
             SELECT date_trunc('hour', ts) AS h,
                    avg(value) AS temperature,
                    CAST(round(abs(min(value))) AS BIGINT) AS fall_mm,
                    CAST(count(*) % 20 AS BIGINT) AS wind_speed_mps,
                    CAST(sum(event_id) % 360 AS BIGINT) AS wind_direction_deg,
                    40.0 + CAST(count(*) % 60 AS DOUBLE) AS humidity_percent
             FROM events GROUP BY 1)))"""

  private val timeDimSql =
    """time_dim AS (
         SELECT CAST(strftime(full_timestamp, '%Y%m%d') AS BIGINT) AS id,
                full_timestamp
         FROM (SELECT DISTINCT date_trunc('hour', ts) AS full_timestamp
               FROM events))"""

  // ---- the six star queries -------------------------------------------

  /** LineDim (`src/queries.py:12-75`): two tie-broken modes over the
    * trips ⟕ stop_times rollup, joined onto routes ⟕ delays ⟕ vehicles
    * (reproducing the reference's per-delay row fan-out). */
  def q40LineDim(s: SparkSession, dir: String): DataFrame =
    // operator is nullable (left-joined): Spark's asc default is NULLS
    // FIRST but DuckDB's is NULLS LAST — align explicitly so the
    // positional compare can't diverge on null operators
    lineDimFrame(s, dir)
      .orderBy(col("id").asc, col("operator").asc_nulls_last,
        col("line_type").asc, col("route_length_km").asc,
        col("stops_amount").asc)

  /** [[q40LineDim]] without the oracle ordering — the publish input (row
    * order is irrelevant to a keyed MERGE, so the global sort would be
    * pure cost there). */
  def lineDimFrame(s: SparkSession, dir: String): DataFrame = {
    val tr = trips(s, dir)
    val st = stopTimes(s, dir)
    // no cache(): the rollup feeds both mode branches, and the duplicated
    // subtree shares its shuffle via ReuseExchange — an InMemoryRelation
    // here costs more (batch build + block churn) than the re-aggregation
    val tripRollup = tr.join(st, Seq("trip_id"), "left")
      .groupBy("route_id", "trip_id")
      .agg(max("shape_dist_traveled").as("trip_len"),
        countDistinct("stop_id").as("stops_per_trip"))
    val routeLen = ModeAgg.modeOf(
      tripRollup.select("route_id", "trip_len"), Seq("route_id"), "trip_len")
      .withColumnRenamed("trip_len", "route_length_km")
    val routeStops = ModeAgg.modeOf(
      tripRollup.select("route_id", "stops_per_trip"),
      Seq("route_id"), "stops_per_trip")
      .withColumnRenamed("stops_per_trip", "stops_amount")
    routes(s, dir)
      .join(delays(s, dir).select(col("route").as("route_id"),
        col("vehicle_no")), Seq("route_id"), "left")
      .join(broadcast(vehicles(s, dir)
        .select(col("vehicle_number").as("vehicle_no"), col("carrier"))),
        Seq("vehicle_no"), "left")
      .join(broadcast(routeLen), Seq("route_id"), "left")
      .join(broadcast(routeStops), Seq("route_id"), "left")
      .select(
        col("route_id").as("id"),
        col("carrier").as("operator"),
        lineType(col("route_type")).as("line_type"),
        coalesce(col("route_length_km"), lit(0.0)).as("route_length_km"),
        coalesce(col("stops_amount"), lit(0L)).as("stops_amount"))
  }

  val q40Sql: String =
    s"""WITH $tripsSql, $stopTimesSql, $routesSql, $delaysSql, $vehiclesSql,
       trip_rollup AS (
         SELECT t.route_id, t.trip_id,
                max(st.shape_dist_traveled) AS trip_len,
                count(DISTINCT st.stop_id) AS stops_per_trip
         FROM trips t
         LEFT JOIN stop_times st ON t.trip_id = st.trip_id
         GROUP BY 1, 2),
       len_mode AS (
         SELECT route_id, trip_len,
                row_number() OVER (PARTITION BY route_id
                  ORDER BY count(*) DESC, trip_len DESC) AS rn
         FROM trip_rollup GROUP BY route_id, trip_len),
       route_length_mode AS (
         SELECT route_id, trip_len AS route_length_km
         FROM len_mode WHERE rn = 1),
       stops_mode AS (
         SELECT route_id, stops_per_trip,
                row_number() OVER (PARTITION BY route_id
                  ORDER BY count(*) DESC, stops_per_trip DESC) AS rn
         FROM trip_rollup GROUP BY route_id, stops_per_trip),
       route_stops_mode AS (
         SELECT route_id, stops_per_trip AS stops_amount
         FROM stops_mode WHERE rn = 1)
       SELECT r.route_id AS id,
              v.carrier AS operator,
              CASE r.route_type WHEN 0 THEN 'tram' WHEN 2 THEN 'rail'
                   WHEN 3 THEN 'bus' ELSE 'unknown' END AS line_type,
              coalesce(rl.route_length_km, 0) AS route_length_km,
              CAST(coalesce(rs.stops_amount, 0) AS BIGINT) AS stops_amount
       FROM routes r
       LEFT JOIN delays d ON r.route_id = d.route
       LEFT JOIN vehicles v ON d.vehicle_no = v.vehicle_number
       LEFT JOIN route_length_mode rl ON r.route_id = rl.route_id
       LEFT JOIN route_stops_mode rs ON r.route_id = rs.route_id
       ORDER BY id, operator, line_type, route_length_km, stops_amount"""

  /** StopDim (`src/queries.py:77-84`). */
  def q41StopDim(s: SparkSession, dir: String): DataFrame =
    stopDimFrame(s, dir).orderBy("id")

  def stopDimFrame(s: SparkSession, dir: String): DataFrame =
    stops(s, dir).select(
      col("stop_id").as("id"), col("stop_name").as("name"),
      col("stop_lat").cast("double").as("lat"),
      col("stop_lon").cast("double").as("lon"))

  val q41Sql: String =
    s"""WITH $stopsSql
       SELECT stop_id AS id, stop_name AS name,
              CAST(stop_lat AS DOUBLE) AS lat, CAST(stop_lon AS DOUBLE) AS lon
       FROM stops ORDER BY id"""

  /** VehicleDim (`src/queries.py:86-103`): null/blank/regex guards P3-P5,
    * string-ordered output O1. */
  def q42VehicleDim(s: SparkSession, dir: String): DataFrame =
    vehicleDimFrame(s, dir).orderBy("id")

  def vehicleDimFrame(s: SparkSession, dir: String): DataFrame =
    vehicles(s, dir)
      .filter(col("vehicle_number").isNotNull &&
        trim(col("vehicle_number")) =!= "" &&
        col("manufacturer").isNotNull && trim(col("manufacturer")) =!= "" &&
        col("vtype").isNotNull && trim(col("vtype")) =!= "" &&
        col("production_year").isNotNull &&
        col("production_year").cast("string").rlike("^\\d+$"))
      .select(col("vehicle_number").as("id"),
        col("manufacturer").as("brand"),
        col("vtype").as("v_model"),
        col("production_year").cast("long").as("year_produced"))

  val q42Sql: String =
    s"""WITH $vehiclesSql
       SELECT vehicle_number AS id, manufacturer AS brand,
              vtype AS v_model,
              CAST(production_year AS BIGINT) AS year_produced
       FROM vehicles
       WHERE vehicle_number IS NOT NULL AND trim(vehicle_number) != ''
         AND manufacturer IS NOT NULL AND trim(manufacturer) != ''
         AND vtype IS NOT NULL AND trim(vtype) != ''
         AND production_year IS NOT NULL
         AND regexp_matches(CAST(production_year AS VARCHAR), '^\\d+$$')
       ORDER BY id"""

  /** WeatherDim (`src/queries.py:105-117`). */
  def q43WeatherDim(s: SparkSession, dir: String): DataFrame =
    weather(s, dir).orderBy("id")

  val q43Sql: String =
    s"""WITH $weatherSql
       SELECT id, temperature, fall_mm, fall_type, wind_speed_mps,
              wind_direction_deg, humidity_percent, pressure_hpa,
              general_circumstances
       FROM weather ORDER BY id"""

  /** DelayFact (`src/queries.py:135-149`): the 5-way star join — equi on
    * hour-truncated timestamp (J5), computed weather key (J4), vehicle and
    * route ids, and the fan-out stop_name join (J6). Every dimension is
    * broadcast; the fact table never shuffles. */
  def q44DelayFact(s: SparkSession, dir: String): DataFrame =
    delayFactFrame(s, dir)
      .orderBy("time_id", "weather_id", "vehicle_id", "line_id", "stop_id",
        "delay_mins")

  /** [[q44DelayFact]] without the oracle ordering — the publish input. A
    * global 6-column sort of the ~1 M-row fact is a full range-partition
    * shuffle that a keyed MERGE never needs. */
  def delayFactFrame(s: SparkSession, dir: String): DataFrame = {
    val d = delays(s, dir)
    val tDim = timeDim(s, dir).select(col("id").as("time_id"),
      col("full_timestamp"))
    val w = weather(s, dir).select(col("id").as("weather_id"))
    val v = vehicles(s, dir).select(col("vehicle_number"))
    val r = routes(s, dir).select(col("route_id"))
    val st = stops(s, dir).select(col("stop_id"), col("stop_name"))
    d.join(broadcast(tDim), col("full_timestamp") === col("timestamp"))
      .join(broadcast(w), col("weather_id") ===
        concat(lit("12375-"), hourKey(col("timestamp"))))
      .join(broadcast(v), col("vehicle_number") === col("vehicle_no"))
      .join(broadcast(r), col("route_id") === col("route"))
      .join(broadcast(st), Seq("stop_name"))
      .select(
        col("delay_mins").cast("long").as("delay_mins"),
        col("time_id"),
        col("weather_id"),
        col("vehicle_number").as("vehicle_id"),
        col("route_id").as("line_id"),
        col("stop_id"))
  }

  val q44Sql: String =
    s"""WITH $delaysSql, $weatherSql, $vehiclesSql, $routesSql, $stopsSql,
       $timeDimSql
       SELECT CAST(d.delay_mins AS BIGINT) AS delay_mins,
              t.id AS time_id,
              w.id AS weather_id,
              v.vehicle_number AS vehicle_id,
              r.route_id AS line_id,
              s.stop_id
       FROM delays d
       JOIN time_dim t ON t.full_timestamp = d.timestamp
       JOIN weather w
         ON w.id = '12375-' || strftime(d.timestamp, '%Y-%m-%d-%H')
       JOIN vehicles v ON v.vehicle_number = d.vehicle_no
       JOIN routes r ON r.route_id = d.route
       JOIN stops s ON s.stop_name = d.stop_name
       ORDER BY time_id, weather_id, vehicle_id, line_id, stop_id,
                delay_mins"""

  /** Flagship analytical rollup over the full star: average delay by
    * line type, season, time-of-day and weather circumstances — the query
    * a user of the reference's warehouse would actually run. */
  def q45StarRollup(s: SparkSession, dir: String): DataFrame = {
    val d = delays(s, dir)
    val r = routes(s, dir)
    val w = weather(s, dir)
      .select(col("id").as("weather_id"), col("general_circumstances"))
    d.join(broadcast(r), col("route_id") === col("route"))
      .join(broadcast(w), col("weather_id") ===
        concat(lit("12375-"), hourKey(col("timestamp"))))
      .groupBy(
        lineType(col("route_type")).as("line_type"),
        season(col("timestamp")).as("season"),
        timeOfDay(hour(col("timestamp"))).as("time_of_day"),
        col("general_circumstances"))
      .agg(count(lit(1)).as("n_delays"),
        sum("delay_mins").cast("long").as("total_delay_mins"),
        avg("delay_mins").as("avg_delay_mins"))
      .orderBy("line_type", "season", "time_of_day",
        "general_circumstances")
  }

  val q45Sql: String =
    s"""WITH $delaysSql, $routesSql, $weatherSql
       SELECT CASE r.route_type WHEN 0 THEN 'tram' WHEN 2 THEN 'rail'
                   WHEN 3 THEN 'bus' ELSE 'unknown' END AS line_type,
              CASE WHEN month(d.timestamp) IN (12, 1, 2) THEN 'winter'
                   WHEN month(d.timestamp) IN (3, 4, 5) THEN 'spring'
                   WHEN month(d.timestamp) IN (6, 7, 8) THEN 'summer'
                   ELSE 'autumn' END AS season,
              CASE WHEN hour(d.timestamp) BETWEEN 6 AND 9 THEN 'morning'
                   WHEN hour(d.timestamp) BETWEEN 10 AND 13 THEN 'midday'
                   WHEN hour(d.timestamp) BETWEEN 14 AND 17 THEN 'afternoon'
                   WHEN hour(d.timestamp) BETWEEN 18 AND 22 THEN 'evening'
                   ELSE 'night' END AS time_of_day,
              w.general_circumstances,
              CAST(count(*) AS BIGINT) AS n_delays,
              CAST(sum(d.delay_mins) AS BIGINT) AS total_delay_mins,
              avg(d.delay_mins) AS avg_delay_mins
       FROM delays d
       JOIN routes r ON r.route_id = d.route
       JOIN weather w
         ON w.id = '12375-' || strftime(d.timestamp, '%Y-%m-%d-%H')
       GROUP BY 1, 2, 3, 4
       ORDER BY line_type, season, time_of_day, general_circumstances"""

  val all: Map[String, Q] = Map(
    "q40_line_dim" -> q40LineDim _,
    "q41_stop_dim" -> q41StopDim _,
    "q42_vehicle_dim" -> q42VehicleDim _,
    "q43_weather_dim" -> q43WeatherDim _,
    "q44_delay_fact" -> q44DelayFact _,
    "q45_star_rollup" -> q45StarRollup _,
  )

  val oracles: Map[String, String] = Map(
    "q40_line_dim" -> q40Sql,
    "q41_stop_dim" -> q41Sql,
    "q42_vehicle_dim" -> q42Sql,
    "q43_weather_dim" -> q43Sql,
    "q44_delay_fact" -> q44Sql,
    "q45_star_rollup" -> q45Sql,
  )
}
