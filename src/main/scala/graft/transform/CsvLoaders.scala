package graft.transform

import graft.functions.ScalarFunctions._
import graft.io.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** The reference's concrete CSV loader pipelines, re-expressed as pure
  * `DataFrame => DataFrame` Catalyst chains over a distributed CSV scan:
  *
  *   - weather: Polish→English rename map, surrogate key build, casts,
  *     null filter, station-hour dedup, fillna/round, fall_type, the
  *     additive score → general_circumstances
  *     (`/root/reference/src/weather.py:51-121`);
  *   - delays: per-day multi-file merge, NaN-tolerant vehicle number,
  *     Polish delay-string parse, hour-floored timestamp
  *     (`/root/reference/src/delays.py:11-54`).
  *
  * Loader shape at scale: ONE `spark.read.csv(glob)` replaces the
  * reference's driver-side listdir + per-file `pd.read_csv` + concat loop
  * (S2) — file-parallel scan, no single-process merge; every row-wise
  * pandas `apply` becomes a codegen'd expression.
  *
  * Fidelity notes (differences from the reference, all deliberate):
  *   - `weather.py:140-141` dedups the *merged* frame on `"hour"`, but at
  *     that point the column is still Polish (`godzina_pomiaru`) — the
  *     `if "hour" in columns` guard never fires, so that dedup is dead
  *     code; only the station-hour dedup (`weather.py:88`) is real and
  *     implemented here.
  *   - pandas `drop_duplicates` keeps the first row in *file listing
  *     order*, which `os.listdir` leaves unspecified; the Spark pipeline
  *     pins an explicit deterministic tie-break order instead, so re-runs
  *     (and the DuckDB oracle) are reproducible under any parallelism.
  *   - `delays.py:45` maps NaN vehicle numbers to None and everything
  *     else through `str()`; reading the column as a nullable string
  *     keeps the same null semantics without pandas' float64 round-trip
  *     (which would render "1001" as "1001.0").
  */
object CsvLoaders {

  // ---- weather --------------------------------------------------------

  /** Raw IMGW column names (`weather.py:53-65` rename map, inverted). */
  val weatherRawSchema: StructType = StructType(Seq(
    StructField("id_stacji", LongType),
    StructField("data_pomiaru", StringType),
    StructField("godzina_pomiaru", LongType),
    StructField("temperatura", DoubleType),
    StructField("suma_opadu", DoubleType),
    StructField("predkosc_wiatru", DoubleType),
    StructField("kierunek_wiatru", LongType),
    StructField("wilgotnosc_wzgledna", DoubleType),
    StructField("cisnienie", DoubleType)))

  val weatherRenames: Map[String, String] = Map(
    "id_stacji" -> "station_id",
    "data_pomiaru" -> "measurement_date",
    "godzina_pomiaru" -> "hour",
    "temperatura" -> "temperature",
    "suma_opadu" -> "precipitation_mm",
    "predkosc_wiatru" -> "wind_speed_mps",
    "kierunek_wiatru" -> "wind_direction_deg",
    "wilgotnosc_wzgledna" -> "humidity_percent",
    "cisnienie" -> "pressure_hpa")

  /** `_apply_weather_transformations` (`weather.py:51-121`) as one
    * Catalyst chain. Input: the raw (Polish-named) frame. */
  def weatherPipeline(raw: DataFrame): DataFrame = {
    val renamed = weatherRenames.foldLeft(raw) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    val keyed = renamed.select(
      concat_ws("-", col("station_id").cast("string"),
        col("measurement_date"),
        lpad(col("hour").cast("string"), 2, "0")).as("id"),
      col("station_id"), col("measurement_date"), col("hour"),
      col("temperature").cast("double").as("temperature"),
      col("precipitation_mm").cast("double").as("precipitation_mm"),
      col("wind_speed_mps").cast("double").as("wind_speed_raw"),
      col("wind_direction_deg").cast("long").as("wind_direction_deg"),
      col("humidity_percent").cast("double").as("humidity_percent"),
      col("pressure_hpa").cast("double").as("pressure_raw"))
      .filter(col("temperature").isNotNull && col("wind_speed_raw").isNotNull)
    // station-hour dedup (weather.py:88), deterministic keep-first.
    // measurement_date joins the partition key: the reference dedups a
    // single-day merged frame, but this pipeline is one glob scan over
    // arbitrarily many days — without the date, distinct days' rows for
    // the same station-hour (each a distinct id) would silently collapse
    val w = Window.partitionBy("station_id", "measurement_date", "hour")
      .orderBy(col("temperature").asc, col("pressure_raw").asc_nulls_last)
    val deduped = keyed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val derived = deduped.select(
      col("id"),
      col("temperature"),
      bround(coalesce(col("precipitation_mm"), lit(0.0))).cast("long")
        .as("fall_mm"),
      fallType(col("temperature")).as("fall_type"),
      bround(coalesce(col("wind_speed_raw"), lit(0.0))).cast("long")
        .as("wind_speed_mps"),
      col("wind_direction_deg"),
      col("humidity_percent"),
      bround(coalesce(col("pressure_raw"), lit(1013.0))).cast("long")
        .as("pressure_hpa"))
    derived.select(col("id"), col("temperature"), col("fall_mm"),
      col("fall_type"), col("wind_speed_mps"), col("wind_direction_deg"),
      col("humidity_percent"), col("pressure_hpa"),
      generalCircumstancesOf(col("temperature"),
        col("wind_speed_mps").cast("double"),
        col("humidity_percent"),
        col("fall_mm").cast("double")).as("general_circumstances"))
  }

  // ---- delays ---------------------------------------------------------

  /** Raw scrape columns (`delays.py:45-47`; space-named, as scraped). */
  val delaysRawSchema: StructType = StructType(Seq(
    StructField("Route", StringType),
    StructField("Vehicle No", StringType),
    StructField("Stop Name", StringType),
    StructField("Delay", StringType),
    StructField("Timestamp", StringType)))

  /** `load_delays_into_duckdb`'s transform block (`delays.py:40-54`):
    * NaN-tolerant vehicle number, F3 delay parse, F4 hour floor. */
  def delaysPipeline(raw: DataFrame): DataFrame =
    raw.select(
      col("Route").as("route"),
      col("`Vehicle No`").as("vehicle_no"), // null stays null (delays.py:45)
      col("`Stop Name`").as("stop_name"),
      parseDelayMinutes(col("Delay")).as("delay_mins"),
      date_trunc("hour", to_timestamp(col("Timestamp"))).as("timestamp"))

  // ---- deterministic demo scrape files --------------------------------

  /** Writes the fixed demo "scrape" CSVs (two files per source, one
    * hourly-partitioned day — the reference's `data/<src>/Y/M/D/` layout,
    * `weather.py:127`, `delays.py:14`) and returns (weatherGlob,
    * delaysGlob). Contents are embedded literals: every edge the
    * reference handles is planted — a station-hour duplicate, a null
    * temperature (filtered), null precipitation/pressure (filled), a
    * NaN vehicle number, early/late Polish delay strings. Idempotent
    * overwrite; the oracle replays the same rows as VALUES. */
  def writeDemoCsvs(baseDir: String): (String, String) = {
    val wDir = Paths.get(baseDir, "weather", "2024", "12", "25")
    val dDir = Paths.get(baseDir, "delays", "2024", "12", "25")
    Files.createDirectories(wDir); Files.createDirectories(dDir)
    val wHeader = "id_stacji,data_pomiaru,godzina_pomiaru,temperatura," +
      "suma_opadu,predkosc_wiatru,kierunek_wiatru,wilgotnosc_wzgledna,cisnienie"
    Files.writeString(wDir.resolve("weather_00.csv"), Seq(wHeader,
      "12375,2024-12-25,0,1.4,0.0,3.2,180,65.0,1013.2",
      "12375,2024-12-25,1,2.1,1.2,6.8,190,75.0,1011.8",
      "12500,2024-12-25,1,-0.3,4.2,12.1,200,92.0,",
      "12375,2024-12-25,2,,0.0,4.0,170,60.0,1014.0",
      "12375,2024-12-25,3,11.2,0.0,2.1,160,55.0,1016.3").mkString("\n"))
    Files.writeString(wDir.resolve("weather_12.csv"), Seq(wHeader,
      "12375,2024-12-25,3,11.4,0.0,2.2,165,54.0,1016.1",
      "12375,2024-12-25,4,25.4,0.0,2.5,150,45.0,",
      "12375,2024-12-25,5,36.2,6.5,16.2,140,30.0,1008.4").mkString("\n"))
    val dHeader = "Route,Vehicle No,Stop Name,Delay,Timestamp"
    Files.writeString(dDir.resolve("delays_08.csv"), Seq(dHeader,
      "R10,1001,stop-alpha,5 min,2024-12-25T08:27:43",
      "R10,,stop-beta,3 min przed czasem,2024-12-25T08:41:02",
      "R22,1002,stop-gamma,0 min,2024-12-25T09:05:10").mkString("\n"))
    Files.writeString(dDir.resolve("delays_23.csv"), Seq(dHeader,
      "R22,1003,stop-delta,12 min,2024-12-25T09:59:59",
      "R7,1001,stop-alpha,7 min przed czasem,2024-12-25T23:30:00")
      .mkString("\n"))
    (s"$wDir/*.csv", s"$dDir/*.csv")
  }

  /** Demo weather load end-to-end: write files → glob scan (S1/S2) →
    * pipeline. */
  def weatherFromDemoCsv(spark: SparkSession, baseDir: String): DataFrame = {
    val (wGlob, _) = writeDemoCsvs(baseDir)
    weatherPipeline(Sources.csvGlob(spark, wGlob, weatherRawSchema))
  }

  /** Demo delays load end-to-end, including the NaN vehicle row. */
  def delaysFromDemoCsv(spark: SparkSession, baseDir: String): DataFrame = {
    val (_, dGlob) = writeDemoCsvs(baseDir)
    delaysPipeline(Sources.csvGlob(spark, dGlob, delaysRawSchema))
  }
}
