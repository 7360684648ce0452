package graft

import graft.transform.CsvLoaders
import org.apache.spark.sql.functions._

/** The reference-shaped CSV loader pipelines over real files (S1/S2/P2/
  * P3/P6/P7/U2 from actual CSV input — `weather.py`/`delays.py`). */
class CsvLoadersSpec extends SparkSpec {
  private val base = java.nio.file.Files
    .createTempDirectory("graft_csv_spec_").toString

  test("delays loader: NaN vehicle number → null; Polish marker → " +
      "negative; timestamps floor to the hour (delays.py:27-47)") {
    val got = CsvLoaders.delaysFromDemoCsv(spark, base)
      .orderBy("route", "timestamp", "stop_name").collect()
    assert(got.length == 5)
    val nullVehicles = got.filter(_.isNullAt(1))
    assert(nullVehicles.length == 1 &&
      nullVehicles.head.getAs[String]("stop_name") == "stop-beta")
    val byStop = got.map(r =>
      r.getAs[String]("stop_name") -> r.getAs[Int]("delay_mins")).toMap
    assert(byStop("stop-beta") == -3 && byStop("stop-gamma") == 0 &&
      byStop("stop-delta") == 12)
    // 09:05 and 09:59 both floor to 09:00
    val nines = got.filter(_.getAs[java.sql.Timestamp]("timestamp")
      .toString.contains("09:00:00"))
    assert(nines.length == 2)
  }

  test("weather dedup is per station-DATE-hour: a multi-day glob keeps " +
      "the same station-hour on different days") {
    import spark.implicits._
    val raw = Seq(
      // same station, same hour, two DAYS — both must survive
      (12375L, "2024-12-25", 7L, 1.0, 0.0, 3.0, 180L, 50.0, 1010.0),
      (12375L, "2024-12-26", 7L, 2.0, 0.0, 3.0, 180L, 50.0, 1010.0),
      // true duplicate (same station, same day, same hour) — one survives
      (12375L, "2024-12-26", 8L, 5.0, 0.0, 3.0, 180L, 50.0, 1010.0),
      (12375L, "2024-12-26", 8L, 6.0, 0.0, 3.0, 180L, 50.0, 1010.0))
      .toDF("id_stacji", "data_pomiaru", "godzina_pomiaru", "temperatura",
        "suma_opadu", "predkosc_wiatru", "kierunek_wiatru",
        "wilgotnosc_wzgledna", "cisnienie")
    val ids = CsvLoaders.weatherPipeline(raw).select("id")
      .as[String].collect().sorted
    assert(ids.toSeq == Seq("12375-2024-12-25-07", "12375-2024-12-26-07",
      "12375-2024-12-26-08"), ids.mkString(","))
  }

  test("weather loader: null-temp row filtered, station-hour dedup " +
      "keeps one deterministic row, null pressure → 1013 " +
      "(weather.py:85-97)") {
    val got = CsvLoaders.weatherFromDemoCsv(spark, base).orderBy("id")
    val rows = got.collect()
    // 8 raw − 1 null-temp − 1 station-hour duplicate = 6
    assert(rows.length == 6, rows.map(_.getString(0)).mkString(","))
    // the hour-3 duplicate resolved to the lower-temperature row
    val h3 = rows.filter(_.getString(0) == "12375-2024-12-25-03")
    assert(h3.length == 1 && h3.head.getAs[Double]("temperature") == 11.2)
    // null pressure filled with 1013 (weather.py:97)
    val filled = rows.filter(_.getString(0) == "12375-2024-12-25-04")
    assert(filled.head.getAs[Long]("pressure_hpa") == 1013L)
    // both stations kept for hour 1 (dedup is per station-hour)
    assert(rows.count(_.getString(0).endsWith("-01")) == 2)
    // extreme row lands in the worst bucket
    val worst = rows.filter(_.getString(0) == "12375-2024-12-25-05")
    assert(worst.head.getAs[String]("general_circumstances") ==
      "opera-level-atrocious")
  }
}
