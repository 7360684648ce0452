package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar transform vocabulary (SURVEY §2.3), re-expressed
  * as pure Catalyst column expressions — every one of these is whole-stage
  * codegen'd, replacing the reference's row-at-a-time pandas `apply` loops
  * (`src/weather.py:98-106`, `src/delays.py:45-47`), which is the single
  * biggest architectural win at 100 TB: no per-row interpreter boundary.
  */
object ScalarFunctions {

  // --- F3: delay-string parse ----------------------------------------
  /** `"N min"` → +N, `"N min przed czasem"` (ahead of schedule) → −N;
    * null/unparseable → null. Reference: `src/delays.py:27-30`. */
  def parseDelayMinutes(delay: Column): Column = {
    val sign = when(delay.contains("przed czasem"), lit(-1)).otherwise(lit(1))
    val mag  = regexp_extract(delay, "^(\\d+)", 1)
    when(mag === "", lit(null).cast("int"))
      .otherwise(sign * mag.cast("int"))
  }

  // --- F4/F5/F6: timestamp keys ---------------------------------------
  /** Floor to hour — the TimeDim grain (`src/delays.py:33-36`). */
  def hourFloor(ts: Column): Column = date_trunc("hour", ts)

  /** `yyyy-MM-dd-HH` string key used by the weather join
    * (`src/queries.py:145`). */
  def hourKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd-HH")

  /** Date → int key `YYYYMMDD` (`dags/idh_etl.py:77`). */
  def dateIntKey(ts: Column): Column =
    date_format(ts, "yyyyMMdd").cast("long")

  // --- F1/F2: surrogate keys ------------------------------------------
  /** `"{station}-{Y-m-d}-{HH}"` weather surrogate key
    * (`src/weather.py:68-74`); zero-pad via lpad (F2). */
  def weatherKey(stationId: Column, date: Column, hour: Column): Column =
    concat_ws("-", stationId, date, lpad(hour.cast("string"), 2, "0"))

  // --- F7/F8: calendar derivations (`dags/idh_etl.py:79-87`) ----------
  def weekdayName(ts: Column): Column = date_format(ts, "EEEE")
  /** ISO weekday, Monday = 1. */
  def isoWeekday(ts: Column): Column = weekday(ts) + 1
  def monthName(ts: Column): Column = date_format(ts, "MMMM")
  def isBusinessDay(ts: Column): Column = weekday(ts) < 5

  // --- F9: season bucketing (`src/time_utils.py:26-36`) ---------------
  def season(ts: Column): Column = {
    val m = month(ts)
    when(m.isin(12, 1, 2), "winter")
      .when(m.isin(3, 4, 5), "spring")
      .when(m.isin(6, 7, 8), "summer")
      .otherwise("autumn")
  }

  // --- F10: time-of-day bucketing (`src/time_utils.py:47-57`) ---------
  def timeOfDay(hour: Column): Column =
    when(hour.between(6, 9), "morning")
      .when(hour.between(10, 13), "midday")
      .when(hour.between(14, 17), "afternoon")
      .when(hour.between(18, 22), "evening")
      .otherwise("night")

  // --- F11: route_type code → line_type (`src/queries.py:62-67`) ------
  def lineType(routeType: Column): Column =
    when(routeType === 0, "tram")
      .when(routeType === 2, "rail")
      .when(routeType === 3, "bus")
      .otherwise("unknown")

  // --- F12: fall_type threshold (`src/weather.py:11-12`) --------------
  def fallType(temperature: Column): Column =
    when(temperature < 2.0, "snow").otherwise("rain")

  // --- F13: multi-factor weather score → 5-bucket label ---------------
  /** Additive score over temp/wind/humidity/precipitation thresholds,
    * bucketed to a label (`src/weather.py:15-48`). The reference computes
    * this with a row-wise pandas `apply`; here it is one codegen'd
    * expression tree. */
  def weatherScore(temp: Column, wind: Column, humidity: Column,
                   precip: Column): Column = {
    val tempScore =
      when(temp.between(10.0, 25.0), 2)
        .when(temp >= 2.0 && temp < 10.0, 1)
        .when(temp < 2.0 || temp > 35.0, -1)
        .otherwise(0)
    val windScore =
      when(wind < 5.0, 2).when(wind < 10.0, 1)
        .when(wind > 15.0, -1).otherwise(0)
    val humidityScore =
      when(humidity < 70.0, 1).when(humidity > 90.0, -1).otherwise(0)
    val precipScore =
      when(precip === 0.0, 2).when(precip > 5.0, -1).otherwise(0)
    tempScore + windScore + humidityScore + precipScore
  }

  /** Score → label buckets (`src/weather.py:40-48`). */
  def generalCircumstances(score: Column): Column =
    when(score >= 6, "ludicrously-divine")
      .when(score >= 4, "titanically-passable")
      .when(score >= 2, "nobly-sufficient")
      .when(score >= 0, "courageously-subpar")
      .otherwise("opera-level-atrocious")

  /** Convenience: score + bucket in one expression. */
  def generalCircumstancesOf(temp: Column, wind: Column, humidity: Column,
                             precip: Column): Column =
    generalCircumstances(weatherScore(temp, wind, humidity, precip))
}
