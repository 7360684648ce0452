package graft

import graft.functions.ScalarFunctions._
import org.apache.spark.sql.functions._

class ScalarFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  test("parseDelayMinutes: positive, Polish early marker, null, garbage") {
    val df = Seq("5 min", "12 min przed czasem", "0 min", "garbage", "")
      .toDF("d")
      .select(parseDelayMinutes(col("d")).as("m"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(5), Some(-12), Some(0), None, None))
  }

  test("season covers all 12 months with correct buckets") {
    val df = (1 to 12).toDF("m")
      .select(col("m"), season(to_timestamp(
        format_string("2024-%02d-15", col("m")))).as("s"))
    val got = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(12) == "winter" && got(1) == "winter" && got(2) == "winter")
    assert(got(3) == "spring" && got(5) == "spring")
    assert(got(6) == "summer" && got(8) == "summer")
    assert(got(9) == "autumn" && got(11) == "autumn")
  }

  test("timeOfDay boundaries: 5→night 6→morning 9→morning 10→midday " +
    "13→midday 14→afternoon 17→afternoon 18→evening 22→evening 23→night") {
    val got = (0 to 23).toDF("h")
      .select(col("h"), timeOfDay(col("h")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(5) == "night" && got(6) == "morning" && got(9) == "morning")
    assert(got(10) == "midday" && got(13) == "midday")
    assert(got(14) == "afternoon" && got(17) == "afternoon")
    assert(got(18) == "evening" && got(22) == "evening")
    assert(got(23) == "night" && got(0) == "night")
  }

  test("lineType maps 0/2/3/other") {
    val got = Seq(0, 1, 2, 3, 7).toDF("rt")
      .select(col("rt"), lineType(col("rt")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(0 -> "tram", 1 -> "unknown", 2 -> "rail",
      3 -> "bus", 7 -> "unknown"))
  }

  test("fallType threshold at 2.0: below → snow, at/above → rain") {
    val got = Seq(1.9, 2.0, 2.1, -5.0).toDF("t")
      .select(col("t"), fallType(col("t")).as("f"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(1.9) == "snow" && got(2.0) == "rain" && got(2.1) == "rain"
      && got(-5.0) == "snow")
  }

  test("weatherScore: best case sums to 6, worst to -5") {
    // temp 15 (+2), wind 2 (+2), humidity 50 (+1), precip 0 (+2) = 7? no:
    // temp in [10,25] → 2; wind < 5 → 2; humidity < 70 → 1; precip 0 → 2
    val best = Seq((15.0, 2.0, 50.0, 0.0)).toDF("t", "w", "h", "p")
      .select(weatherScore(col("t"), col("w"), col("h"), col("p")).as("s"))
      .collect()(0).getInt(0)
    assert(best == 7)
    val worst = Seq((40.0, 20.0, 95.0, 10.0)).toDF("t", "w", "h", "p")
      .select(weatherScore(col("t"), col("w"), col("h"), col("p")).as("s"))
      .collect()(0).getInt(0)
    assert(worst == -4)
  }

  test("generalCircumstances buckets at exact boundaries 6/4/2/0/-1") {
    val got = Seq(7, 6, 5, 4, 3, 2, 1, 0, -1).toDF("s")
      .select(col("s"), generalCircumstances(col("s")).as("g"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(7) == "ludicrously-divine" && got(6) == "ludicrously-divine")
    assert(got(5) == "titanically-passable" && got(4) == "titanically-passable")
    assert(got(3) == "nobly-sufficient" && got(2) == "nobly-sufficient")
    assert(got(1) == "courageously-subpar" && got(0) == "courageously-subpar")
    assert(got(-1) == "opera-level-atrocious")
  }

  test("weatherKey zero-pads the hour") {
    val k = Seq(("12375", "2024-12-25", 7)).toDF("s", "d", "h")
      .select(weatherKey(col("s"), col("d"), col("h")).as("k"))
      .collect()(0).getString(0)
    assert(k == "12375-2024-12-25-07")
  }

  test("isoWeekday: Monday=1 … Sunday=7; business day < Sat") {
    // 2024-12-23 is a Monday
    val df = Seq("2024-12-23", "2024-12-28", "2024-12-29").toDF("d")
      .select(isoWeekday(to_timestamp(col("d"))).as("wd"),
        isBusinessDay(to_timestamp(col("d"))).as("biz"))
      .collect()
    assert(df(0).getInt(0) == 1 && df(0).getBoolean(1))
    assert(df(1).getInt(0) == 6 && !df(1).getBoolean(1)) // Saturday
    assert(df(2).getInt(0) == 7 && !df(2).getBoolean(1)) // Sunday
  }
}
