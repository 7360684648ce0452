package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, when, lit, sum}
import org.apache.spark.sql.types._

/** Declared output schemas for the six star tables — the Spark
  * re-expression of the reference's BigQuery `SchemaField` lists
  * (`/root/reference/src/schemas.py:3-58`) and per-table unique keys
  * (`/root/reference/src/enums.py:24-35`).
  *
  * Type mapping: STRING→StringType, FLOAT→DoubleType, INT64→LongType,
  * BOOL→BooleanType, TIMESTAMP→TimestampType; `mode="REQUIRED"` →
  * `nullable = false`.
  *
  * Enforcement model: [[conform]] projects/casts a frame to the declared
  * column order and types (what BigQuery's load with an explicit schema
  * does); [[requiredNullCounts]] is the runtime REQUIRED check (what
  * BigQuery enforces server-side at load). Spark's static nullability is
  * advisory — most derived plans infer `nullable = true` even for
  * provably non-null expressions — so REQUIRED is enforced as a
  * data-quality gate at publish time, not as a compile-time plan
  * property.
  */
object StarModel {

  case class TableModel(name: String, schema: StructType, keys: Seq[String])

  private def f(name: String, dt: DataType, required: Boolean = true) =
    StructField(name, dt, nullable = !required)

  /** LineDim (`schemas.py:3-9`) — `operator` is the one NULLABLE column. */
  val lineDim: TableModel = TableModel("LineDim", StructType(Seq(
    f("id", StringType),
    f("operator", StringType, required = false),
    f("line_type", StringType),
    f("route_length_km", DoubleType),
    f("stops_amount", LongType))), Seq("id"))

  /** StopDim (`schemas.py:11-16`). */
  val stopDim: TableModel = TableModel("StopDim", StructType(Seq(
    f("id", StringType),
    f("name", StringType),
    f("lat", DoubleType),
    f("lon", DoubleType))), Seq("id"))

  /** VehicleDim (`schemas.py:18-23`). */
  val vehicleDim: TableModel = TableModel("VehicleDim", StructType(Seq(
    f("id", StringType),
    f("brand", StringType),
    f("v_model", StringType),
    f("year_produced", LongType))), Seq("id"))

  /** WeatherDim (`schemas.py:25-35`). */
  val weatherDim: TableModel = TableModel("WeatherDim", StructType(Seq(
    f("id", StringType),
    f("temperature", DoubleType),
    f("fall_mm", LongType),
    f("fall_type", StringType),
    f("wind_speed_mps", LongType),
    f("wind_direction_deg", LongType),
    f("humidity_percent", DoubleType),
    f("pressure_hpa", LongType),
    f("general_circumstances", StringType))), Seq("id"))

  /** TimeDim (`schemas.py:37-49`). Note the reference quirk, kept
    * faithfully: the unique key `id` is the YYYYMMDD *date* int while the
    * grain is hourly — an idempotent keyed publish therefore keeps one
    * row per day (`enums.py:29`). */
  val timeDim: TableModel = TableModel("TimeDim", StructType(Seq(
    f("id", LongType),
    f("full_timestamp", TimestampType),
    f("hour_", LongType),
    f("weekday", StringType),
    f("weekday_num", LongType),
    f("month_", StringType),
    f("month_num", LongType),
    f("season", StringType),
    f("year_", LongType),
    f("time_of_day", StringType),
    f("is_business_day", BooleanType))), Seq("id"))

  /** DelayFact (`schemas.py:51-58`); composite key (`enums.py:30-35`). */
  val delayFact: TableModel = TableModel("DelayFact", StructType(Seq(
    f("delay_mins", LongType),
    f("time_id", LongType),
    f("weather_id", StringType),
    f("vehicle_id", StringType),
    f("line_id", StringType),
    f("stop_id", StringType))), Seq(
    "time_id", "weather_id", "vehicle_id", "line_id", "stop_id"))

  val all: Seq[TableModel] =
    Seq(lineDim, stopDim, vehicleDim, weatherDim, timeDim, delayFact)

  /** Project + cast a frame to the declared column order and types.
    * Fails fast (AnalysisException) if a declared column is absent —
    * the G2 "missing column" guard at schema level. */
  def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(sf =>
      col(sf.name).cast(sf.dataType).as(sf.name)).toIndexedSeq: _*)

  /** Null count per REQUIRED column — the runtime REQUIRED-mode check.
    * One aggregation pass; an all-zero map means the frame satisfies
    * every declared REQUIRED constraint. */
  def requiredNullCounts(df: DataFrame, schema: StructType)
  : Map[String, Long] = {
    val required = schema.fields.filterNot(_.nullable).map(_.name).toSeq
    if (required.isEmpty) return Map.empty
    val aggs = required.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    required.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** True when names, order and types all match the declaration
    * (nullability intentionally excluded — see the object scaladoc). */
  def structurallyEqual(actual: StructType, declared: StructType): Boolean =
    actual.fields.map(sf => (sf.name, sf.dataType)).toSeq ==
      declared.fields.map(sf => (sf.name, sf.dataType)).toSeq
}
