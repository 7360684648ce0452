package graft

import graft.operators.ModeAggregator
import graft.plans.DelayParse
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("ParseDelayMinutes native expression matches the Catalyst-expr " +
    "formulation on edge cases, interpreted and codegen'd") {
    DelayParse.register(spark)
    val cases = Seq("5 min", "12 min przed czasem", "0 min", "garbage",
      "", "7", "przed czasem", "00042 min", "3min")
    val df = cases.toDF("d").select(
      expr("parse_delay_minutes(d)").as("native"),
      graft.functions.ScalarFunctions.parseDelayMinutes(col("d"))
        .as("expr"))
    df.collect().foreach { r =>
      assert(Option(r.get(0)) == Option(r.get(1)), cases.mkString(","))
    }
    // null input → null out
    val n = Seq[Option[String]](None).toDF("d")
      .selectExpr("parse_delay_minutes(d)").collect()(0)
    assert(n.isNullAt(0))
  }

  test("DelayParse.parse handles digit-prefix and overflow clamping") {
    def p(s: String): Int = DelayParse.parse(UTF8String.fromString(s))
    assert(p("15 min") == 15)
    assert(p("15 min przed czasem") == -15)
    assert(p("abc") == DelayParse.NULL_SENTINEL)
    assert(p("99999999999999 min") == Int.MaxValue)
  }

  test("native expression participates in whole-stage codegen") {
    DelayParse.register(spark)
    val df = spark.range(100)
      .selectExpr("concat(cast(id as string), ' min') as d")
      .selectExpr("parse_delay_minutes(d) as m")
    df.collect() // force execution through codegen
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage;
    // a codegen fallback would print the Project bare
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [parse_delay_minutes"), plan)
    assert(df.agg(sum("m")).collect()(0).getLong(0) == (0 until 100).sum)
  }

  test("hash60 SQL surface resolves after register and runs inside " +
    "whole-stage codegen, matching the composed md5 formulation") {
    graft.plans.Hash60Expr.register(spark)
    val df = spark.range(200)
      .selectExpr("concat('doc-', cast(id as string)) as s")
      .selectExpr("hash60(s) as h",
        "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) as ref")
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hash60"), plan)
  }

  test("ModeAggregator equals the window-based mode incl. tie-break") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 3.0), ("b", 4.0), ("c", 9.0)).toDF("g", "v")
    val single = df.groupBy("g")
      .agg(ModeAggregator.modeUdaf(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val window = graft.operators.ModeAgg.modeOf(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(single == window)
    assert(single == Map("a" -> 1.0, "b" -> 4.0, "c" -> 9.0))
  }
}
