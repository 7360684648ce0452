package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale features beyond single-query plans: bucketed co-located joins
  * (pre-shuffled storage → joins with zero exchanges) and streaming
  * dedup within a watermark (the T3 idempotency semantics on a stream).
  */
class ScaleFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectAll(a.executedPlan)
    case q: QueryStageExec => p +: collectAll(q.plan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectAll)
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "ov")
    val items = (1L to 5000L).map(i => (i % 1000 + 1, s"i$i")).toDF("k", "iv")
    orders.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_orders")
    items.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_items")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so co-location is what avoids shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_items"), "k")
      assert(j.count() == 5000)
      val shuffles = collectAll(j.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 0,
        s"bucketed join should not shuffle, found $shuffles exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }

  test("streaming dropDuplicatesWithinWatermark removes re-delivered " +
    "events (idempotent stream, T3)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // simulate at-least-once delivery: every event arrives twice
      .withColumn("dup", explode(array(lit(1), lit(2))))
      .drop("dup")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_stream").count()
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id").distinct().count()
    assert(got == expected, s"streamed $got vs distinct $expected")
  }
}
