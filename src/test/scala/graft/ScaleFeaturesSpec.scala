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

  test("q128 core plan: bucketed scan -> join -> agg on the bucket key " +
    "runs with zero exchanges and one file per bucket") {
    val root = java.nio.file.Files.createTempDirectory("q128_spec_")
      .toString
    val (liTab, ordTab) = ("spec_q128_li", "spec_q128_ord")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      graft.queries.ScaleQueries.writeBucketedLayout(
        spark, "/root/testdata/sf0.001", root, liTab, ordTab)
      // one file per bucket: repartition(16, key) aligns writer tasks
      // with buckets, so the layout has no small-file debris
      val liFiles = new java.io.File(s"$root/li").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(liFiles == 16, s"expected 16 bucket files, got $liFiles")
      // force a non-broadcast join so co-location is what avoids shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val report =
        graft.queries.ScaleQueries.bucketedRevenue(spark, liTab, ordTab)
      assert(report.count() > 0)
      val shuffles = collectAll(report.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 0,
        s"join+agg on the bucket key should not shuffle, found $shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $liTab")
      spark.sql(s"DROP TABLE IF EXISTS $ordTab")
      graft.io.Sources.deleteRecursively(root)
    }
  }

  test("streaming dropDuplicatesWithinWatermark removes re-delivered " +
    "events (idempotent stream, T3)") {
    graft.io.Sources.harnessReadConf(spark)
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.io.Sources.normalizeNsTs(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
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

  test("q192 VARIANT extraction agrees with the per-access " +
      "get_json_object path row by row") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.io.Sources.table(spark, dir, "events")
    val mismatches = ev.select(
        expr("variant_get(parse_json(props), '$.k', 'long')").as("kv"),
        get_json_object(col("props"), "$.k").cast("long").as("kj"))
      .filter(!(col("kv") <=> col("kj")))
      .count()
    assert(mismatches == 0,
      "the VARIANT path must extract exactly what the JSON-text path does")
  }

  test("q193 collation census on a planted mixed-case corpus: UTF8_LCASE " +
      "collapses case variants, binary keeps them, lower() agrees") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_coll_spec_").toString
    try {
      // doc 1 (odd) uppercases to "A B"; doc 2 keeps "a b" -> binary 2,
      // case-insensitive 1; doc 3/4 add a pair that never collides
      Seq((1L, "a b"), (2L, "a b"), (3L, "zz"), (4L, "q")).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("t").as("source"), length(col("text")).cast("long").as("n_chars"))
        .write.parquet(s"$root/documents.parquet")
      val r = graft.queries.ScaleQueries.q193CollatedDedup(spark, root).head()
      assert(r.getLong(0) == 4)
      assert(r.getLong(1) == 4, "binary: A B, a b, zz, q all distinct")
      assert(r.getLong(2) == 3, "UTF8_LCASE: A B == a b")
      assert(r.getLong(3) == r.getLong(2), "lower() path must agree")
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q194 XML round-trip preserves markup-hostile strings (escaping " +
      "of <, &, quotes survives writer+reader)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_xml_spec_").toString
    try {
      val rows = Seq((1L, "<tag>&amp;\"quoted\""), (2L, "plain"),
        (3L, "a < b & c > d"))
      rows.toDF("id", "s").write.format("xml")
        .option("rowTag", "row").save(s"$root/feed")
      val back = spark.read.format("xml").option("rowTag", "row")
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id LONG, s STRING"))
        .load(s"$root/feed")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(back.toSeq == rows.sortBy(_._1),
        "XML escaping must be lossless both directions")
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q195 transformWithState distinct census equals the batch " +
      "count(DISTINCT) across four forced micro-batches") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamingHourly
      .transformWithStateDistinct(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = graft.io.Sources.table(spark, dir, "events")
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("n"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
