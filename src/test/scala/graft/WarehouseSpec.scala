package graft

import graft.operators.{GridJoin, Scd2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.functions._

/** Invariants for the warehouse-family operators (Scd2, GridJoin,
  * weighted sampling, bitmap intersection) beyond the q210-q213
  * oracles: version-chain algebra, brute-force equivalence, and the
  * plan shapes the 100 TB rewrites exist for. */
class WarehouseSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectAll(a.executedPlan)
    case q: QueryStageExec => p +: collectAll(q.plan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectAll)
  }

  private def freshDim = {
    import spark.implicits._
    Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "attr")
      .select(col("k"), col("attr"),
        lit("2026-01-01").cast("date").as("effective_from"),
        lit("9999-12-31").cast("date").as("effective_to"),
        lit(true).as("is_current"))
  }

  test("Scd2: one current row per key, closed-then-open chain, " +
      "no-op redelivery, new-member insert") {
    import spark.implicits._
    val updates = Seq((1L, "A2"), // changed
      (2L, "B"), // redelivered unchanged
      (9L, "Z") // brand new
    ).toDF("k", "attr")
    val out = Scd2.applyChanges(freshDim, updates, Seq("k"), Seq("attr"),
      lit("2026-06-01").cast("date")).cache()
    try {
      // exactly one current version per key, always
      val curPerKey = out.filter(col("is_current")).groupBy("k").count()
        .filter(col("count") =!= 1).count()
      assert(curPerKey === 0)
      assert(out.count() === 5) // 3 original + 1 new version + 1 new member
      val k1 = out.filter(col("k") === 1).orderBy("effective_from")
        .collect()
      assert(k1.length === 2)
      assert(k1(0).getAs[String]("attr") === "A" &&
        !k1(0).getAs[Boolean]("is_current") &&
        k1(0).getAs[java.sql.Date]("effective_to").toString ===
          "2026-06-01")
      assert(k1(1).getAs[String]("attr") === "A2" &&
        k1(1).getAs[Boolean]("is_current") &&
        k1(1).getAs[java.sql.Date]("effective_from").toString ===
          "2026-06-01")
      // redelivered-unchanged left the chain alone
      assert(out.filter(col("k") === 2).count() === 1)
      // new member opened at the effective date
      val k9 = out.filter(col("k") === 9).collect()
      assert(k9.length === 1 && k9(0).getAs[Boolean]("is_current") &&
        k9(0).getAs[java.sql.Date]("effective_from").toString ===
          "2026-06-01")
    } finally out.unpersist()
  }

  test("Scd2: re-applying the same batch is a no-op (idempotent loads)") {
    import spark.implicits._
    val updates = Seq((1L, "A2"), (9L, "Z")).toDF("k", "attr")
    val once = Scd2.applyChanges(freshDim, updates, Seq("k"), Seq("attr"),
      lit("2026-06-01").cast("date"))
    val twice = Scd2.applyChanges(once, updates, Seq("k"), Seq("attr"),
      lit("2026-07-01").cast("date"))
    assert(twice.exceptAll(once).count() === 0 &&
      once.exceptAll(twice).count() === 0)
  }

  test("Scd2: null attribute is a value — NULL→NULL redelivery is a " +
      "no-op, NULL→X and X→NULL are real changes") {
    import spark.implicits._
    val dim = Seq((1L, Option.empty[String]), (2L, Some("B")))
      .toDF("k", "attr")
      .select(col("k"), col("attr"),
        lit("2026-01-01").cast("date").as("effective_from"),
        lit("9999-12-31").cast("date").as("effective_to"),
        lit(true).as("is_current"))
    val updates = Seq((1L, Option.empty[String]), // null → null: no-op
      (2L, Option.empty[String]) // value → null: change
    ).toDF("k", "attr")
    val out = Scd2.applyChanges(dim, updates, Seq("k"), Seq("attr"),
      lit("2026-06-01").cast("date"))
    assert(out.filter(col("k") === 1).count() === 1)
    assert(out.filter(col("k") === 2).count() === 2)
    assert(out.filter(col("k") === 2 && col("is_current"))
      .filter(col("attr").isNull).count() === 1)
  }

  test("GridJoin ≡ brute-force cross join, and the plan contains no " +
      "cartesian/nested-loop join") {
    import spark.implicits._
    val pts = (1L to 400L).map(i =>
      (i, (i * 48271) % 1000, (i * 69621) % 1000))
    val l = pts.toDF("lid", "lx", "ly")
    val r = pts.map { case (i, x, y) => (i, x, y) }
      .toDF("rid", "rx", "ry")
    val fast = GridJoin.radiusJoin(l, r, "lx", "ly", "rx", "ry", 50L)
      .select("lid", "rid", "dist2")
    val brute = l.crossJoin(r)
      .withColumn("dist2",
        (col("lx") - col("rx")) * (col("lx") - col("rx")) +
          (col("ly") - col("ry")) * (col("ly") - col("ry")))
      .filter(col("dist2") <= 50L * 50L)
      .select("lid", "rid", "dist2")
    assert(fast.exceptAll(brute).count() === 0 &&
      brute.exceptAll(fast).count() === 0)
    assert(fast.count() > 400, "fixture must produce non-self matches")
    val nodes = collectAll(executed(fast)).map(_.nodeName)
    assert(!nodes.exists(n => n.contains("Cartesian") ||
      n.contains("BroadcastNestedLoop")), nodes.mkString(","))
  }

  test("GridJoin emits each qualifying pair exactly once (no 3×3 " +
      "neighborhood double-count)") {
    import spark.implicits._
    val l = Seq((1L, 100L, 100L)).toDF("lid", "lx", "ly")
    // right point shares the left point's cell AND its neighbors' reach
    val r = Seq((1L, 101L, 101L), (2L, 149L, 100L), (3L, 51L, 100L))
      .toDF("rid", "rx", "ry")
    val out = GridJoin.radiusJoin(l, r, "lx", "ly", "rx", "ry", 50L)
    assert(out.count() === out.select("lid", "rid").distinct().count())
  }

  test("q212 weighted sample: top-k per group compiles to " +
      "WindowGroupLimit — k·P rows reach the exchange, not the table") {
    val plan = executed(graft.queries.WarehouseQueries
      .q212WeightedSample(spark, dir))
    val nodes = collectAll(plan).map(_.nodeName)
    assert(nodes.count(_.contains("WindowGroupLimit")) >= 2,
      s"rank-filter pushdown missing: $nodes")
  }

  test("q214 point-in-time join: the version chain partitions time — " +
      "every fact matches exactly one dimension version") {
    import spark.implicits._
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val dim = c.select(col("c_custkey"),
      col("c_mktsegment").as("segment"),
      lit("1995-01-01").cast("date").as("effective_from"),
      lit("9999-12-31").cast("date").as("effective_to"),
      lit(true).as("is_current"))
    val updates = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        concat(lit("SEG_"), (col("c_custkey") % 3).cast("string"))
          .as("segment"))
    val versioned = Scd2.applyChanges(dim, updates,
      Seq("c_custkey"), Seq("segment"), lit("1998-06-01").cast("date"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val perFact = o
      .join(versioned, col("o_custkey") === col("c_custkey") &&
        col("o_orderdate") >= col("effective_from") &&
        col("o_orderdate") < col("effective_to"))
      .groupBy("o_orderkey").count()
    assert(perFact.filter(col("count") =!= 1).count() === 0)
    assert(perFact.count() === o.count(),
      "every order must find a valid-at-date version")
  }

  test("q216 Benford audit: chi2 terms recompute from the per-digit " +
      "counts, and observed shares sum to 1") {
    val out = graft.queries.WarehouseQueries.q216Benford(spark, dir)
      .collect()
    val nTotal = out.map(_.getAs[Long]("n_obs")).sum
    out.foreach { r =>
      val exp = r.getAs[Double]("expected")
      val obs = r.getAs[Long]("n_obs").toDouble
      assert(math.abs((obs - exp) * (obs - exp) / exp -
        r.getAs[Double]("chi2_term")) < 1e-12)
    }
    // expected shares are a probability distribution: when all nine
    // digits occur, the expected-count mass equals n
    if (out.length == 9) {
      val sumExp = out.map(_.getAs[Double]("expected")).sum
      assert(math.abs(sumExp - nTotal.toDouble) < 1e-6 * nTotal,
        s"expected-count mass $sumExp vs n=$nTotal")
    }
  }

  test("q218 majority vote: golden equals truth on every key where " +
      "at most one source is corrupted (truth holds >= 2 votes)") {
    import spark.implicits._
    val c = spark.read.parquet(s"$dir/customer.parquet")
    // corruption sources are key%5 and key%3; both hit only key%15
    val recoverable = c.filter(col("c_custkey") % 15 =!= 0).count()
    val out = graft.queries.WarehouseQueries
      .q218MajorityVote(spark, dir).collect()
    val matched = out.filter(r =>
        r.getAs[String]("vote_type") != "tie_broken")
      .map(_.getAs[Long]("n_match_truth")).sum
    val strongKeys = out.filter(r =>
        r.getAs[String]("vote_type") != "tie_broken")
      .map(_.getAs[Long]("n_keys")).sum
    assert(strongKeys === recoverable)
    assert(matched === recoverable,
      "every unanimous/majority vote must recover the true value")
  }

  test("q219 proration: allocations sum EXACTLY to the order total, " +
      "for every order, with the unfiltered table") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val byOrder = Window.partitionBy("l_orderkey")
    val alloc = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("sum_qty", sum("qty").over(byOrder))
      .withColumn("base", expr("(cents * qty) div sum_qty"))
      .withColumn("rem", (col("cents") * col("qty")) % col("sum_qty"))
      .withColumn("deficit",
        (col("cents") - sum("base").over(byOrder)).cast("long"))
      .withColumn("rk", row_number().over(
        byOrder.orderBy(col("rem").desc, col("l_linenumber"))))
      .withColumn("alloc_cents", col("base") +
        when(col("rk") <= col("deficit"), 1L).otherwise(0L))
    val bad = alloc.groupBy("l_orderkey", "cents")
      .agg(sum("alloc_cents").as("total_alloc"))
      .filter(col("total_alloc") =!= col("cents"))
    assert(bad.count() === 0, "largest-remainder must conserve cents")
    // and no line gets more than base+1 or less than base
    assert(alloc.filter(col("alloc_cents") - col("base") > 1 ||
      col("alloc_cents") < col("base")).count() === 0)
  }

  test("boundedSssp: takes the cheaper multi-hop path over the direct " +
      "edge, respects the hop cap, handles negative weights") {
    import spark.implicits._
    import graft.operators.{Dedup, Graphs}
    // 1 -> 7 direct costs 10; 1 -> 2 -> 3 -> 7 costs 3; node 5 sits
    // 4 hops down the chain (beyond the cap, and the only route to it
    // goes through 4); 1 -> 6 has a negative weight
    val edges = Seq(
      (1L, 7L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 7L, 1L),
      (3L, 4L, 1L), (4L, 5L, 1L), (1L, 6L, -2L)
    ).toDF("src", "dst", "w")
    val sources = Seq(1L).toDF("node")
    val out = Graphs.boundedSssp(edges, sources, 3)
    val m = out.collect().map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("cost")).toMap
    Dedup.unpersistCheckpoint(out)
    assert(m(1L) === 0L)
    assert(m(7L) === 3L, "3-hop path must beat the direct edge")
    assert(m(2L) === 1L && m(3L) === 2L && m(4L) === 3L)
    assert(m(6L) === -2L)
    assert(!m.contains(5L), "node beyond the hop cap must be absent")
  }

  test("q221 U-shaped attribution conserves exactly 10000 bp per " +
      "converting user") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.ts").as("p_ts"),
        col("m.event_id").as("p_eid"))
    val touches = ev.join(fp, "user_id")
      .filter(col("ts") < col("p_ts") ||
        (col("ts") === col("p_ts") && col("event_id") < col("p_eid")))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sized = touches.withColumn("i", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("user_id")))
    val bp = when(col("n") === 1, 10000L).when(col("n") === 2, 5000L)
      .when(col("i") === 1 || col("i") === col("n"), 4000L)
      .otherwise(expr("2000 div (n - 2)") +
        when(col("i") - 1 <= expr("2000 % (n - 2)"), 1L).otherwise(0L))
    val perUser = sized.withColumn("bp", bp)
      .groupBy("user_id").agg(sum("bp").as("total"))
    assert(perUser.filter(col("total") =!= 10000L).count() === 0,
      "largest-remainder credit must conserve 10000 bp exactly")
    assert(perUser.count() > 0)
  }

  test("q222 CUSUM: the running-min identity reproduces the " +
      "sequential max(0, S + y) recurrence") {
    val out = graft.queries.AnalyticsQueries.q222Cusum(spark, dir)
      .collect()
    assert(out.nonEmpty)
    // replay one series sequentially
    val hourly = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "click")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd-HH").as("hour"))
      .agg(count(lit(1)).as("c"))
      .orderBy("hour").collect()
    val cs = hourly.map(_.getAs[Long]("c"))
    val ref = cs.sum / cs.length
    var s0 = 0L; var peak = 0L
    cs.foreach { c =>
      s0 = math.max(0L, s0 + (c - ref)); peak = math.max(peak, s0)
    }
    val clickRow = out.find(_.getAs[String]("event_type") == "click").get
    assert(clickRow.getAs[Long]("peak_cusum") === peak)
    assert(clickRow.getAs[Long]("ref") === ref)
  }

  test("q223 FIFO: every part matches exactly min(supply, demand) and " +
      "pair count stays within the m+n-1 sorted-interval bound") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").as("part"), col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        col("l_quantity").cast("long").as("qty"),
        (col("l_linenumber") % 2 === 0).as("is_purchase"))
    def cum(flag: Boolean) = {
      val w = Window.partitionBy("part").orderBy("ok", "ln", "qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.filter(col("is_purchase") === flag)
        .withColumn("hi", sum("qty").over(w))
        .withColumn("lo", col("hi") - col("qty"))
        .select(col("part"), col("lo"), col("hi"))
    }
    val p = cum(true).withColumnRenamed("lo", "p_lo")
      .withColumnRenamed("hi", "p_hi")
    val sl = cum(false).withColumnRenamed("lo", "s_lo")
      .withColumnRenamed("hi", "s_hi")
    val matched = p.join(sl, Seq("part"))
      .filter(col("p_lo") < col("s_hi") && col("s_lo") < col("p_hi"))
      .withColumn("alloc", least(col("p_hi"), col("s_hi")) -
        greatest(col("p_lo"), col("s_lo")))
    val perPart = matched.groupBy("part")
      .agg(sum("alloc").as("m_qty"), count(lit(1)).as("n_pairs"))
      .join(p.groupBy("part").agg(max("p_hi").as("supply"),
        count(lit(1)).as("m")), Seq("part"))
      .join(sl.groupBy("part").agg(max("s_hi").as("demand"),
        count(lit(1)).as("n")), Seq("part"))
    assert(perPart.filter(
      col("m_qty") =!= least(col("supply"), col("demand"))).count() === 0,
      "FIFO must fully match min(supply, demand) per part")
    assert(perPart.filter(
      col("n_pairs") > col("m") + col("n") - 1).count() === 0,
      "sorted interval partitions overlap in at most m+n-1 pairs")
  }

  test("q224 business-day counter agrees with a literal day walk") {
    val anchor = java.time.LocalDate.parse("1994-12-26")
    def f(d: java.time.LocalDate): Long = {
      val n = java.time.temporal.ChronoUnit.DAYS.between(anchor, d)
      5 * (n / 7) + math.min(n % 7, 5)
    }
    def walk(a: java.time.LocalDate, b: java.time.LocalDate): Long =
      Iterator.iterate(a)(_.plusDays(1)).takeWhile(_.isBefore(b))
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    val pairs = Seq(
      ("1995-01-01", "1995-01-02"), ("1995-01-06", "1995-01-09"),
      ("1995-03-04", "1995-03-06"), ("1995-01-01", "1996-02-29"),
      ("1999-12-31", "2000-01-03"))
    pairs.foreach { case (a, b) =>
      val (da, db) =
        (java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
      assert(f(db) - f(da) === walk(da, db),
        s"closed form diverges from the day walk on [$a, $b)")
    }
  }

  test("q226 fingerprint clustering: members of a cluster share the " +
      "same distinct-token set") {
    val out = graft.queries.WarehouseQueries
      .q226FingerprintCluster(spark, dir).collect()
    assert(out.nonEmpty, "the part fixture must produce collisions")
    out.foreach { r =>
      val fp = r.getAs[String]("fingerprint")
      val toks = fp.split(" ")
      assert(toks.sorted.sameElements(toks) && toks.distinct.length
        === toks.length, s"non-canonical fingerprint: $fp")
      assert(r.getAs[Long]("n_parts") > 1)
    }
  }

  test("q232 partition evolution: each layout's scan is pruned by its " +
      "own partition vocabulary (PartitionFilters on month and on day)") {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_pevo_spec_").toString
    try {
      li.filter(col("month") < "1996-07")
        .write.partitionBy("month").parquet(s"$root/by_month")
      li.filter(col("month") >= "1996-07")
        .write.partitionBy("day").parquet(s"$root/by_day")
      def prunedScan(path: String, c: String, lo: String, hi: String) = {
        val df = spark.read.parquet(path)
          .filter(col(c) >= lo && col(c) < hi)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      val histPlan = prunedScan(s"$root/by_month", "month",
        "1996-05", "1996-07")
      val curPlan = prunedScan(s"$root/by_day", "day",
        "1996-07-01", "1996-09-01")
      assert(histPlan.contains("PartitionFilters") &&
        histPlan.contains("month"), histPlan.take(400))
      assert(curPlan.contains("PartitionFilters") &&
        curPlan.contains("day"), curPlan.take(400))
      // the seam loses and doubles nothing: union across layouts ==
      // direct filter on the facts
      val unioned = spark.read.parquet(s"$root/by_month")
        .filter(col("month") >= "1996-05" && col("month") < "1996-07")
        .select("cents")
        .unionByName(spark.read.parquet(s"$root/by_day")
          .filter(col("day") >= "1996-07-01" && col("day") < "1996-09-01")
          .select("cents"))
      val direct = li.filter(col("day") >= "1996-05-01" &&
        col("day") < "1996-09-01").select("cents")
      assert(unioned.count() === direct.count())
      assert(unioned.agg(sum("cents")).first().getLong(0) ===
        direct.agg(sum("cents")).first().getLong(0))
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q213 bitmap intersection ≡ naive count-distinct intersection") {
    import spark.implicits._
    val bm = graft.queries.WarehouseQueries
      .q213BitmapIntersect(spark, dir)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type", "user_id").distinct()
    val naive = ev.as("a")
      .join(ev.as("b"), col("a.user_id") === col("b.user_id"))
      .filter(col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_common_users"))
    assert(bm.exceptAll(naive).count() === 0 &&
      naive.exceptAll(bm).count() === 0)
    assert(bm.agg(sum("n_common_users")).first().getLong(0) > 0)
  }
}
