package graft

import graft.operators.{BloomJoin, FrequentItems, ManifestSkip,
  SnapshotDiff, Upsert}
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("changeFeed classifies I/U/D and drops unchanged keys") {
    val oldSnap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")
    val newSnap = Seq((2L, "b", 20.0),        // unchanged → absent
      (3L, "c", 99.0),                        // U (v changed)
      (4L, null.asInstanceOf[String], 40.0),  // unchanged w/ null payload
      (5L, "e", 50.0)).toDF("k", "s", "v")    // I; key 1 → D
    val feed = SnapshotDiff.changeFeed(oldSnap, newSnap, Seq("k"))
      .orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(feed == Seq(1L -> "D", 3L -> "U", 5L -> "I"))
  }

  test("changeFeed null payload flips are U, not unchanged") {
    val oldSnap = Seq[(Long, Option[Int])]((1L, Some(7)), (2L, None))
      .toDF("k", "v")
    val newSnap = Seq[(Long, Option[Int])]((1L, None), (2L, None))
      .toDF("k", "v")
    val feed = SnapshotDiff.changeFeed(oldSnap, newSnap, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feed == Map(1L -> "U")) // null <=> null is unchanged, 7→null is U
  }

  test("changeFeed round-trip: applying the feed to old reproduces new") {
    val oldSnap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val newSnap = Seq((2L, 21.0), (3L, 30.0), (4L, 44.0)).toDF("k", "v")
    val feed = SnapshotDiff.changeFeed(oldSnap, newSnap, Seq("k"))
    // replay: D deletes, I/U replace the key's payload
    val survivors = oldSnap.join(
        feed.select(col("k"), col("op")), Seq("k"), "left")
      .filter(col("op").isNull).select("k", "v")
      .unionByName(feed.filter(col("op") =!= "D")
        .select(col("k"), col("new_v").as("v")))
    val got = survivors.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = newSnap.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("bloom prefilter + exact join equals the plain join, and prunes") {
    val probe = spark.range(10000).select(col("id").as("k"),
      (col("id") % 997).as("payload"))
    val build = spark.range(10000).filter(col("id") % 50 === 0)
      .select(col("id").as("k")) // 2% selective
    val bloom = BloomJoin.keyFilter(build, "k", expectedKeys = 200)
    val pre = BloomJoin.prefilter(probe, "k", bloom)
    val preCount = pre.count()
    // fpp=1% on 10k probes: expect ~200 true + ~100 false positives;
    // the prune must be real (≪ 10000) and lossless (⊇ true matches)
    assert(preCount < 1000, s"bloom pruned nothing: $preCount")
    val viaBloom = pre.join(build, Seq("k")).orderBy("k").collect()
    val plain = probe.join(build, Seq("k")).orderBy("k").collect()
    assert(viaBloom.toSeq == plain.toSeq)
  }

  test("bloom prefilter keeps null keys out (null never equi-joins)") {
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val build = Seq(1L).toDF("k")
    val bloom = BloomJoin.keyFilter(build, "k", expectedKeys = 1)
    val kept = BloomJoin.prefilter(probe, "k", bloom)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("manifest prune: range layout skips files, scattered layout reads all") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val df = spark.range(1000).select(col("id").as("k"),
      (col("id") % 13).as("v"))
    // range-clustered: 4 files with disjoint k ranges
    df.repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(s"$dir/ranged")
    val mRanged = ManifestSkip.buildManifest(spark, s"$dir/ranged", "k")
    val (rows, nRead, nTotal) = ManifestSkip.prunedRead(spark,
      s"$dir/ranged", mRanged, "k", lit(100L), lit(199L))
    assert(nTotal == 4 && nRead < nTotal,
      s"range layout should prune: read $nRead of $nTotal")
    assert(rows.count() == 100)
    // hash-scattered: every file spans the domain -> no prune, still exact
    df.repartition(4, col("v"))
      .write.mode("overwrite").parquet(s"$dir/scattered")
    val mScat = ManifestSkip.buildManifest(spark, s"$dir/scattered", "k")
    val (rows2, nRead2, nTotal2) = ManifestSkip.prunedRead(spark,
      s"$dir/scattered", mScat, "k", lit(100L), lit(199L))
    assert(nRead2 == nTotal2, "scattered layout intersects everywhere")
    assert(rows2.count() == 100)
    // empty selection: schema survives, zero rows
    val (rows3, nRead3, _) = ManifestSkip.prunedRead(spark,
      s"$dir/ranged", mRanged, "k", lit(5000L), lit(6000L))
    assert(nRead3 == 0 && rows3.count() == 0)
    assert(rows3.columns.toSeq == Seq("k", "v"))
  }

  test("bloom index prunes point lookups on the hash-scattered layout " +
      "where min/max prunes nothing, with zero false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("bloomidx").toString
    val df = spark.range(1000).select(col("id").as("k"),
      (col("id") % 13).as("v"))
    // the min/max-adversarial layout: every file spans the full k range
    // (hashing k scatters consecutive keys across all 8 files, and
    // every partition is non-empty at 1000 keys / 8 buckets)
    df.repartition(8, col("k"))
      .write.mode("overwrite").parquet(s"$dir/scattered")
    val keys = Seq(7L, 311L, 642L, 999L)
    // min/max reads everything for a point range on this layout...
    val mm = ManifestSkip.buildManifest(spark, s"$dir/scattered", "k")
    val (_, mmRead, mmTotal) = ManifestSkip.prunedRead(spark,
      s"$dir/scattered", mm, "k", lit(311L), lit(311L))
    assert(mmRead == mmTotal, "min/max should be useless here")
    // ...the bloom index does not
    val idx = ManifestSkip.buildBloomIndex(spark, s"$dir/scattered", "k",
      expectedKeysPerFile = 200L)
    assert(idx.count() == 8 && idx.schema("bloom").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val (rows, nRead, nTotal) = ManifestSkip.bloomPrunedRead(spark,
      s"$dir/scattered", idx, "k", keys)
    assert(nTotal == 8 && nRead < nTotal,
      s"bloom should prune: read $nRead of $nTotal")
    // losslessness: exactly the full-scan IN-filter's rows
    val expected = df.filter(col("k").isin(keys: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == expected)
    // absent probe keys: no false negatives by definition, and the
    // result is empty but schema-correct
    val (none, _, _) = ManifestSkip.bloomPrunedRead(spark,
      s"$dir/scattered", idx, "k", Seq(123456L))
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))
  }

  test("hll sketch union is a merge semilattice: partitioned build + " +
      "union estimates like the direct build, within the error bound, " +
      "deterministically") {
    val df = spark.range(5000).select((col("id") % 700).as("k"),
      (col("id") % 12).as("m"))
    def est(c: org.apache.spark.sql.Column): Long =
      df.groupBy("m").agg(hll_sketch_agg(col("k")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
        .collect()(0).getLong(0)
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"))).as("e"))
      .collect()(0).getLong(0)
    val merged = est(col("sk"))
    // both within the lgK=12 bound of the true 700 (generous 5%)
    assert(math.abs(direct - 700L) <= 35, s"direct=$direct")
    assert(math.abs(merged - 700L) <= 35, s"merged=$merged")
    // determinism: same input → same estimate, run-to-run
    assert(est(col("sk")) == merged)
  }

  test("exactFrequent equals plain group-count thresholding") {
    // skewed stream: token t0 40%, t1 20%, 40 rare tokens share the rest
    val toks = spark.range(10000).select(
      when(col("id") % 10 < 4, "t0")
        .when(col("id") % 10 < 6, "t1")
        .otherwise(concat(lit("rare"), col("id") % 40)).as("token"))
      .repartition(8) // several partitions so the MG pass is genuinely partial
    val got = FrequentItems.exactFrequent(toks, "token", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 8 > 10000)
      .orderBy(col("cnt").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty && got == want)
  }

  test("exactFrequent: no hitters above threshold returns empty") {
    val toks = spark.range(1000)
      .select(concat(lit("u"), col("id") % 100).as("token"))
    // uniform 1% each; threshold at k=50 is 2% -> nothing qualifies
    val got = FrequentItems.exactFrequent(toks, "token", k = 50)
    assert(got.count() == 0)
  }

  test("changeFeed composes with applyCdc: generated feed applies clean") {
    val oldSnap = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val newSnap = Seq((1L, 11.0), (3L, 33.0)).toDF("k", "v")
    val feed = SnapshotDiff.changeFeed(oldSnap, newSnap, Seq("k"))
      .withColumn("seq", lit(1L))
      .select(col("k"), col("seq"), col("op"),
        coalesce(col("new_v"), col("old_v")).as("v"))
    // snapshot-diff feeds have one row per key → unique-seq holds
    val applied = Upsert.applyCdc(feed, Seq("k"), "seq", "op",
        assertUniqueSeq = true)
      .select("k", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // applyCdc compacts the FEED: I/U rows survive, D rows vanish
    assert(applied == Seq((1L, 11.0), (3L, 33.0)))
  }

  test("q196 theta sketches: every estimate lands inside the pinned " +
      "bound and the exact counts obey inclusion-exclusion") {
    val r = graft.queries.MaintenanceQueries
      .q196ThetaSketches(spark, "/root/testdata/sf0.001").head()
    val (inter, union, diff) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
      "lgK=16 keeps the sketches exact-mode at this SF")
    // |A| = |A\\B| + |A∩B|; |A∪B| = |A| + |B| − |A∩B|
    val orders = graft.io.Sources
      .table(spark, "/root/testdata/sf0.001", "orders")
    val a = orders.filter(col("o_orderkey") % 3 === 0).count()
    val b = orders.filter(col("o_orderkey") % 5 === 0).count()
    assert(diff + inter == a)
    assert(union == a + b - inter)
  }

  test("q197 equi-depth histogram: 8 buckets within one row of each " +
      "other, ranges non-overlapping, population complete") {
    val rows = graft.queries.AnalyticsQueries
      .q197EquidepthHist(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 8))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"equi-depth: ${sizes.toSeq}")
    val total = graft.io.Sources
      .table(spark, "/root/testdata/sf0.001", "orders").count()
    assert(sizes.sum == total)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(3) <= hi.getLong(2),
        "bucket value ranges must not overlap")
    case _ => ()
    }
  }

  test("q198 CDC net effect: compacting two sequential feeds equals the " +
      "single day0->day2 diff, and every op class is exercised") {
    val dir = "/root/testdata/sf0.001"
    val net = graft.queries.MaintenanceQueries
      .q198CdcNetEffect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val ops = net.map(_._2).toSet
    assert(ops == Set("I", "U", "D"),
      s"the mod arithmetic must exercise all three op classes: $ops")
    // engine-internal parity: recompute the one-shot diff with the
    // same operator the feeds came from
    val orders = graft.io.Sources.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val s0 = orders.filter(col("o_orderkey") % 7 =!= 0)
    val s2 = orders.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 4 === 0, col("o_totalprice") + 25.0)
          .otherwise(col("o_totalprice")))
    val direct = graft.operators.SnapshotDiff
      .changeFeed(s0, s2, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("op"),
        col("old_o_totalprice"), col("new_o_totalprice"))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(net == direct,
      "net(feed(s0,s1), feed(s1,s2)) must equal feed(s0,s2) exactly")
  }

  test("q199 seasonal anomaly: one hour-of-day recomputed directly " +
      "matches the two-pass exact-moment form") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.AnalyticsQueries
      .q199SeasonalAnomaly(spark, dir).collect()
    assert(out.nonEmpty && out.forall(_.getDouble(3) >= 0.0))
    val h0 = out.head
    val cs = graft.io.Sources.table(spark, dir, "events")
      .filter(col("value").isNotNull)
      .filter(hour(col("ts")) === h0.getInt(0))
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0))
    val n = cs.length.toLong
    assert(h0.getLong(1) == n)
    val sc = cs.map(BigInt(_)).sum
    val maxdev = cs.map(c => (BigInt(c) * n - sc).abs).max
    assert(h0.getDouble(2) == sc.toDouble / n.toDouble)
    assert(h0.getDouble(3) == maxdev.toDouble / n.toDouble)
  }

  test("compactSink fails loudly when a manifest live file is missing " +
      "on disk (batched listing must not silently undercount)") {
    val root = java.nio.file.Files.createTempDirectory("cmiss").toString
    val sink = s"$root/sink"
    try {
      spark.range(1000).selectExpr("id", "id * 2 AS v")
        .repartition(3).write.parquet(sink)
      val hp = new org.apache.hadoop.fs.Path(sink)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (_, live) = graft.operators.CommitLog.ensureLoggedAt(fs, hp)
      assert(live.size == 3)
      // simulate manifest/filesystem disagreement: one live file gone
      fs.delete(new org.apache.hadoop.fs.Path(hp, live.head), false)
      val e = intercept[IllegalArgumentException] {
        graft.operators.Compact.compactSink(spark, sink,
          targetBytes = 1L)
      }
      assert(e.getMessage.contains("missing on disk"), e.getMessage)
      assert(e.getMessage.contains(live.head), e.getMessage)
    } finally graft.io.Sources.deleteRecursively(root)
  }
}
