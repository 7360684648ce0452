package graft

import graft.operators.{BloomJoin, SnapshotDiff, Upsert}
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
}
