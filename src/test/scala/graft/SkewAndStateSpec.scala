package graft

import graft.operators.{SkewJoin, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, Trigger}

case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class Sess(user_id: Long, n_events: Long, sum_value: Double)

class SkewAndStateSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i % 7 else 42, s"l$i")).toDF("k", "lv")
    val right = (0 to 50).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .orderBy("k", "lv", "rv").collect()
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), 8)
      .orderBy("k", "lv", "rv").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("hotKeys finds only keys above threshold") {
    val df = (1 to 100).map(i => if (i <= 80) "hot" else s"cold$i")
      .toDF("k")
    val hot = SkewJoin.hotKeys(df, Seq("k"), 10).collect()
    assert(hot.length == 1 && hot(0).getString(0) == "hot" &&
      hot(0).getLong(1) == 80)
  }

  test("ivfTopK: nProbe=all centroids reproduces brute-force top-k") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(64)(j => (((i * 17 + j * 3) % 23).toFloat - 11) / 11f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    // probing every cell makes IVF exact → must equal brute force
    val ivf = Similarity.ivfTopK(q, vecs, numCentroids = 4, nProbe = 4, k = 3)
      .select("qid", "did", "rank").orderBy("qid", "rank").collect()
    val bf = Similarity.bruteForceTopK(q, vecs, 3)
      .select("qid", "did", "rank").orderBy("qid", "rank").collect()
    assert(ivf.toSeq == bf.toSeq)
  }

  test("ivfTopKWith over TRAINED centroids: nProbe=all cells reproduces " +
      "brute-force top-k (the recall upper bound of the trained index)") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(64)(j => (((i * 17 + j * 3) % 23).toFloat - 11) / 11f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val trained = Similarity.kmeansCentroids(vecs, k = 4, iters = 2)
    assert(trained.count() == 4)
    val ivf = Similarity.ivfTopKWith(q, vecs, trained, nProbe = 4, k = 3)
      .select("qid", "did", "rank").orderBy("qid", "rank").collect()
    val bf = Similarity.bruteForceTopK(q, vecs, 3)
      .select("qid", "did", "rank").orderBy("qid", "rank").collect()
    assert(ivf.toSeq == bf.toSeq)
  }

  test("ivfTopKWith: null/empty-embedding rows drop out of cells and " +
      "top-k instead of landing in the lowest-cid cell") {
    val clean = (0L until 40L).map(i =>
      (i, Array.tabulate(64)(j => (((i * 17 + j * 3) % 23).toFloat - 11) / 11f)))
      .toDF("vec_id", "embedding")
    val dirty = clean.unionByName(Seq(
        (98L, null.asInstanceOf[Array[Float]]),
        (99L, Array.empty[Float]))
      .toDF("vec_id", "embedding"))
    val trained = Similarity.kmeansCentroids(clean, k = 4, iters = 1)
    val res = Similarity.ivfTopKWith(
      dirty.filter(col("vec_id") < 3 || col("vec_id") >= 98L),
      dirty, trained, nProbe = 4, k = 3).collect()
    // the degenerate rows appear as neither query nor candidate
    assert(!res.exists(r => r.getLong(0) >= 98L || r.getLong(1) >= 98L))
    // and the clean queries still get their full exact top-k
    val bf = Similarity.bruteForceTopK(
      clean.filter(col("vec_id") < 3), clean, 3)
      .select("qid", "did", "rank").orderBy("qid", "rank").collect()
    val got = res.sortBy(r => (r.getLong(0), r.getInt(3)))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSeq == bf.map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq)
  }

  test("mapGroupsWithState: custom per-key streaming state counts events " +
    "per user (AvailableNow)") {
    // stream the sf0.001 events through a custom stateful aggregation
    graft.io.Sources.harnessReadConf(spark)
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.io.Sources.normalizeNsTs(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir), "ts")
      .select("user_id", "ts", "value").as[Ev]
    val counted = stream.groupByKey(_.user_id)
      .mapGroupsWithState[Sess, Sess](GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[Ev], state: GroupState[Sess]) =>
          val prev = state.getOption.getOrElse(Sess(uid, 0L, 0.0))
          var n = prev.n_events; var sv = prev.sum_value
          events.foreach { e => n += 1; sv += e.value }
          val next = Sess(uid, n, sv)
          state.update(next)
          next
      }
    val q = counted.writeStream.format("memory").queryName("sess_counts")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sess_counts")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = got.join(expected, "user_id")
      .filter(col("n_events") =!= col("n"))
    assert(joined.count() == 0)
  }
}
