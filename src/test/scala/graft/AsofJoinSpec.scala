package graft

import graft.operators.{AsofJoin, Similarity}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Backward as-of join semantics (operators/AsofJoin) and embedding-
  * cosine near-dup pairs (Similarity.cosineNearDupPairs). */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofBackward picks the latest right row at or before each left " +
    "ts; unmatched left rows keep nulls") {
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")), // after two quotes → q2
      (2L, "k1", ts("2024-01-01 08:30:00")), // between q1 and q2 → q1
      (3L, "k1", ts("2024-01-01 07:00:00")), // before any quote → null
      (4L, "k2", ts("2024-01-01 10:00:00")), // exact tie with q3 → q3
      (5L, "k3", ts("2024-01-01 10:00:00"))  // key with no quotes → null
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", ts("2024-01-01 08:00:00"), 100.0), // q1
      ("k1", ts("2024-01-01 09:00:00"), 200.0), // q2
      ("k2", ts("2024-01-01 10:00:00"), 300.0)  // q3
    ).toDF("key", "qt", "price")
    val out = AsofJoin.asofBackward(left, right, "key", "t", "qt",
        Seq("price", "qt"))
      .orderBy("id")
      .select("id", "price")
      .as[(Long, Option[Double])].collect()
    assert(out === Seq(1L -> Some(200.0), 2L -> Some(100.0), 3L -> None,
      4L -> Some(300.0), 5L -> None))
  }

  test("asofBackward preserves a null field inside the matched row " +
    "(does not carry an older non-null value past a newer null)") {
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("id", "key", "t")
    val right = Seq(
      ("k", ts("2024-01-01 08:00:00"), Some(100.0)),
      ("k", ts("2024-01-01 09:00:00"), None: Option[Double])
    ).toDF("key", "qt", "price")
    val out = AsofJoin.asofBackward(left, right, "key", "t", "qt",
      Seq("price")).select("price").as[Option[Double]].collect()
    assert(out === Seq(None), "matched row's own null must win")
  }

  test("cosineNearDupPairs finds planted duplicates and only ordered " +
    "pairs") {
    val base = (0L until 20L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j + 1).toFloat))
    }
    val corpus = (base ++ base.take(5).map { case (i, v) => (i + 100, v) })
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(corpus, numPlanes = 6,
        threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 5L).map(i => (i, i + 100)).toSet
    assert(planted.subsetOf(pairs),
      s"exact copies must all be found; got $pairs")
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("semanticDedup flags planted copies (keep-lowest-id), keeps " +
    "originals, and drops null/empty embeddings from the output") {
    val base = (0L until 20L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j + 1).toFloat))
    }
    val corpus = (base ++ base.take(5).map { case (i, v) => (i + 100, v) })
      .toDF("vec_id", "embedding")
      .unionByName(Seq((900L, Array.empty[Float]))
        .toDF("vec_id", "embedding"))
    val out = Similarity.semanticDedup(corpus, numCentroids = 4,
        threshold = 0.99)
      .select("did", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(out.size == 25, "empty-embedding row must be dropped")
    (100L until 105L).foreach(i => assert(out(i),
      s"planted copy $i must be flagged"))
    (0L until 5L).foreach(i => assert(!out(i),
      s"original $i is the kept (lowest-id) member"))
  }

  test("pqTopK degenerates to exact L2 ranking when every vector is " +
    "its own centroid (1 subspace, codebookSize = |corpus|)") {
    val vecs = (0L until 10L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(corpus.filter(col("vec_id") < 3), corpus,
        subspaces = 1, codebookSize = 10, topK = 3)
      .select("qid", "rank", "did").as[(Long, Int, Long)]
      .collect().toSet
    // expected: exact integer squared-L2 ranking, ties by did
    def q(x: Float) = math.round(x.toDouble * 1e6)
    val qv = vecs.map { case (i, v) => i -> v.map(q) }.toMap
    def l2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0L until 3L).flatMap { qi =>
      (0L until 10L).map(di => (di, l2(qv(qi), qv(di))))
        .sortBy { case (di, d) => (d, di) }.take(3).zipWithIndex
        .map { case ((di, _), r) => (qi, r + 1, di) }
    }.toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("pqTopK: an exact copy shares its original's codes, so both " +
    "score the same ADC distance against any query") {
    val base = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => math.cos(i * 8 + j + 1).toFloat))
    }
    val corpus = (base ++ Seq((100L, base(3)._2))) // copy of vec 3
      .toDF("vec_id", "embedding")
    val dists = Similarity.pqTopK(corpus.filter(col("vec_id") < 2),
        corpus, subspaces = 2, codebookSize = 3, topK = 13)
      .select("qid", "did", "approx_dist").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    dists.foreach { case (qid, rows) =>
      val byDid = rows.map(r => r._2 -> r._3).toMap
      assert(byDid(3L) == byDid(100L),
        s"query $qid: copy scored ${byDid(100L)} != original ${byDid(3L)}")
    }
  }

  test("ivfPqTopK with every cell probed equals pqTopK exactly " +
    "(recall upper bound of the coarse pruning)") {
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "did", "approx_dist")
        .as[(Long, Int, Long, Long)].collect().toSet
    val full = rows(Similarity.pqTopK(qs, vecs, subspaces = 2,
      codebookSize = 3, topK = 4))
    val ivf = rows(Similarity.ivfPqTopK(qs, vecs, coarseCentroids = 5,
      nProbe = 5, subspaces = 2, codebookSize = 3, topK = 4))
    assert(ivf == full, s"ivf=$ivf full=$full")
  }

  test("ivfPqResidualTopK with one vector per cell and every cell " +
    "probed yields EXACT squared-L2 distances regardless of codebook " +
    "size — the residual property the non-residual variant lacks") {
    // |corpus| coarse centroids → every residual is the zero vector →
    // the codebook collapses to zero and ADC dist(q in cell c) =
    // ||q − centroid_c||² = exact L2 to the cell's one vector
    val vecs = (0L until 10L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val got = Similarity.ivfPqResidualTopK(
        corpus.filter(col("vec_id") < 3), corpus,
        coarseCentroids = 10, nProbe = 10, subspaces = 2,
        codebookSize = 3, topK = 3)
      .select("qid", "rank", "did", "approx_dist")
      .as[(Long, Int, Long, Long)].collect().toSet
    def q(x: Float) = math.round(x.toDouble * 1e6)
    val qv = vecs.map { case (i, v) => i -> v.map(q) }.toMap
    def l2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0L until 3L).flatMap { qi =>
      (0L until 10L).map(di => (di, l2(qv(qi), qv(di))))
        .sortBy { case (di, d) => (d, di) }.take(3).zipWithIndex
        .map { case ((di, d), r) => (qi, r + 1, di, d) }
    }.toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("pqTopK and ivfPqTopK drop null/empty embeddings instead of " +
    "assigning them arbitrary codes, and leave no persistent RDDs") {
    val good = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat))
    }
    val corpus = (good :+ ((900L, Array.empty[Float])))
      .toDF("vec_id", "embedding")
      .unionByName(Seq((901L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val qs = corpus.filter(col("vec_id") < 2 || col("vec_id") >= 900)
    def dids(df: org.apache.spark.sql.DataFrame) = {
      val rows = df.select("qid", "did").as[(Long, Long)].collect()
      (rows.map(_._1).toSet, rows.map(_._2).toSet)
    }
    Seq(
      Similarity.pqTopK(qs, corpus, 2, 3, 10),
      Similarity.ivfPqTopK(qs, corpus, 3, 3, 2, 3, 10)
    ).foreach { out =>
      val (qids, ds) = dids(out)
      assert(qids == Set(0L, 1L), s"null queries must drop: $qids")
      assert(!ds.contains(900L) && !ds.contains(901L),
        s"null corpus rows must never be retrieved: $ds")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "pq slice caches must be released")
  }

  test("semanticDedup copies land in their original's cell") {
    val base = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => math.cos(i * 8 + j + 1).toFloat))
    }
    val corpus = (base ++ base.map { case (i, v) => (i + 100, v) })
      .toDF("vec_id", "embedding")
    val cells = Similarity.semanticDedup(corpus, numCentroids = 3,
        threshold = 0.99)
      .select("did", "cid").as[(Long, Long)].collect().toMap
    base.foreach { case (i, _) =>
      assert(cells(i) == cells(i + 100),
        s"copy of $i assigned cell ${cells(i + 100)} != ${cells(i)}")
    }
  }
}
