package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.queries.LearnedQueries

/** Semantics of the learned-tier operators (q176-q180): RRF arithmetic,
  * GD contraction, NB probability identities, the streaming-merge sink's
  * commit trail, and the BPE merge rule pinned on a handcrafted corpus.
  * (Cross-engine value equality is the oracle gate's job; these specs own
  * the invariants an oracle diff can't express.) */
class LearnedQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q176 RRF: fused score is exactly the sum of the reciprocal-rank " +
      "contributions, rows are sorted by it, and a doc ranked by both " +
      "rankers beats one with the same single rank") {
    val rows = LearnedQueries.q176RrfFusion(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    def contrib(r: Any): Double = r match {
      case null => 0.0
      case i: Int => 1.0 / (60.0 + i.toDouble)
    }
    rows.foreach { r =>
      val expected = contrib(r.get(1)) + contrib(r.get(2))
      assert(r.getDouble(3) == expected,
        s"rrf must be the exact two-term sum for doc ${r.get(0)}")
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "output must be sorted by fused score descending")
    // any doc present in BOTH lists strictly beats a doc holding only
    // one rank ≥ its worse rank (1/(60+r) is positive and decreasing)
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    for (b <- both; s <- single) {
      val worse = math.max(b.getInt(1), b.getInt(2))
      val sRank = if (s.isNullAt(1)) s.getInt(2) else s.getInt(1)
      if (sRank >= worse)
        assert(b.getDouble(3) > s.getDouble(3))
    }
  }

  test("q177 GD training: the iterate sequence contracts (each step " +
      "moves less than the previous one) and stays finite") {
    val it = LearnedQueries.q177GdTraining(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(it.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val w = Array((0.0, 0.0)) ++ it.map(r => (r.getDouble(1), r.getDouble(2)))
    def dist(a: (Double, Double), b: (Double, Double)): Double =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val steps = w.indices.tail.map(i => dist(w(i), w(i - 1)))
    assert(steps.forall(s => java.lang.Double.isFinite(s) && s > 0))
    assert(steps(1) < steps(0) && steps(2) < steps(1),
      s"GD with lr·λmax < 1 must contract monotonically, got $steps")
  }

  test("q178 NB model: ranks are 1..5 per class, probabilities obey the " +
      "Laplace identity against independently recomputed totals, and " +
      "priors sum to 1 over the classes") {
    val out = LearnedQueries.q178NaiveBayes(spark, dir).collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // rank order is count order with token tie-break
      val sorted = rs.sortBy(_.getInt(3))
      val counts = sorted.map(_.getLong(2))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
    // recompute tot (per class) and V independently, then check the
    // exact division the query claims to perform
    val toks = graft.io.Sources.table(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
    val v = toks.select("token").distinct().count()
    val tot = toks.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val expected = (r.getLong(2) + 1).toDouble /
        (tot(r.getString(0)) + v).toDouble
      assert(r.getDouble(4) == expected)
    }
    val priors = byLang.view.mapValues(_.head.getDouble(5)).values.sum
    assert(math.abs(priors - 1.0) < 1e-12)
  }

  test("q179 streaming merge sink: three micro-batches leave three merge " +
      "generations in the commit log, and the sink state matches the " +
      "batch recomputation") {
    // run the query through a probe on the commit trail: rebuild the
    // same flow but keep the temp root to inspect the log
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_smerge_spec_").toString
    try {
      val ev = graft.io.Sources.table(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      ev.write.parquet(s"$root/sink")
      val newVal = (col("event_id") % 1000).cast("double") / lit(100.0)
      val clicks = ev.filter(col("event_type") === "click")
      val updates = clicks
        .select(col("event_id"), col("user_id"), col("event_type"),
          newVal.as("value"))
        .unionAll(clicks.select(
          (col("event_id") + 10000000L).as("event_id"), col("user_id"),
          lit("synthetic").as("event_type"), newVal.as("value")))
      (0 until 3).foreach { b =>
        graft.operators.Merge.mergeParquet(spark,
          updates.filter(col("event_id") % 3 === b),
          Seq("event_id"), s"$root/sink")
      }
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val gens = graft.operators.CommitLog
        .generations(fs, new Path(s"$root/sink"))
      assert(gens.size >= 4,
        s"bootstrap + three merges must each commit a generation: $gens")
      val fin = graft.operators.CommitLog.read(spark, s"$root/sink")
      val nEvents = ev.count()
      val nClicks = clicks.count()
      assert(fin.count() == nEvents + nClicks,
        "all originals survive, every click key also inserts one row")
      // a matched click row carries the rewritten value
      val sample = fin.filter(col("event_type") === "click")
        .select(col("event_id"),
          (col("event_id") % 1000).cast("double") / lit(100.0),
          col("value")).collect()
      sample.foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q181 k-fold CV: train/val moments partition the corpus exactly, " +
      "and each fold's leave-out slope equals OLS retrained from scratch " +
      "on the complement") {
    val out = LearnedQueries.q181KfoldCv(spark, dir).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L to 4L))
    val li = graft.io.Sources.table(spark, dir, "lineitem")
    val total = li.count()
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == total,
        "n_train + n_val must partition the corpus for every fold")
      assert(r.getLong(2) > 0 && java.lang.Double.isFinite(r.getDouble(5)))
    }
    // independent retrain of fold 0's complement through q125's moment
    // formula over a filtered scan — must match the subtraction path
    // bit-for-bit (both are exact decimal moments)
    val fold = pmod(graft.operators.Dedup.hash60(
      concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"))), lit(5L))
    val dec = "decimal(38,0)"
    val rest = li.filter(fold =!= 0L).select(
      col("l_quantity").cast("long").cast(dec).as("x"),
      expr(s"CAST(CAST(round(l_extendedprice) AS BIGINT) AS $dec)")
        .as("y"))
    val m = rest.agg(count(lit(1)).cast(dec).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"))
      .head().getDouble(0)
    val fold0 = out.find(_.getLong(0) == 0L).get
    assert(fold0.getDouble(3) == m,
      "moment subtraction must equal the from-scratch complement retrain")
  }

  test("q182 token Gini: bounds and the exact identity against a " +
      "directly computed distribution") {
    val out = LearnedQueries.q182TokenGini(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0)
    }
    // recompute one returned doc's Gini from its raw token counts
    val d0 = out.head
    val toks = graft.io.Sources.table(spark, dir, "documents")
      .filter(col("doc_id") === d0.getLong(0))
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect().map(_.getLong(1))
    val n = toks.sum
    val expected = (n * n - toks.map(c => c * c).sum).toDouble / (n * n)
    assert(d0.getDouble(2) == expected && d0.getLong(1) == n)
  }

  test("q183 phrase search: every reported document really contains the " +
      "phrase exactly that many times (string-level recount)") {
    val out = LearnedQueries.q183PhraseSearch(spark, dir).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0))
    val texts = graft.io.Sources.table(spark, dir, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val n = toks.indices.dropRight(1)
        .count(i => toks(i) == "table" && toks(i + 1) == "part")
      assert(n == r.getLong(1),
        s"doc ${r.getLong(0)}: phrase recount $n != ${r.getLong(1)}")
    }
  }

  test("q184 l-diversity: the audit matches a direct recount, and a " +
      "homogeneous group is what drives rows_at_risk") {
    val out = graft.queries.ScaleQueries.q184LDiversity(spark, dir)
      .head()
    val groups = graft.io.Sources.table(spark, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"),
        countDistinct(floor(col("c_acctbal") / 1000.0).cast("long"))
          .as("l"))
      .collect()
    assert(out.getLong(0) == groups.map(_.getLong(3)).min)
    assert(out.getLong(1) == groups.length)
    assert(out.getLong(2) == groups.count(_.getLong(3) < 3))
    assert(out.getLong(3) ==
      groups.filter(_.getLong(3) < 3).map(_.getLong(2)).sum)
  }

  test("q185 Welch test: cohort sizes partition the non-null rows, the " +
      "t statistic's sign follows the mean difference, and df lies in " +
      "[min(n)-1, n_a+n_b-2]") {
    val r = LearnedQueries.q185AbTest(spark, dir).head()
    val ev = graft.io.Sources.table(spark, dir, "events")
      .filter(col("value").isNotNull)
    assert(r.getLong(0) + r.getLong(1) == ev.count())
    val (ma, mb, t, df) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.signum(ma - mb) == math.signum(t))
    val lo = math.min(r.getLong(0), r.getLong(1)).toDouble - 1.0
    val hi = (r.getLong(0) + r.getLong(1)).toDouble - 2.0
    assert(df >= lo && df <= hi,
      s"Welch df $df must sit between $lo (worst case) and $hi (pooled)")
  }

  test("q186 streaming ANN serve equals the batch index probe re-derived " +
      "from the same public LSH primitives") {
    import graft.operators.Similarity
    val out = graft.streaming.StreamingHourly.streamAnnServe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val emb = graft.io.Sources.table(spark, dir, "embeddings")
    val dims = emb.select(size(col("embedding")).as("d"))
      .filter(col("d") > 0).limit(1).head().getInt(0)
    val w = Similarity.planeWeightsLocal(6, dims)
    def b(df: org.apache.spark.sql.DataFrame, id: String, vec: String,
          norm: String) =
      df.select(col("vec_id").as(id),
          Similarity.quantize(col("embedding")).as(vec))
        .select(col(id), col(vec),
          Similarity.dotQ(col(vec), col(vec)).as(norm),
          Similarity.bucketOf(col(vec), w).as("bucket"))
    val batch = b(emb.filter(col("vec_id") < 10), "qid", "qe", "qn")
      .join(b(emb, "did", "de", "dn"), "bucket")
      .filter(col("qid") =!= col("did"))
      .select(col("qid"), col("did"),
        Similarity.cosineFrom(Similarity.dotQ(col("qe"), col("de")),
          col("qn"), col("dn")).as("cosine"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) =>
        val best = rs.minBy(r => (-r.getDouble(2), r.getLong(1)))
        (q, best.getLong(1), best.getDouble(2))
      }.toSeq.sortBy(_._1)
    assert(out.toSeq == batch,
      "two micro-batches of agg state must equal the one-shot batch probe")
  }

  test("q187 source overlap recovers a planted cross-source duplication " +
      "topology exactly (and emits no row for disjoint sources)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_overlap_spec_").toString
    try {
      // s1 = {a,b,c}, s2 = {b,c,d,d-dup}, s3 = {x} (disjoint);
      // within-source duplicate 'd' must count ONCE (distinct text sets)
      Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s1"),
          (4L, "b", "s2"), (5L, "c", "s2"), (6L, "d", "s2"),
          (7L, "d", "s2"), (8L, "x", "s3"))
        .toDF("doc_id", "text", "source")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          col("source"), length(col("text")).cast("long").as("n_chars"))
        .write.parquet(s"$root/documents.parquet")
      val out = LearnedQueries.q187SourceOverlap(spark, root).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))
      assert(out.toSeq == Seq(("s1", "s2", 2L, 3L, 3L, 0.5)),
        "only the overlapping pair appears; jaccard = 2/(3+3-2)")
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q188 retrieval eval: per-query metrics are internally consistent " +
      "and hits are bounded by k") {
    val out = LearnedQueries.q188RetrievalEval(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0 && hits <= 3)
      assert(r.getDouble(4) == hits.toDouble / 3.0)
      if (hits == 0) assert(r.isNullAt(2) && r.isNullAt(3))
      else {
        val first = r.getInt(2)
        assert(first >= 1 && first <= 3)
        assert(r.getDouble(3) == 1.0 / first.toDouble)
      }
    }
  }

  test("q189 embedding drift is zero between identical cohorts and " +
      "recovers a planted mean shift exactly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_drift_spec_").toString
    try {
      // cohort 0 = {(1,0), (3,2)}, cohort 1 = same vectors shifted by
      // (+2, +1): mean diff = (2, 1), L2 = sqrt(5) in quantized units
      Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(3.0f, 2.0f), 0),
          (3L, Seq(3.0f, 1.0f), 1), (4L, Seq(5.0f, 3.0f), 1))
        .toDF("vec_id", "embedding", "label")
        .write.parquet(s"$root/embeddings.parquet")
      val r = LearnedQueries.q189EmbeddingDrift(spark, root).head()
      assert(r.getLong(0) == 2 && r.getLong(1) == 2)
      // d2 = Σ(n_b·Σa − n_a·Σb)² = (8e6)² + (4e6)²; drift = √d2/(n_a·n_b)
      val expected = math.sqrt(8e6 * 8e6 + 4e6 * 4e6) / 4.0
      assert(r.getDouble(2) == expected,
        s"planted (2,1) shift must read sqrt(5)·10⁶: ${r.getDouble(2)}")
      // identical cohorts → zero drift
      Seq((1L, Seq(1.0f, 2.0f), 0), (2L, Seq(1.0f, 2.0f), 1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
      assert(LearnedQueries.q189EmbeddingDrift(spark, root)
        .head().getDouble(2) == 0.0)
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q190 lang-id eval: tp never exceeds either margin, and the " +
      "confusion margins sum to the corpus size") {
    val out = LearnedQueries.q190LangidEval(spark, dir).collect()
    val nDocs = graft.io.Sources.table(spark, dir, "documents").count()
    assert(out.map(_.getLong(1)).sum == nDocs,
      "true-class supports must partition the corpus")
    out.foreach { r =>
      val (nt, np, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp <= nt && tp <= np)
      if (np > 0) assert(r.getDouble(4) == tp.toDouble / np.toDouble)
      if (nt > 0) assert(r.getDouble(5) == tp.toDouble / nt.toDouble)
    }
  }

  test("q191 co-occurrence: weights decompose as adjacent + 0.5·skip on " +
      "a handcrafted corpus") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_cooc_spec_").toString
    try {
      // "a b a b": (a,b) adjacent ×2 → 2.0; (b,a) adjacent ×1 → 1.0;
      // (a,a) skip ×1 → 0.5; (b,b) skip ×1 → 0.5
      Seq((1L, "a b a b")).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("t").as("source"), length(col("text")).cast("long")
            .as("n_chars"))
        .write.parquet(s"$root/documents.parquet")
      val out = LearnedQueries.q191Cooccurrence(spark, root).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
          r.getLong(3)))
      assert(out.toSeq == Seq(("a", "b", 2.0, 2L), ("b", "a", 1.0, 1L),
        ("a", "a", 0.5, 1L), ("b", "b", 0.5, 1L)))
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q200 sparse cosine on a planted corpus: stop-terms (df > n/2) " +
      "leave the vector space, the surviving pair scores exactly 0.8") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_sparse_spec_").toString
    try {
      // x,y live in 2 of 4 docs (df = 2 = n/2, kept); "the" in all 4
      // (df 4 > 2, dropped); d1=(x:2,y:1), d2=(x:1,y:2) -> cos = 4/5
      Seq((1L, "the x x y"), (2L, "the x y y"), (3L, "the zz"),
          (4L, "the qq ww"))
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("t").as("source"), length(col("text")).cast("long")
            .as("n_chars"))
        .write.parquet(s"$root/documents.parquet")
      val out = LearnedQueries.q200SparseCosine(spark, root).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // 4 / (√5·√5) — the query's own IEEE expression, NOT 4/5: the
      // sqrt product lands one ulp above 5.0
      val expected = 4.0 / (math.sqrt(5.0) * math.sqrt(5.0))
      assert(out.head == (1L, 2L, expected),
        s"top pair must be (1,2) at ~0.8: ${out.toSeq}")
      assert(!out.exists(p => p._1 == 3L || p._2 == 3L),
        "doc 3 shares only the dropped stop-term — no pair")
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q201 MinHash calibration: error column is exactly |est - exact|, " +
      "estimates are sixteenths, and the planted tail-shift duplicates " +
      "surface with high exact Jaccard") {
    val out = LearnedQueries.q201MinhashCalibration(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (est, exact, err) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(est >= 0.0 && est <= 1.0 &&
        (est * 16).isWhole, s"est must be a sixteenth: $est")
      assert(exact >= 0.0 && exact <= 1.0)
      assert(err == math.abs(est - exact))
    }
    val planted = out.filter(r =>
      r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted.nonEmpty && planted.forall(_.getDouble(3) > 0.5),
      "a doc and its tail-shifted copy must pair with exact J > 0.5")
  }

  test("q202 script mix: per-language class fractions are bounded and " +
      "character totals match a direct recount") {
    val out = LearnedQueries.q202ScriptMix(spark, dir).collect()
    assert(out.nonEmpty)
    val direct = graft.io.Sources.table(spark, dir, "documents")
      .groupBy("lang").agg(sum(length(col("text"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == direct(r.getString(0)))
      val fr = (2 to 5).map(r.getDouble)
      assert(fr.forall(f => f >= 0.0 && f <= 1.0))
      assert(fr.sum <= 1.0 + 1e-9,
        "latin/digit/ws/cjk are disjoint classes — fractions can't " +
          "exceed 1")
    }
  }

  test("q203 TWAP: one user recomputed directly (BigInt over exact " +
      "microsecond gaps) matches the distributed form") {
    val out = LearnedQueries.q203Twap(spark, dir).collect()
    assert(out.nonEmpty)
    val u = out.head.getLong(0)
    val rows = graft.io.Sources.table(spark, dir, "events")
      .filter(col("value").isNotNull && col("user_id") === u)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    val ivs = rows.zip(rows.tail)
      .map { case ((t0, _, c), (t1, _, _)) => (BigInt(c), BigInt(t1 - t0)) }
    val num = ivs.map { case (c, dt) => c * dt }.sum
    val den = ivs.map(_._2).sum
    assert(out.head.getLong(1) == ivs.length)
    assert(out.head.getDouble(2) ==
      num.toDouble / den.toDouble)
  }

  test("q204 backfill plan: exactly the skipped 03:00/07:00 runs plus " +
      "genuinely empty hours are flagged, and none of them is ingested") {
    val missing = graft.queries.AnalyticsQueries
      .q204BackfillPlan(spark, dir).collect()
      .map(_.getTimestamp(0)).toSet
    val hours = graft.io.Sources.table(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h")).distinct()
      .collect().map(_.getTimestamp(0)).toSet
    // every hour with data at hod 3/7 must be flagged
    val skipped = hours.filter { t =>
      val c = java.util.Calendar.getInstance(
        java.util.TimeZone.getTimeZone("UTC"))
      c.setTime(t)
      Set(3, 7)(c.get(java.util.Calendar.HOUR_OF_DAY))
    }
    assert(skipped.nonEmpty && skipped.subsetOf(missing))
    // and nothing flagged is actually present outside hod 3/7
    assert(missing.intersect(hours -- skipped).isEmpty)
  }

  test("q205 forward as-of: every matched purchase is the user's " +
      "earliest at-or-after the click (brute-force recheck)") {
    val out = graft.queries.AnalyticsQueries
      .q205AsofForward(spark, dir).collect()
    assert(out.nonEmpty && out.exists(!_.isNullAt(3)))
    val ev = graft.io.Sources.table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    out.take(200).foreach { r =>
      val cand = ev.getOrElse(r.getLong(1), Array.empty)
        .filter(p => !p._2.before(r.getTimestamp(2)))
      if (r.isNullAt(3)) assert(cand.isEmpty)
      else {
        val minTs = cand.map(_._2.getTime).min
        assert(r.getTimestamp(4).getTime == minTs,
          s"click ${r.getLong(0)}: next purchase must be time-minimal")
      }
    }
  }

  test("q206 top journeys: journey strings are rebuilt correctly for a " +
      "sample of users and populations sum within the user count") {
    val out = graft.queries.AnalyticsQueries
      .q206TopJourneys(spark, dir).collect()
    assert(out.nonEmpty)
    val nUsers = graft.io.Sources.table(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum <= nUsers)
    // rebuild one user's journey directly
    val ev = graft.io.Sources.table(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2, e._3)).take(3).map(_._4).mkString(">"))
    val journeys = byUser.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(journeys(r.getString(0)) == r.getLong(1),
        s"journey ${r.getString(0)} population mismatch")
    }
  }

  test("q207 quarantine split: sinks partition the input, first rule " +
      "wins, and nothing invalid reaches the main sink") {
    val out = graft.queries.AnalyticsQueries
      .q207QuarantineSplit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val orders = graft.io.Sources.table(spark, dir, "orders")
    val total = orders.count()
    assert(out.map(_._3).sum == total, "no row may vanish in the split")
    val priceBad = orders.filter(col("o_totalprice") < 5000.0).count()
    val keyBad = orders.filter(col("o_totalprice") >= 5000.0 &&
      col("o_orderkey") % 50 === 0).count()
    assert(out.contains(("quarantine", "price_below_min", priceBad)))
    // first-rule-wins: blocklisted keys that ALSO fail the price rule
    // count under the price reason
    assert(out.contains(("quarantine", "key_blocklist", keyBad)))
    assert(out.contains(("main", "ok", total - priceBad - keyBad)))
  }

  test("q208 late-arriving dimension: totals conserved, UNKNOWN drains " +
      "to zero after reconciliation") {
    val out = graft.queries.AnalyticsQueries.q208LateDim(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = graft.io.Sources.table(spark, dir, "orders").count()
    assert(out.map(_._2).sum == total && out.map(_._3).sum == total,
      "enrichment must not drop or duplicate facts, before or after")
    val unk = out.find(_._1 == "UNKNOWN")
    assert(unk.exists(u => u._2 > 0 && u._3 == 0),
      "placeholder rows must exist before and fully resolve after")
  }

  test("q209 diagonal Mahalanobis: the reported top score matches a " +
      "BigInt recomputation of that row") {
    val out = graft.queries.AnalyticsQueries
      .q209MahalanobisDiag(spark, dir).collect()
    assert(out.length == 10)
    val top = out.head
    val li = graft.io.Sources.table(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("x1"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("x2"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
    val n = BigInt(li.length)
    val s1 = li.map(r => BigInt(r.getLong(0))).sum
    val q1 = li.map(r => BigInt(r.getLong(0)).pow(2)).sum
    val s2 = li.map(r => BigInt(r.getLong(1))).sum
    val q2 = li.map(r => BigInt(r.getLong(1)).pow(2)).sum
    val row = li.find(r => r.getLong(2) == top.getLong(0) &&
      r.getInt(3) == top.getInt(1)).get
    // mirror the query's expression exactly: exact decimal moments cast
    // once, then the per-row double standardization in written order
    val nD = n.toDouble
    def z2(x: Long, sc: BigInt, q: BigInt): Double = {
      val mu = sc.toDouble / nD
      val v = (n * q - sc * sc).toDouble
      val d = (x.toDouble - mu) * nD
      d * d / v
    }
    val expected = z2(row.getLong(0), s1, q1) + z2(row.getLong(1), s2, q2)
    assert(top.getDouble(2) == expected)
  }

  test("q180 BPE merge rule on a handcrafted corpus: greedy left-to-right " +
      "merge of the argmax pair, merged tokens join round 2 as atoms") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "graft_bpe_spec_").toString
    try {
      // top pair round 1 = (a,b) ×3; round 2 = ('a b', c) vs ('a b', x)
      // tie on count 1 → lexicographic tie-break picks c
      Seq((1L, "a b a b c"), (2L, "a b x"))
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("t").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .write.parquet(s"$root/documents.parquet")
      val out = LearnedQueries.q180BpeMerges(spark, root).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      assert(out.toSeq == Seq(("a b", 2L, 1), ("a b c", 1L, 2),
        ("x", 1L, 3)))
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("q246 kappa re-derives bit-exactly from q190's per-class " +
      "marginals, and sits strictly below raw accuracy when the " +
      "annotators agree above chance") {
    val kRow = LearnedQueries.q246CohensKappa(spark, dir).collect()(0)
    val (n, agree, peNum) =
      (kRow.getLong(0), kRow.getLong(1), kRow.getLong(2))
    // q190 emits (lang, n_true, n_pred, tp) per TRUE class; classes
    // predicted-but-never-true contribute n_true·n_pred = 0, so the
    // marginal sums below are exactly q246's integers
    val m = LearnedQueries.q190LangidEval(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(n == m.map(_._1).sum && agree == m.map(_._3).sum &&
      peNum == m.map(t => t._1 * t._2).sum,
      "kappa's integer inputs must equal the q190 marginals")
    val expected = (n * agree - peNum).toDouble / (n * n - peNum).toDouble
    assert(kRow.getDouble(3) == expected) // same two longs, same division
    // chance correction only ever lowers the score (p_e > 0)
    assert(kRow.getDouble(3) < agree.toDouble / n.toDouble)
  }
}
