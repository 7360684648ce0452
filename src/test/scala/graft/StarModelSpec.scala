package graft

import graft.model.StarModel
import graft.operators.Publish

/** Declared-schema conformance (the reference's `schemas.py` REQUIRED/
  * NULLABLE contract) and the keyed six-table publish. */
class StarModelSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("all six builders conform to their declared StructType") {
    Publish.builders(spark, dir).foreach { case (m, df) =>
      val conformed = StarModel.conform(df, m.schema)
      assert(StarModel.structurallyEqual(conformed.schema, m.schema),
        s"${m.name}: ${conformed.schema.treeString} != ${m.schema.treeString}")
    }
  }

  test("REQUIRED columns carry no nulls in any builder output") {
    Publish.builders(spark, dir).foreach { case (m, df) =>
      val nulls = StarModel
        .requiredNullCounts(StarModel.conform(df, m.schema), m.schema)
        .filter(_._2 > 0)
      assert(nulls.isEmpty, s"${m.name}: nulls in REQUIRED columns $nulls")
    }
  }

  test("conform fails fast on a frame missing a declared column") {
    import spark.implicits._
    val bad = Seq(("x", 1.0)).toDF("id", "lat") // StopDim needs name/lon too
    intercept[org.apache.spark.sql.AnalysisException] {
      StarModel.conform(bad, StarModel.stopDim.schema)
    }
  }

  test("six-table publish is idempotent: second run appends 0 rows " +
      "to every sink") {
    val summary = Publish.publishTwiceSummary(spark, dir).collect()
    assert(summary.length == 6)
    summary.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: first run wrote 0 rows")
      assert(r.getLong(2) == 0,
        s"${r.getString(0)}: second run appended ${r.getLong(2)} rows")
    }
  }

  test("staged promotion: first publish into a nonexistent sink " +
      "promotes the staged files verbatim — sink content equals the " +
      "staged batch, partitioned sinks keep the hive layout, and a " +
      "re-publish appends 0") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_promo_").toString
    try {
      val models = Publish.stageAll(spark, dir, s"$root/_staging")
      val first = Publish.publishStaged(
        spark, models, s"$root/_staging", s"$root/sink")
      first.foreach { case (name, n) => assert(n > 0, s"$name promoted 0") }
      models.map(_.model).foreach { m =>
        // promoted sink must read back identical to the staged batch
        // under the declared schema (promotion is a copy, not a rewrite)
        val staged = StarModel.conform(
          spark.read.parquet(s"$root/_staging/${m.name}"), m.schema)
        val sink = Publish.readSink(spark, s"$root/sink", m)
        assert(sink.exceptAll(staged).isEmpty && staged.exceptAll(sink).isEmpty,
          s"${m.name}: promoted sink differs from staged batch")
        // the partitioned tables must land hive-partitioned (the layout
        // the incremental re-run's partition pruning depends on)
        Publish.partitionColOf(m).foreach { p =>
          val dirs = new java.io.File(s"$root/sink/${m.name}")
            .listFiles().filter(_.isDirectory).map(_.getName)
          assert(dirs.nonEmpty && dirs.forall(_.startsWith(s"$p=")),
            s"${m.name}: expected $p= partition dirs, got " +
              dirs.take(3).mkString(","))
        }
      }
      val second = Publish.publishStaged(
        spark, models, s"$root/_staging", s"$root/sink")
      second.foreach { case (name, n) =>
        assert(n == 0, s"$name re-publish appended $n")
      }
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("staged promotion recovers from a torn earlier copy: a stale " +
      "temp dir with garbage content is discarded, the sink publishes " +
      "clean (the crash-mid-copy retry path)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_promo_crash_").toString
    try {
      val models = Publish.stageAll(spark, dir, s"$root/_staging")
      // simulate a promotion killed mid-copy: the hidden temp sibling
      // exists with a torn (garbage) file, the sink does not
      val m = models.head.model
      val tornDir = new java.io.File(s"$root/sink/.${m.name}__promote_tmp")
      assert(tornDir.mkdirs())
      java.nio.file.Files.write(
        tornDir.toPath.resolve("part-00000.snappy.parquet"),
        Array[Byte](1, 2, 3))
      val first = Publish.publishStaged(
        spark, models, s"$root/_staging", s"$root/sink")
      first.foreach { case (name, n) => assert(n > 0, s"$name promoted 0") }
      // the retry replaced the torn temp and committed a readable sink
      assert(!tornDir.exists(), "stale promote tmp survived the retry")
      val staged = StarModel.conform(
        spark.read.parquet(s"$root/_staging/${m.name}"), m.schema)
      val sink = Publish.readSink(spark, s"$root/sink", m)
      assert(sink.exceptAll(staged).isEmpty && staged.exceptAll(sink).isEmpty,
        s"${m.name}: recovered sink differs from staged batch")
    } finally graft.io.Sources.deleteRecursively(root)
  }

  test("concurrently starts every task at once (pool sized to the task " +
      "count, not the driver's cores)") {
    // all six parties must be inside f simultaneously for the barrier to
    // release; a pool narrower than the task count deadlocks -> timeout
    val barrier = new java.util.concurrent.CyclicBarrier(6)
    val got = Publish.concurrently(1 to 6) { i =>
      barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
      i * 2
    }
    assert(got == (1 to 6).map(_ * 2))
  }

  test("publishTwiceSummary back-to-back: second invocation within 1.3x " +
      "of the first (no session residue)") {
    // the suite shares one JVM with every other spec: collect the
    // garbage they left before timing anything, or their heap pressure
    // lands in OUR measurement as GC pauses
    def settle(): Unit = { System.gc(); Thread.sleep(200) }
    def once(): Double = {
      val t0 = System.nanoTime()
      Publish.publishTwiceSummary(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // discard the cold run (plan compilation dominates it)
    settle()
    val t1 = once()
    val t2 = once()
    // real session residue degrades EVERY subsequent run; a stray GC
    // pause from the shared JVM does not — on a miss, settle and retry
    // (up to twice), taking the min, so only persistent degradation trips
    var t2f = t2
    var retries = 2
    while (t2f > t1 * 1.3 && retries > 0) {
      settle(); t2f = math.min(t2f, once()); retries -= 1
    }
    assert(t2f <= t1 * 1.3,
      f"publish degraded across invocations: $t1%.2f s -> $t2f%.2f s")
  }

  test("publishAll (unstaged single-run API, pruneRerun=false path) is " +
      "idempotent and its sinks read back under the declared schema") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_puball_").toString
    try {
      val first = Publish.publishAll(spark, dir, root)
      val second = Publish.publishAll(spark, dir, root)
      first.foreach { case (name, n) => assert(n > 0, s"$name wrote 0") }
      second.foreach { case (name, n) =>
        assert(n == 0, s"$name re-run appended $n") }
      // partitioned sinks narrow partition-col types on read; readSink
      // must restore the declared contract
      StarModel.all.foreach { m =>
        val back = Publish.readSink(spark, root, m)
        assert(StarModel.structurallyEqual(back.schema, m.schema),
          s"${m.name}: ${back.schema.treeString}")
        assert(back.count() ==
          first.collectFirst { case (n, c) if n == m.name => c }.get)
      }
    } finally {
      graft.io.Sources.deleteRecursively(root)
    }
  }
}
