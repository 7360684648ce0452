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
    def once(): Double = {
      val t0 = System.nanoTime()
      Publish.publishTwiceSummary(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // discard the cold run (plan compilation dominates it)
    val t1 = once()
    val t2 = once()
    assert(t2 <= t1 * 1.3,
      f"publish degraded across invocations: $t1%.2f s -> $t2%.2f s")
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
