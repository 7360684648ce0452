package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","errors","sf"}.
  *
  * Runs at local[32] (the driver's documented bench configuration) with
  * spark.sql.shuffle.partitions matched to the core count; override via
  * SPARK_GRAFT_CPUS. Queries run in name order; the cache is cleared
  * between queries so one query's persisted intermediates can't skew
  * another's time through heap pressure. A small warmup action absorbs
  * JVM/codegen startup so per-query numbers are comparable.
  *
  * A query that throws is recorded with err != null and value -1 — a
  * failing query can never silently *shrink* the total (it previously
  * recorded its elapsed-to-failure time, masking regressions as
  * speedups).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // ~50 queries × ~10 codegen units cycle through the default
      // 100-entry generated-code cache; evictions force Janino
      // recompiles mid-bench and show up as erratic multi-second stalls
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").take(120))
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // force the ContextCleaner's GC-driven broadcast/shuffle cleanup
        // into the gap BETWEEN queries: with a 48g heap GC fires rarely,
        // dead blocks from a heavy query pile up in the block manager and
        // their eventual mid-query eviction/cleanup burst was measured to
        // inflate whichever query it lands on by 3-10× (q56 back-to-back
        // without this hygiene: 14 -> 17-28 s; with it: stable ~12 s).
        // The sleep gives the cleaner thread room to DRAIN the reference
        // queue the gc just filled — its removeBroadcast/removeShuffle
        // RPCs otherwise land inside the next query's window
        System.gc()
        Thread.sleep(500)
        (name, if (err.isEmpty) dt else -1.0, err)
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":" + jstr(e)
    }.mkString("{", ",", "}")
    val total = results.map { case (_, v, _) => math.max(v, 0.0) }.sum
    val nErr = results.count(_._3.nonEmpty)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":$nErr,"sf":"$sfDir"}"""
    println(line)
    // also persist to a file: the driver records the bench from stdout,
    // and a truncated tail once cost a round its total (BENCH_r02)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line)
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
