package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: timed scaling probe — runs the named queries at each of
  * the given data dirs (comma-separated, e.g. sf0.1 and a
  * [[ScaleUp]]-synthesized sf1) and prints per-dir wall times, so
  * SCALING.md's sf0.1→sf1 ratios are measured, not inferred from plan
  * shape. Borrows Bench's measurement discipline: JIT-shape warmup per
  * query at the smallest SF, clearCache + GC between timed runs, two
  * reps per (dir, query) with both reported (rep2 is the warm number —
  * rep1 of the first dir still pays residual JIT).
  *
  * Usage: runMain graft.tools.ScaleProbe <dir1,dir2,...> <name>...
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').toSeq
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "give at least one query name")
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    for (dir <- dirs; name <- names) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(500)
        (dt, rows)
      }
      println(f"[probe] $dir $name rep1=${times(0)._1}%.2f s " +
        f"rep2=${times(1)._1}%.2f s rows=${times(1)._2}")
    }
    spark.stop()
  }
}
