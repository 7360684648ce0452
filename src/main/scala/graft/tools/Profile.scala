package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Dev-loop profiler: times named SparkEntry queries on a chosen sf dir
  * (default sf0.1, local[32] like the driver bench) and optionally dumps
  * the formatted physical plan. Reports wall-clock, cumulative executor
  * task time, task-side GC time, and task count per run — wall ≫
  * taskTime/32 means the run was waiting, not computing. Usage:
  *   sbt "runMain graft.tools.Profile q40_line_dim q27_dedup_minhash"
  *   sbt "runMain graft.tools.Profile --explain q40_line_dim"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val names = args.filterNot(_.startsWith("--")).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking",
        sys.env.getOrElse("SPARK_GRAFT_REFTRACK", "true"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskTime = new LongAdder; val gcTime = new LongAdder
    val deserTime = new LongAdder
    val nTasks = new AtomicLong
    val stages = args.contains("--stages")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskTime.add(m.executorRunTime); gcTime.add(m.jvmGCTime)
          deserTime.add(m.executorDeserializeTime)
        }
        nTasks.incrementAndGet()
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (stages) {
          val si = e.stageInfo
          val tm = si.taskMetrics
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"run=${tm.executorRunTime / 1e3}%7.1f s " +
            f"deser=${tm.executorDeserializeTime / 1e3}%6.1f s " +
            f"${si.name.takeWhile(_ != '(').take(40)}%-40s " +
            si.details.linesIterator.filter(_.contains("graft"))
              .take(1).mkString.trim.take(60))
        }
    })
    def snap(): (Long, Long, Long, Long) =
      (taskTime.sum, gcTime.sum, deserTime.sum, nTasks.get)

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val run = if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
              else names
    run.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val (t0t, g0, d0, k0) = snap()
        val t0 = System.nanoTime()
        // build INSIDE the timer: some queries (publish) act eagerly
        val df = fn(spark, sfDir)
        if (explain && i == 1) df.explain("formatted")
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let task-end events drain
        val (t1t, g1, d1, k1) = snap()
        spark.catalog.clearCache()
        println(f"[profile] $name%-24s #$i wall=$dt%7.2f s  task=${(t1t - t0t) / 1e3}%8.1f s  gc=${(g1 - g0) / 1e3}%6.1f s  deser=${(d1 - d0) / 1e3}%6.1f s  tasks=${k1 - k0}  rows=$n")
      }
    }
    spark.stop()
  }
}
