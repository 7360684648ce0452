package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Dev-loop profiler: times named SparkEntry queries on a chosen sf dir
  * (default sf0.1, local[32] like the driver bench) and optionally dumps
  * the formatted physical plan. Reports wall-clock, cumulative executor
  * task time, task-side GC time, and task count per run — wall ≫
  * taskTime/32 means the run was waiting, not computing. Usage:
  *   sbt "runMain graft.tools.Profile q40_line_dim q27_dedup_minhash"
  *   sbt "runMain graft.tools.Profile --explain q40_line_dim"
  *   sbt "runMain graft.tools.Profile --bench q25_dedup_exact q26_dedup_jaccard"
  *
  * `--bench` reproduces the Bench session exactly — one timed run per
  * query, then clearCache + System.gc + 200 ms sleep between queries, and
  * the bench's codegen-cache size — so a prefix of bench-ordered names
  * bisects session-contamination effects (a query fast standalone but
  * slow mid-bench).
  *
  * Per run it also prints the driver-side picture the task metrics miss:
  *   jobs  = time covered by at least one running Spark job
  *   gap   = wall time with NO job running (pure driver latency: planning,
  *           file listing on the driver, fs metadata calls, collect glue)
  *   codeheap/meta = JIT + metaspace growth (session JIT-state suspects)
  *   bmUsed = block-manager storage in use (cache/checkpoint residue)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val bench = args.contains("--bench")
    val jobsVerbose = args.contains("--jobs")
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
        if (bench) "5000"
        else sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskTime = new LongAdder; val gcTime = new LongAdder
    val deserTime = new LongAdder
    val nTasks = new AtomicLong
    val stages = args.contains("--stages")
    // job intervals since the last snapshot — merged into "covered" time
    // so concurrent jobs (the publish fan-out) aren't double counted
    val jobIntervals =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskTime.add(m.executorRunTime); gcTime.add(m.jvmGCTime)
          deserTime.add(m.executorDeserializeTime)
        }
        nTasks.incrementAndGet()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStarts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.remove(e.jobId)
        if (t0 != 0L) {
          jobIntervals.add((t0, e.time))
          if (jobsVerbose)
            println(f"[job] id=${e.jobId}%4d dur=${(e.time - t0) / 1e3}%7.2f s")
        }
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
    /** Wall-clock ms covered by >=1 running job within [w0, w1]. */
    def jobCovered(w0: Long, w1: Long): Long = {
      import scala.jdk.CollectionConverters._
      val iv = jobIntervals.asScala.toSeq
        .map { case (a, b) => (math.max(a, w0), math.min(b, w1)) }
        .filter { case (a, b) => b > a }.sortBy(_._1)
      var covered = 0L; var cur = -1L; var end = -1L
      iv.foreach { case (a, b) =>
        if (a > end) { if (end > cur) covered += end - cur; cur = a; end = b }
        else if (b > end) end = b
      }
      if (end > cur) covered += end - cur
      covered
    }
    def poolUsed(prefix: String): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith(prefix)).map(_.getUsage.getUsed).sum
    }
    def bmUsed(): Long = {
      val st = org.apache.spark.SparkEnv.get.blockManager.master
        .getMemoryStatus
      st.values.map { case (max, remaining) => max - remaining }.sum
    }

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    if (bench) graft.Bench.warmupWrites(spark) // match the bench env
    val run = if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
              else names
    run.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val iters = if (bench) 1 else 2
      (1 to iters).foreach { i =>
        val (t0t, g0, d0, k0) = snap()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        // build INSIDE the timer: some queries (publish) act eagerly
        val df = fn(spark, sfDir)
        if (explain && i == 1) df.explain("formatted")
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val w1 = System.currentTimeMillis()
        Thread.sleep(300) // let task-end events drain
        val (t1t, g1, d1, k1) = snap()
        val jc = jobCovered(w0, w1) / 1e3
        println(f"[profile] $name%-24s #$i wall=$dt%7.2f s  task=${(t1t - t0t) / 1e3}%8.1f s  gc=${(g1 - g0) / 1e3}%6.1f s  deser=${(d1 - d0) / 1e3}%6.1f s  tasks=${k1 - k0}  rows=$n")
        println(f"[driver]  $name%-24s #$i jobs=$jc%7.2f s  gap=${dt - jc}%7.2f s  codeheap=${poolUsed("CodeHeap") / 1e6}%6.0f MB  meta=${poolUsed("Metaspace") / 1e6}%6.0f MB  bmUsed=${bmUsed() / 1e6}%6.0f MB")
        jobIntervals.clear()
        if (bench) {
          spark.catalog.clearCache()
          System.gc()
          Thread.sleep(200)
        } else spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
