package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measures whether a selective pushed predicate's wall
  * time tracks SELECTIVITY (row groups actually read) rather than
  * kept-file bytes — the property the round-11 inner-scan pushdown
  * added to the format read. Builds one logged sink from a large
  * orders table, k-sorted so parquet row groups carry tight
  * `o_orderkey` bounds, in FEW large files (so manifest file-pruning
  * alone cannot help and any win must come from row-group/page
  * skipping inside kept files), then times format reads at three
  * selectivities against a full scan of the same kept bytes.
  *
  * Usage: runMain graft.tools.PushdownProbe <ordersDir> [files]
  */
object PushdownProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1o")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = java.nio.file.Files
      .createTempDirectory("pushdown_probe").toString + "/t"
    val base = graft.io.Sources.table(spark, dir, "orders")
    // replicate with dense key shifts so band selectivity is real
    val maxK0 = base.agg(max("o_orderkey")).head.getLong(0)
    val orders = spark.range(10).crossJoin(base)
      .withColumn("o_orderkey",
        col("o_orderkey") + col("id") * (maxK0 + 1)).drop("id")
    // k-sorted, few large files, small row groups → many skippable
    // row groups per kept file
    orders.repartitionByRange(nFiles, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.option("parquet.block.size", (4L << 20).toString)
      .parquet(sink)
    val hp = new org.apache.hadoop.fs.Path(sink)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.CommitLog.ensureLoggedAt(fs, hp)
    graft.operators.TableStats.analyze(spark, sink, Seq("o_orderkey"))
    val maxK = orders.agg(max("o_orderkey")).head.getLong(0)
    def timed(tag: String)(f: => Long): Double = {
      // warm once, time rep2
      f; spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pushdown] $tag%-28s $dt%6.2f s  rows=$n")
      spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
      dt
    }
    def read = spark.read.format("graft").load(sink)
    /** Rows the INNER parquet scan outputs = rows in row groups that
      * survive the pushed predicate (the I/O-elision metric; the
      * pre-round-11 relation output ALL kept-file rows here by
      * construction — no filter existed below the RDD boundary). */
    def innerScanRows(df: org.apache.spark.sql.DataFrame): Long = {
      val info = df.queryExecution.sparkPlan.collect {
        case r: org.apache.spark.sql.execution.RowDataSourceScanExec =>
          r.relation
      }.collectFirst { case g: graft.sources.GraftScanInfo => g }.get
      val inner = info.innerFrame()
      // drive the SAME query execution the metrics hang off
      inner.queryExecution.toRdd.count()
      inner.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val total = read.count()
    val full = timed("full-scan (kept bytes)") {
      read.filter(col("o_orderkey") >= 0).agg(sum("o_totalprice"))
        .head; read.filter(col("o_orderkey") >= 0).count()
    }
    val sels = Seq(0.10, 0.01, 0.001)
    sels.foreach { s =>
      val hi = (maxK * s).toLong
      val t = timed(f"band sel=$s%.3f") {
        read.filter(col("o_orderkey") <= hi).agg(sum("o_totalprice"))
          .head
        read.filter(col("o_orderkey") <= hi).count()
      }
      val scanned = innerScanRows(
        read.filter(col("o_orderkey") <= hi))
      println(f"[pushdown] sel=$s%.3f  wall/full=${t / full}%.3f  " +
        f"inner-scan rows=$scanned (${100.0 * scanned / total}%.2f%% " +
        f"of $total; pre-r11 inner scan = 100%% by construction)")
    }
    spark.stop()
  }
}
