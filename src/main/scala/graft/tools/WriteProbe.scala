package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the write-path file-count evidence for the r16
  * size-derived output sizing. Performs one representative write per
  * family against a scratch sink and prints the LIVE file count the
  * manifest records afterwards — run once with
  * `SPARK_GRAFT_WRITE_ADAPTIVE=off` (the pre-r16 behavior) and once
  * with it unset, same data, to see file counts follow task count vs
  * bytes. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.WriteProbe"
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = sys.env.getOrElse("SPARK_GRAFT_WRITE_ADAPTIVE", "on")
    println(s"=== WriteProbe (adaptive=$mode, cpus=$cpus, sf=$sfDir)")
    val root = java.nio.file.Files.createTempDirectory("wprobe_")
      .toString

    def liveCount(path: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.operators.CommitLog.ensureLoggedAt(fs, hp)._2.size.toLong
    }

    try {
      val orders = graft.io.Sources.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))

      // 1. format append (GraftWriter staging)
      val s1 = s"$root/fmt"
      orders.filter(col("o_orderkey") % 10 === 0)
        .write.format("graft").mode("append").save(s1)
      println(s"[probe] format append       -> live files = ${
        liveCount(s1)}")

      // 2. CoW merge rewrite (Merge.writeRewrite, flat sink)
      val s2 = s"$root/merge"
      orders.filter(col("o_orderkey") % 10 === 0).coalesce(1)
        .write.parquet(s2)
      graft.operators.Merge.mergeParquet(spark,
        orders.filter(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 1).as("o_totalprice")),
        Seq("o_orderkey"), s2)
      println(s"[probe] CoW merge rewrite   -> live files = ${
        liveCount(s2)}")

      // 3. merge-on-read append (DeleteVectors.mergeOnRead, flat)
      val s3 = s"$root/mor"
      orders.filter(col("o_orderkey") % 10 === 0).coalesce(1)
        .write.parquet(s3)
      graft.operators.DeleteVectors.mergeOnRead(spark, s3,
        orders.filter(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 1).as("o_totalprice")),
        Seq("o_orderkey"))
      println(s"[probe] MoR update append   -> live files = ${
        liveCount(s3)}")

      // 4. SQL row-level UPDATE (GraftDeltaWrite insert files)
      val cat = "wprobec"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$root/wh")
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.d (okey BIGINT, qty BIGINT) " +
        "USING graft")
      orders.select(col("o_orderkey").as("okey"),
          (col("o_orderkey") % 97).as("qty"))
        .createOrReplaceTempView("wprobe_src")
      spark.sql(s"INSERT INTO $cat.db.d SELECT * FROM wprobe_src")
      val nAfterInsert = liveCount(s"$root/wh/db/d")
      println(s"[probe] SQL INSERT INTO     -> live files = " +
        s"$nAfterInsert")
      spark.sql(s"UPDATE $cat.db.d SET qty = qty + 1 " +
        "WHERE okey % 10 = 3")
      println(s"[probe] SQL UPDATE (MoR)    -> live files = ${
        liveCount(s"$root/wh/db/d")} (delta = ${
        liveCount(s"$root/wh/db/d") - nAfterInsert} insert file(s))")

      // read-plan pin: the round touched only write/metadata op
      // counts — the format READ's plan shape (manifest pruning,
      // pushed filters, V1 relation) must be unchanged; dump it so
      // the claim is checkable
      println("=== format read plan (filter pushes to the scan) ===")
      spark.read.format("graft").load(s1)
        .filter(col("o_orderkey") > 1000)
        .groupBy((col("o_orderkey") % 10).as("grp"))
        .agg(count(lit(1)).as("n"))
        .explain("formatted")
    } finally {
      graft.io.Sources.deleteRecursively(root)
      spark.stop()
    }
  }
}
