package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: mass-UPDATE probe for the SQL row-level path — builds an
  * N-row catalog table, updates `pct` percent of it through ONE SQL
  * UPDATE, and prints wall time plus the resulting DV layout, so the
  * sharded deletion-vector write (`writeDvSharded` above 4M marks)
  * and the task-streaming insert side are exercised at volume through
  * the exact code path `UPDATE graft.db.t SET ...` takes.
  *
  * Usage: runMain graft.tools.RowLevelProbe [rows] [pct]
  */
object RowLevelProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val pct = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("rlp_").toString
    spark.conf.set("spark.sql.catalog.rlp",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlp.warehouse", root)
    spark.sql("CREATE NAMESPACE rlp.db")
    spark.sql("CREATE TABLE rlp.db.t (k BIGINT, v BIGINT) USING graft")
    val t0 = System.nanoTime()
    spark.sql(s"INSERT INTO rlp.db.t SELECT id, id * 3 FROM " +
      s"range(0, $rows)")
    println(f"[rlp] insert $rows rows: ${(System.nanoTime() - t0) /
      1e9}%.1f s")
    val t1 = System.nanoTime()
    spark.sql(s"UPDATE rlp.db.t SET v = v + 1 WHERE k % 100 < $pct")
    val dt = (System.nanoTime() - t1) / 1e9
    val hp = new org.apache.hadoop.fs.Path(s"$root/db/t")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    import graft.operators.CommitLog
    val dvs = CommitLog.dvRecords(fs, hp)
    val marks = CommitLog.manifestAt(fs, hp,
      CommitLog.generations(fs, hp).last).dvMarks.values.sum
    val dvParts = dvs.values.toSeq.distinct.map { r =>
      val p = new org.apache.hadoop.fs.Path(hp, r)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
      else 1
    }.sum
    val survivors = spark.table("rlp.db.t")
      .filter("v % 3 = 1").count()
    println(f"[rlp] UPDATE $pct%% of $rows rows: $dt%.1f s; " +
      s"marks=$marks dvRecords=${dvs.size} dvParquetParts=$dvParts " +
      s"updatedRows=$survivors")
    graft.io.Sources.deleteRecursively(root)
    spark.stop()
  }
}
