package graft

import graft.operators.CommitLog
import org.apache.hadoop.fs.Path

/** SQL maintenance procedures ([[graft.sources.GraftProcedures]] —
  * `CALL <cat>.system.<proc>(...)`, Iceberg's stored-procedure
  * pattern): a SQL-only consumer can compact, Z-order, analyze,
  * Bloom-index, pay down DV debt, expire and vacuum the tables it
  * created in SQL — each CALL delegating to the operator that owns
  * the semantics and returning its summary counts. */
class GraftProceduresSpec extends SparkSpec {

  private def fsOf(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def initCatalog(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", root)
  }

  test("SQL-only lifecycle: DELETE → apply_deletes → optimize → " +
    "expire → vacuum, every step a CALL with pinned counts") {
    val root = java.nio.file.Files.createTempDirectory("gproc1").toString
    initCatalog("gp1", root)
    spark.sql("CREATE NAMESPACE gp1.db")
    spark.sql("CREATE TABLE gp1.db.t (k BIGINT, v STRING) USING graft")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO gp1.db.t SELECT id, concat('v', id) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})"))
    val path = s"$root/db/t"
    val hp = new Path(path); val fs = fsOf(path)
    assert(CommitLog.ensureLoggedAt(fs, hp)._2.size >= 3)

    spark.sql("DELETE FROM gp1.db.t WHERE k >= 250")
    assert(CommitLog.dvRecords(fs, hp).nonEmpty)

    // pay down the DV debt purely from SQL
    val applied = spark.sql(
      "CALL gp1.system.apply_deletes('db.t')").head
    assert(applied.getLong(0) >= 1,
      s"apply_deletes must rewrite the DV'd file: $applied")
    assert(CommitLog.dvRecords(fs, hp).isEmpty)
    assert(spark.table("gp1.db.t").count() == 250)

    // bin-pack the small files into one
    val opt = spark.sql("CALL gp1.system.optimize('db.t')").head
    assert(opt.getLong(1) == 1L,
      s"optimize should bin-pack 3 small files into 1: $opt")
    assert(spark.table("gp1.db.t").count() == 250)

    // history is a CALL too (before expire drops the generations)
    val hist = spark.sql("CALL gp1.system.history('db.t')").collect()
    assert(hist.length >= 6 &&
      hist.map(_.getString(1)).contains("rewrite"),
      hist.mkString(","))

    // drop history, then reclaim unreferenced bytes (optimize and
    // apply_deletes GC their replaced files themselves, so plant a
    // genuine orphan — a crash-debris file no manifest references)
    val exp = spark.sql("CALL gp1.system.expire('db.t', 1)").head
    assert(exp.getLong(0) >= 1, s"expire must drop generations: $exp")
    val orphan = fs.create(new Path(hp, "part-orphan-debris.parquet"))
    orphan.write(Array.fill[Byte](16)(1)); orphan.close()
    // the DEFAULT horizon is 7 days (safe under concurrent writers) —
    // the fresh orphan survives it; horizon 0 reclaims immediately
    val vacSafe = spark.sql("CALL gp1.system.vacuum('db.t')").head
    assert(vacSafe.getLong(0) == 0L,
      s"default horizon must spare recent files: $vacSafe")
    val vac = spark.sql("CALL gp1.system.vacuum('db.t', 0)").head
    assert(vac.getLong(0) == 1L,
      s"vacuum must reclaim exactly the orphan: $vac")
    assert(!fs.exists(new Path(hp, "part-orphan-debris.parquet")))
    assert(spark.table("gp1.db.t").count() == 250)
  }

  test("CALL zorder / analyze / build_bloom maintain layout indexes " +
    "from SQL; named arguments work") {
    val root = java.nio.file.Files.createTempDirectory("gproc2").toString
    initCatalog("gp2", root)
    spark.sql("CREATE NAMESPACE gp2.db")
    spark.sql("CREATE TABLE gp2.db.t (a BIGINT, b BIGINT) USING graft")
    spark.sql("INSERT INTO gp2.db.t SELECT id % 100, " +
      "(id * 37) % 100 FROM range(0, 10000)")
    val path = s"$root/db/t"
    val hp = new Path(path); val fs = fsOf(path)

    val z = spark.sql(
      "CALL gp2.system.zorder(table => 'db.t', " +
        "columns => 'a,b', n_files => 4)").head
    assert(z.getLong(1) == 4L, s"zorder must land n_files: $z")
    // zorder re-analyzes its clustering columns — stats present
    assert(CommitLog.statsRecords(fs, hp).nonEmpty)

    val an = spark.sql("CALL gp2.system.analyze('db.t', 'a,b')").head
    assert(an.getLong(0) == 0L,
      s"zorder already analyzed a,b — nothing left: $an")

    val bl = spark.sql(
      "CALL gp2.system.build_bloom('db.t', 'a')").head
    assert(bl.getLong(0) == 4L, s"bloom must index all 4 files: $bl")
  }

  test("SHOW PROCEDURES lists the system namespace; DESCRIBE " +
    "PROCEDURE names the entry") {
    val root = java.nio.file.Files.createTempDirectory("gproc5").toString
    initCatalog("gp5", root)
    val listed = spark.sql("SHOW PROCEDURES IN gp5.system").collect()
      .map(_.toSeq.map(String.valueOf).mkString(" ")).mkString("\n")
    Seq("optimize", "zorder", "analyze", "build_bloom",
      "apply_deletes", "expire", "vacuum", "history").foreach(p =>
      assert(listed.contains(p), s"$p missing from:\n$listed"))
  }

  test("optimize refuses a multi-level hive layout instead of " +
    "silently dropping the deeper partition columns") {
    val root = java.nio.file.Files.createTempDirectory("gproc4").toString
    initCatalog("gp4", root)
    spark.sql("CREATE NAMESPACE gp4.db")
    spark.sql("CREATE TABLE gp4.db.t (k BIGINT, a STRING, b STRING) " +
      "USING graft PARTITIONED BY (a, b)")
    spark.sql("INSERT INTO gp4.db.t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END, " +
      "CASE WHEN id % 3 = 0 THEN 'p' ELSE 'q' END FROM range(0, 40)")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e = intercept[Exception] {
      spark.sql("CALL gp4.system.optimize('db.t')")
    }
    assert(messages(e).contains("multi-level"), messages(e))
    // nothing was touched — column b still reads back
    assert(spark.sql("SELECT CAST(count(DISTINCT b) AS BIGINT) " +
      "FROM gp4.db.t").head.getLong(0) == 2L)
  }

  test("unknown procedure and wrong namespace refuse loudly; " +
    "procedures list under system") {
    val root = java.nio.file.Files.createTempDirectory("gproc3").toString
    initCatalog("gp3", root)
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e1 = intercept[Exception] {
      spark.sql("CALL gp3.system.frobnicate('db.t')")
    }
    assert(messages(e1).contains("unknown procedure") &&
      messages(e1).contains("vacuum"), messages(e1))
    val e2 = intercept[Exception] {
      spark.sql("CALL gp3.other.vacuum('db.t')")
    }
    assert(messages(e2).contains("system"), messages(e2))
  }
}
