package graft.tools

import graft.{SparkEntry, Verify}

/** Dev tool: the Verify dump restricted to the named queries — writes
  * `<outDir>/<name>` parquet + a filtered `oracle_sql.json`, so
  * `tools/local_verify.py` checks just those entries. Turns the
  * add-one-query loop from a full all-queries dump into seconds.
  * Unlike Verify it does NOT catch per-query failures — a dev loop
  * wants the stack trace, not a log line.
  *
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <name>...
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    require(names.nonEmpty, "give at least one query name")
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val spark = Verify.session(defaultCpus = "8")
    new java.io.File(outDir).mkdirs()
    names.toSeq.sorted.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[verify-one] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    Verify.writeOracleJson(outDir, names)
    spark.stop()
  }
}
