package graft.tools

import graft.model.StarModel
import graft.operators.{Publish, Upsert}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the q56 publish path: times each component the
  * round-2 verdict asked to measure — (a) concurrent vs sequential
  * publish, (b) agg vs window dedup on DelayFact, (c) build-once reuse.
  * Usage: sbt "runMain graft.tools.ProfilePublish"
  */
object ProfilePublish {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val gcBetween = sys.env.get("PP_GC").contains("1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      if (gcBetween) { System.gc(); Thread.sleep(300) }
      val t0 = System.nanoTime()
      val r = f
      println(f"[pp] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // (0) per-builder build+conform+count cost, sequential
    Publish.builders(spark, sfDir).foreach { case (m, df) =>
      time(s"build+count ${m.name}") {
        StarModel.conform(df, m.schema).count()
      }
    }

    // (b) dedup strategies on DelayFact
    val fact = StarModel.conform(
      graft.queries.StarSchema.q44DelayFact(spark, sfDir),
      StarModel.delayFact.schema)
    val keys = StarModel.delayFact.keys
    val ord = StarModel.delayFact.schema.fieldNames
      .filterNot(keys.contains).toSeq
    time("delayfact dedup AGG")(
      Upsert.dedupKeepFirstAgg(fact, keys, ord).count())
    time("delayfact dedup WINDOW")(
      Upsert.dedupKeepFirst(fact, keys, ord).count())

    // staged flow end-to-end (what publishTwiceSummary now runs)
    (1 to 2).foreach { i =>
      time(s"publishTwiceSummary staged #$i")(
        Publish.publishTwiceSummary(spark, sfDir).collect())
    }

    // staged flow, component times + sequential comparison
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/tmp"), "pp_").toString
    val models = time("stageAll (concurrent)")(
      Publish.stageAll(spark, sfDir, s"$root/_staging"))
    val r1 = time("publishStaged run1 (concurrent)")(
      Publish.publishStaged(spark, models, s"$root/_staging", s"$root/sink"))
    val r2 = time("publishStaged run2 (concurrent)")(
      Publish.publishStaged(spark, models, s"$root/_staging", s"$root/sink"))
    println(s"[pp] rows1=${r1.map(_._2).sum} rows2=${r2.map(_._2).sum}")
    val r3 = time("publishStaged run3 (SEQUENTIAL)") {
      models.map(_.model).map { m =>
        val staged = spark.read.parquet(s"$root/_staging/${m.name}")
        m.name -> Upsert.upsertParquet(spark, staged, m.keys, m.keys,
          s"$root/sink/${m.name}",
          partitionCol = Publish.partitionColOf(m), preDeduped = true)
      }
    }
    println(s"[pp] rows3=${r3.map(_._2).sum}")
    spark.stop()
  }
}
