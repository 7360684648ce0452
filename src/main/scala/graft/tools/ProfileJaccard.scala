package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the q26 jaccardPairs formulations (dev tool,
  * not part of the library surface). Each run is one JVM = one cold
  * number, mirroring the driver bench. Usage:
  *   sbt "runMain graft.tools.ProfileJaccard r3|r2|grouped [--check]"
  */
object ProfileJaccard {
  /** r2 formulation: keys-only freq join, cache after the cap join,
    * self-join over the full <=cap universe (no df>=2 filter). */
  def jaccardR2(df: DataFrame, idCol: String, textCol: String,
                n: Int, threshold: Double, maxDocFreq: Long): DataFrame = {
    val all = Dedup.docShingles(df, idCol, textCol, n).distinct().cache()
    val freq = all.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq).select("h")
    val ds = all.join(freq, "h").cache()
    val sizes = ds.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val inter = ds.as("x").join(ds.as("y"), col("x.h") === col("y.h"))
      .filter(col("x.sid") < col("y.sid"))
      .groupBy(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Candidate r4 formulation: one shuffle groups postings per shingle,
    * pairs are generated map-side from the sorted id array; the df cap
    * and the df>=2 pair filter are free size(ids) predicates. No
    * inverted-index join, no self-join. */
  def jaccardGrouped(df: DataFrame, idCol: String, textCol: String,
                     n: Int, threshold: Double, maxDocFreq: Long): DataFrame = {
    val grouped = Dedup.docShingles(df, idCol, textCol, n).distinct()
      .groupBy("h").agg(sort_array(collect_list("sid")).as("ids"))
      .filter(size(col("ids")) <= maxDocFreq)
      .select("ids")
      .cache()
    val sizes = grouped.select(explode(col("ids")).as("sid"))
      .groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val inter = grouped.filter(size(col("ids")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ids")) - 2),
        i => transform(
          slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          b => struct(element_at(col("ids"), i + 1).as("id_a"),
            b.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** grouped + fused distinct: collect_set absorbs the per-(sid,h)
    * distinct, so the shingle universe is built in ONE wide shuffle
    * (partial sets map-side) instead of distinct + regroup. */
  def jaccardFused(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double, maxDocFreq: Long,
                   doCache: Boolean = true): DataFrame = {
    val grouped0 = df
      .select(col(idCol).as("sid"), split(col(textCol), " ").as("__tk"))
      .select(col("sid"),
        explode(transform(Dedup.shinglesOfTokens(col("__tk"), n),
          s => Dedup.hash60(s))).as("h"))
      .groupBy("h").agg(sort_array(collect_set("sid")).as("ids"))
      .filter(size(col("ids")) <= maxDocFreq)
      .select("ids")
    val grouped = if (doCache) grouped0.cache() else grouped0
    val sizes = grouped.select(explode(col("ids")).as("sid"))
      .groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val inter = grouped.filter(size(col("ids")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ids")) - 2),
        i => transform(
          slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          b => struct(element_at(col("ids"), i + 1).as("id_a"),
            b.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** fused but with pair generation as two streaming Generates instead
    * of one nested flatten(transform(transform(struct))) — no per-shingle
    * materialization of the full d²/2 struct array. */
  def jaccardExplode2(df: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double, maxDocFreq: Long): DataFrame = {
    val grouped = df
      .select(col(idCol).as("sid"), split(col(textCol), " ").as("__tk"))
      .select(col("sid"),
        explode(transform(Dedup.shinglesOfTokens(col("__tk"), n),
          s => Dedup.hash60(s))).as("h"))
      .groupBy("h").agg(sort_array(collect_set("sid")).as("ids"))
      .filter(size(col("ids")) <= maxDocFreq)
      .select("ids")
      .cache()
    val sizes = grouped.select(explode(col("ids")).as("sid"))
      .groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val inter = grouped.filter(size(col("ids")) >= 2)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + 2,
          size(col("ids")) - col("i") - 1)).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("r3")
    val check = args.contains("--check")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.select((col("doc_id") + 1000000).as("doc_id"),
        expr("substr(text, instr(text, ' ') + 1)").as("text")))
    def run(v: String): DataFrame = v match {
      case "r3" => Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, 1000L,
        eager = true)
      case "r2" => jaccardR2(corpus, "doc_id", "text", 3, 0.5, 1000L)
      case "grouped" => jaccardGrouped(corpus, "doc_id", "text", 3, 0.5, 1000L)
      case "fused" => jaccardFused(corpus, "doc_id", "text", 3, 0.5, 1000L)
      case "explode2" =>
        jaccardExplode2(corpus, "doc_id", "text", 3, 0.5, 1000L)
      case "fused_nc" =>
        jaccardFused(corpus, "doc_id", "text", 3, 0.5, 1000L, doCache = false)
    }
    if (check) {
      val a = run("r3").withColumn("jaccard", round(col("jaccard"), 9))
      val b = run(variant).withColumn("jaccard", round(col("jaccard"), 9))
      val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
      println(s"[check] $variant vs r3: exceptAll ${d1}/${d2} (want 0/0), " +
        s"rows=${b.count()}")
    } else {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val nRows = run(variant).orderBy("id_a", "id_b").count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(200)
        println(f"[jaccard] $variant%-8s #$i wall=$dt%7.2f s rows=$nRows")
      }
    }
    spark.stop()
  }
}
