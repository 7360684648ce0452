package graft

import graft.functions.ScalarFunctions._
import org.apache.spark.sql.functions._

/** Property-style tests (SURVEY §5.3): each property is evaluated over a
  * single batch DataFrame covering the whole input domain, which keeps
  * Spark job counts sane while testing totality/round-trip/idempotence. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("delay parse round-trip: ∀ n ∈ [0, 10000], parse(render(n)) == ±n") {
    val ns = (0 to 100).map(_ * 97 % 10007) // deterministic spread
    val df = ns.toDF("n").select(
      col("n"),
      parseDelayMinutes(concat(col("n").cast("string"), lit(" min")))
        .as("pos"),
      parseDelayMinutes(concat(col("n").cast("string"),
        lit(" min przed czasem"))).as("neg"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(0))
      assert(r.getInt(2) == -r.getInt(0))
    }
  }

  test("season and timeOfDay are total: no nulls over every month × hour") {
    val df = spark.range(0, 365 * 24).toDF("h")
      .select(to_timestamp(lit("2024-01-01 00:00:00")).as("base"), col("h"))
      .select((col("base") + expr("make_interval(0,0,0,0,h,0,0)")).as("ts"))
      .select(season(col("ts")).as("s"),
        timeOfDay(hour(col("ts"))).as("t"))
    assert(df.filter(col("s").isNull || col("t").isNull).count() == 0)
    val seasons = df.select("s").distinct().collect().map(_.getString(0)).toSet
    assert(seasons == Set("winter", "spring", "summer", "autumn"))
    val tods = df.select("t").distinct().collect().map(_.getString(0)).toSet
    assert(tods == Set("morning", "midday", "afternoon", "evening", "night"))
  }

  test("normalizeText is a canonicalization: idempotent over a messy " +
      "unicode domain, and the output never carries a whitespace run, " +
      "edge whitespace, or a decomposable sequence") {
    import graft.plans.TextNormalize.normalizeText
    // deterministic messy domain: combining marks, case, every ASCII
    // whitespace, padding — crossed combinatorially
    val parts = Seq("Café", "CAFÉ", "naïve", "x", "",
      " ", "\t", "\r\n", "  ", "Ångström")
    val texts = for (a <- parts; b <- parts; c <- parts)
      yield s"$a$b$c"
    val df = texts.toDF("t")
      .select(col("t"), normalizeText(col("t")).as("n1"))
      .select(col("n1"), normalizeText(col("n1")).as("n2"))
    df.collect().foreach { r =>
      val n1 = r.getString(0); val n2 = r.getString(1)
      assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
      assert(!n1.contains("  ") && !n1.contains("\t") &&
        !n1.contains("\n") && !n1.contains("\r"),
        s"whitespace run survived: '$n1'")
      assert(n1 == n1.trim, s"edge whitespace survived: '$n1'")
      assert(java.text.Normalizer.isNormalized(n1,
        java.text.Normalizer.Form.NFC), s"not NFC: '$n1'")
    }
  }

  test("upsert idempotence: apply(apply(s, x), x) == apply(s, x)") {
    import graft.operators.Upsert
    val dir = java.nio.file.Files.createTempDirectory("prop").toString
    val x = (1 to 50).map(i => (i % 7, s"v$i")).toDF("k", "v")
    Upsert.upsertParquet(spark, x, Seq("k"), Seq("v"), s"$dir/s")
    val after1 = spark.read.parquet(s"$dir/s").orderBy("k", "v").collect()
    Upsert.upsertParquet(spark, x, Seq("k"), Seq("v"), s"$dir/s")
    val after2 = spark.read.parquet(s"$dir/s").orderBy("k", "v").collect()
    assert(after1.toSeq == after2.toSeq)
  }
}
