package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies real sentences per language") {
    val df = Seq(
      "the cat is on the mat and it is warm",
      "der Hund ist nicht zu Hause und die Katze",
      "le chat est dans la maison et les oiseaux",
      "el perro es grande y los gatos son pequeños",
      "这是一个中文句子",
      "xyzzy plugh qwerty").toDF("text")
      .select(langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("en", "de", "fr", "es", "zh", "unknown"))
  }

  test("token counts: whitespace vs regex tokenization of punctuated text") {
    val r = Seq("hello, world! it's fine").toDF("text")
      .select(wsTokenCount(col("text")).as("ws"),
        regexTokenCount(col("text")).as("re"),
        estBpeTokens(col("text")).as("bpe"))
      .collect()(0)
    assert(r.getInt(0) == 4)
    // hello , world ! it ' s fine → 8
    assert(r.getInt(1) == 8)
    assert(r.getLong(2) == math.ceil(23 / 4.0).toLong)
  }

  test("fingerprint: stable under case/punct; fp_sorted stable under " +
    "reorder; fp not") {
    val df = Seq(
      ("Hello, World!", "hello world", "world hello"))
      .toDF("a", "b", "c")
      .select(fingerprint(col("a")).as("fa"),
        fingerprint(col("b")).as("fb"),
        fingerprint(col("c")).as("fc"),
        sortedFingerprint(col("b")).as("sb"),
        sortedFingerprint(col("c")).as("sc"))
    val r = df.collect()(0)
    assert(r.getString(0) == r.getString(1)) // punctuation-insensitive
    assert(r.getString(1) != r.getString(2)) // order-sensitive
    assert(r.getString(3) == r.getString(4)) // bag-of-words equal
  }

  test("normalizeText: composed and decomposed forms canonicalize " +
      "identically, whitespace runs collapse, nulls propagate, and the " +
      "ASCII fast path is byte-stable") {
    import graft.plans.TextNormalize.normalizeText
    val rows = Seq(
      ("café test", "composed"),          // é as one codepoint
      ("café test", "decomposed"),       // e + combining acute
      ("  CAFÉ\t\r\n test  ", "messy"),
      ("plain ascii  here", "ascii"),
      (null.asInstanceOf[String], "null"))
      .toDF("t", "tag")
      .select(col("tag"), normalizeText(col("t")).as("n"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows("composed") == "café test")
    assert(rows("decomposed") == "café test",
      "NFC must compose the combining mark before hashing-equality holds")
    assert(rows("messy") == "café test")
    assert(rows("ascii") == "plain ascii here")
    assert(rows("null") == null)
    // SQL surface + whole-stage codegen: the expression registers via
    // GraftExtensions/register and stays inside the codegen'd Project
    graft.plans.TextNormalize.register(spark)
    val df = Seq("A\u030A b").toDF("s") // A + combining ring
    val got = df.selectExpr("normalize_text(s) AS n").collect()(0).getString(0)
    assert(got == "å b", got)
  }

  test("qualityScore: long diverse prose scores higher than repeated garbage") {
    val prose = "the quiet morning light spread across the valley and " +
      "the river carried small boats toward the distant harbor where " +
      "merchants gathered to trade stories and goods from many lands"
    val garbage = "spam spam spam spam spam spam spam"
    val df = Seq(prose, garbage).toDF("text")
      .select(qualityScore(col("text")).as("s"),
        qualityLabel(qualityScore(col("text"))).as("l"))
    val rows = df.collect()
    assert(rows(0).getInt(0) > rows(1).getInt(0))
    assert(rows(0).getString(1) == "high")
  }
}
