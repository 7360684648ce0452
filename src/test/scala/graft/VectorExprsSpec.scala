package graft

import graft.plans.VectorExprs
import org.apache.spark.sql.functions._

/** The native vector kernels must agree exactly with the higher-order-
  * function formulation they replaced, on both the interpreted and the
  * codegen path. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofQuantize(c: org.apache.spark.sql.Column) =
    transform(c, x => round(x * lit(1000000.0)).cast("long"))
  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("quantize matches round(x*1e6)::long for floats incl. halves " +
      "and negatives") {
    val df = Seq(
      (Array(0.5f, -0.5f, 1.5f, -1.5f, 0.1234567f, -3.3333333f, 0f)),
      (Array(1e-7f, -1e-7f, 0.9999995f, -0.9999995f, 123.456f, -99.99f, 1f)))
      .toDF("v")
    val got = df.select(
      VectorExprs.quantize(col("v")).as("nat"),
      hofQuantize(col("v")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
    }
  }

  test("dotQ matches aggregate(zip_with(...)) incl. negatives") {
    val df = Seq(
      (Array(1L, -2L, 3L), Array(4L, 5L, -6L)),
      (Array(0L, 0L, 0L), Array(1L, 1L, 1L)),
      (Array(1000000L, -1000000L, 999999L),
       Array(-999999L, 123456L, 654321L))).toDF("a", "b")
    val got = df.select(VectorExprs.dotQ(col("a"), col("b")).as("nat"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(got(0).getLong(0) == 4L * 1 - 2 * 5 - 3 * 6)
  }

  test("dotQ: mismatched lengths and null elements → null (HOF parity)") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
    val got = df.select(VectorExprs.dotQ(col("a"), col("b")).as("d"))
      .collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("SQL surface: quantize_vec/dot_q resolve after register and run " +
      "inside whole-stage codegen") {
    VectorExprs.register(spark)
    // range-derived input so ConvertToLocalRelation can't constant-fold
    // the whole pipeline away before it reaches codegen
    val df = spark.range(4)
      .selectExpr("array(cast(id AS FLOAT), 2.0f) AS x")
      .selectExpr("dot_q(quantize_vec(x), quantize_vec(x)) AS d")
    // Σ id²·1e12 + 4·1e12 per row; check the total
    val got = df.agg(sum("d")).collect().head.getLong(0)
    val want = (0 until 4).map(i => i.toLong * i * 1000000000000L +
      4000000000000L).sum
    assert(got == want)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dot_q") && plan.contains("*(1)"), plan)
  }

  test("kernels agree between codegen and interpreted execution") {
    val df = Seq((Array(0.25f, -0.75f, 2f), Array(1.5f, 0.5f, -1f)))
      .toDF("x", "y")
      .select(VectorExprs.quantize(col("x")).as("a"),
        VectorExprs.quantize(col("y")).as("b"))
    def run(): (Seq[Long], Long) = {
      val r = df.select(col("a"), VectorExprs.dotQ(col("a"), col("b")))
        .collect().head
      (r.getSeq[Long](0), r.getLong(1))
    }
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", false)
    try {
      val interpreted = run()
      assert(withCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", true)
  }
}
