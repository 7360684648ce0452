package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash — the dedup family's per-shingle hot
  * path done as one digest and a few shifts.
  *
  * The composable formulation `conv(substring(md5(s), 1, 15), 16, 10)
  * .cast("long")` is correct but allocates per row: md5 renders the full
  * 32-char hex STRING, substring copies 15 chars of it, and Conv parses
  * them back digit-by-digit through its base converter. At corpus scale
  * the shingle stream is billions of rows and this is the innermost
  * expression. [[Hash60]] produces the IDENTICAL value — the first 60
  * bits of the digest, i.e. bytes 0..6 and the high nibble of byte 7,
  * exactly what parsing the first 15 hex characters yields — straight
  * from the 16 digest bytes: no hex rendering, no substring copy, no
  * base conversion, one thread-local MessageDigest reused across rows.
  *
  * Cross-engine contract unchanged: the DuckDB oracles keep computing
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`, and a property spec pins
  * value equality against the composed Spark formulation. */
object Hash60Expr {

  /** Column surface used by [[graft.operators.Dedup.hash60]]. */
  def hash60(c: Column): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(c)))

  private val mdPool =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Register `hash60` in a session's function registry (idempotent) so
    * `expr("hash60(c)")` resolves — same surface as
    * [[DelayParse.register]]; `GraftExtensions` injects it for
    * extension-configured sessions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("hash60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Hash60].getName, "hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"hash60 expects 1 argument, got ${children.length}")
        Hash60(children.head)
      })

  /** First 60 bits of md5(s) as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val d = mdPool.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }
}

/** string → long: first 60 bits of the md5 digest (≡ parsing the first
  * 15 hex chars of the md5 hex rendering). Codegen'd; null in → null. */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash60 needs string, got ${t.sql}")
  }
  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Hash60Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60Expr.hash($c)")
}
