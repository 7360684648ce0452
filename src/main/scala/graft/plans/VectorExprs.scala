package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the similarity operators.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * — is correct but interpreted: Spark's higher-order functions are
  * CodegenFallback, so every candidate pair allocates a zipped
  * GenericArrayData and walks it with per-element lambda dispatch. These
  * expressions do the same arithmetic as one primitive loop inside
  * whole-stage codegen — no allocation, no virtual calls — which is
  * where brute-force/ANN scoring spends its time at corpus scale
  * (|Q|×|D| pairs, 64+ dims each).
  *
  * Semantics match the HOF formulation for every composed use (same
  * integer math; a null element or mismatched lengths null out the
  * final dot product either way). One visible difference on the
  * standalone `quantize_vec` SQL surface: a vector containing a null
  * element quantizes to NULL as a whole, where
  * `transform(v, x -> round(x*1e6))` would yield an array with a null
  * element. Composed with `dot_q` the results agree (the null element
  * nulls the dot product); only a user projecting `quantize_vec`
  * directly over null-element vectors sees the difference.
  */
object VectorExprs {

  /** round(x·1e6) per element: array<float/double> → array<long>,
    * using [[q6]] (Spark Round's own BigDecimal HALF_UP) per element. */
  def quantize(vec: Column): Column =
    ColumnBridge.column(QuantizeVec(ColumnBridge.expression(vec)))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductQ(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** HALF_UP round of x·1e6 — the EXACT algorithm of Spark's `Round`
    * (BigDecimal.valueOf + setScale(0, HALF_UP)), so results are
    * bit-identical to `round(x * 1e6).cast("long")` on every input.
    * Quantization runs once per vector (not per candidate pair), so the
    * BigDecimal cost is irrelevant; the pair-side kernel is [[dotLoop]]. */
  def q6(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def dotLoop(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Register `quantize_vec` / `dot_q` in a session's function registry
    * (idempotent), so `expr("dot_q(a, b)")` resolves — same surface as
    * [[DelayParse.register]]; `GraftExtensions` injects them for
    * extension-configured sessions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("quantize_vec"),
      new ExpressionInfo(classOf[QuantizeVec].getName, "quantize_vec"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"quantize_vec expects 1 argument, got ${children.length}")
        QuantizeVec(children.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_q"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_q expects 2 arguments, got ${children.length}")
        DotProductQ(children.head, children(1))
      })
  }

  def quantizeLoop(v: ArrayData, isFloat: Boolean): Any = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      out(i) = q6(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** array<float|double> → array<long> of round(x·1e6), as one primitive
  * loop with codegen. Null element → null result (the HOF formulation
  * would propagate the null through the dot product to the same end). */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_vec"
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_vec needs array<float|double>, got ${t.sql}")
    }
  override protected def withNewChildInternal(newChild: Expression)
  : QuantizeVec = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    VectorExprs.quantizeLoop(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
           graft.plans.VectorExprs.quantizeLoop($v, $isFloat);
         ${ev.isNull} = (${ev.value} == null);
       """
    })
}

/** Exact integer dot product over two array<long> columns as a single
  * codegen'd primitive loop. Mismatched lengths or null elements → null
  * (identical to `aggregate(zip_with(a,b,_*_),0L,_+_)`). */
case class DotProductQ(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_q"
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_q needs (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dotLoop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         int $n = $a.numElements();
         if ($n != $b.numElements()) {
           ${ev.isNull} = true;
         } else {
           long $acc = 0L;
           boolean $bad = false;
           for (int $i = 0; $i < $n; $i++) {
             if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
             $acc += $a.getLong($i) * $b.getLong($i);
           }
           if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         }
       """
    })
}
