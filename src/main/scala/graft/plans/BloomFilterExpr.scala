package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd predicate — the
  * runtime-filter building block for semi-join reduction
  * ([[graft.operators.BloomJoin]]).
  *
  * Spark's own AQE injects the equivalent (`BloomFilterMightContain`)
  * only when its cost model elects to; this expression makes the
  * pattern available as a LIBRARY operator the caller controls, for the
  * cases the planner can't see: the build side is known selective ahead
  * of time, the probe side is a scan the caller wants pre-shuffle
  * pruned, or the filter is reused across several queries.
  *
  * The filter object rides the plan as a codegen reference
  * (`ctx.addReferenceObj`) exactly like Spark's built-in — serialized
  * once with the task closure, probed per row with zero allocation
  * (`mightContainLong` hashes the primitive directly). A false positive
  * only costs a row that the exact join downstream discards; false
  * negatives are impossible, so pre-filter + exact join ≡ exact join. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
  extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects an integral key, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomFilterExpr {
  /** Predicate Column: does `bloom` possibly contain key `c`? */
  def mightContain(c: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(c), bloom))
}
