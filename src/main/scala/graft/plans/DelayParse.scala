package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd parser for the reference's delay strings
  * (`src/delays.py:27-30` in jakublaba/idh-etl-demo): "N min" → +N,
  * "N min przed czasem" → −N, unparseable → null.
  *
  * The Catalyst-expression formulation in
  * [[graft.functions.ScalarFunctions.parseDelayMinutes]] builds the same
  * value from `regexp_extract` + `contains` + arithmetic — three passes
  * over the string through the regex engine. This expression does one
  * byte scan with no regex and no allocation, and participates in
  * whole-stage codegen via [[doGenCode]] — the custom-Expression
  * extension path (preferred over a Scala UDF, which would box rows and
  * break codegen).
  */
case class ParseDelayMinutes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_delay_minutes"

  override protected def withNewChildInternal(newChild: Expression)
  : ParseDelayMinutes = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val r = DelayParse.parse(input.asInstanceOf[UTF8String])
    if (r == DelayParse.NULL_SENTINEL) null else Integer.valueOf(r)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val parsed = ctx.freshName("parsed")
    ev.copy(code =
      code"""
         ${childGen.code}
         boolean ${ev.isNull} = true;
         int ${ev.value} = 0;
         if (!${childGen.isNull}) {
           int $parsed = graft.plans.DelayParse.parse(${childGen.value});
           if ($parsed != graft.plans.DelayParse.NULL_SENTINEL()) {
             ${ev.isNull} = false;
             ${ev.value} = $parsed;
           }
         }
       """)
  }
}

object DelayParse {
  /** Sentinel for "unparseable" so the hot path stays primitive-only. */
  val NULL_SENTINEL: Int = Int.MinValue

  private val MARKER = UTF8String.fromString("przed czasem")

  /** One forward scan: leading ASCII digits are the magnitude; the Polish
    * "ahead of schedule" marker anywhere flips the sign. */
  def parse(s: UTF8String): Int = {
    val n = s.numBytes()
    var len = 0
    var mag = 0L
    while (len < n && s.getByte(len) >= '0' && s.getByte(len) <= '9' &&
      mag <= Int.MaxValue) {
      mag = mag * 10 + (s.getByte(len) - '0')
      len += 1
    }
    if (len == 0) NULL_SENTINEL
    else {
      val v = if (mag > Int.MaxValue) Int.MaxValue else mag.toInt
      if (s.contains(MARKER)) -v else v
    }
  }

  /** Register `parse_delay_minutes` in a session's function registry
    * (idempotent) so `expr("parse_delay_minutes(c)")` resolves. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parse_delay_minutes"),
      new ExpressionInfo(classOf[ParseDelayMinutes].getName,
        "parse_delay_minutes"),
      (children: Seq[Expression]) => ParseDelayMinutes(children.head))
}

/** SparkSessionExtensions injector: enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` —
  * the supported way to ship custom expressions with a library. Exposes
  * every graft expression to SQL: `parse_delay_minutes`, `quantize_vec`,
  * `dot_q`, `hash60`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions
  => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions)
  : Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_delay_minutes"),
      new ExpressionInfo(classOf[ParseDelayMinutes].getName,
        "parse_delay_minutes"),
      (children: Seq[Expression]) => ParseDelayMinutes(children.head)))
    ext.injectFunction((
      FunctionIdentifier("quantize_vec"),
      new ExpressionInfo(classOf[QuantizeVec].getName, "quantize_vec"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"quantize_vec expects 1 argument, got ${children.length}")
        QuantizeVec(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_q"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_q expects 2 arguments, got ${children.length}")
        DotProductQ(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"hash60 expects 1 argument, got ${children.length}")
        Hash60(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"normalize_text expects 1 argument, got ${children.length}")
        NormalizeText(children.head)
      }))
    // statistics-driven planning (broadcast decisions AND the re-run
    // cost-based join reorder — see GraftStatsRule's scaladoc) rides
    // the extraOptimizations registration every graft read performs
    // (GraftStatsRule.ensureRegistered); registering here too makes a
    // session carry it even before its first graft resolution
    ext.injectOptimizerRule { session =>
      graft.sources.GraftStatsRule.ensureRegistered(session)
      new org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(p: org.apache.spark.sql.catalyst.plans
          .logical.LogicalPlan) = p
      }
    }
  }
}
