package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode text normalization — the canonicalization
  * pass every corpus-prep pipeline runs before hashing, deduplication
  * or tokenization (the reference's loaders never needed it because
  * their sources are ASCII CSV; a web corpus does): NFC composition
  * (é as e+◌́ and é as one codepoint must fingerprint identically),
  * root-locale lowercasing, ASCII-whitespace run collapse, trim. One
  * expression node inside whole-stage codegen — the alternative Scala
  * UDF would box every row and fence the codegen stage; the
  * regexp_replace chain would re-scan the string per rule.
  *
  * Semantics, pinned for cross-engine determinism (the q153 oracle
  * replays them as `nfc_normalize` → `lower` → `regexp_replace('\s+')`
  * → `trim` in DuckDB): normalization ORDER is NFC, then lowercase,
  * then collapse runs of ASCII whitespace ([ \t\n\r\f]) to one
  * space, then trim. Unicode-only whitespace (NBSP etc.) is data, not
  * separator, on both engines; locale-sensitive casings outside the
  * Latin-1 common set (dotted İ, final sigma) are NOT part of the
  * contract. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_text"

  override protected def withNewChildInternal(newChild: Expression)
  : NormalizeText = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    TextNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextNormalize.normalize($c)")
}

object TextNormalize {

  /** NFC → lowercase(ROOT) → ASCII-whitespace collapse → trim.
    * The NFC pass is skipped entirely for pure-ASCII input (one byte
    * scan decides) — the common case in a filtered corpus allocates
    * one builder, no Normalizer call. */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    val str = s.toString
    val composed =
      if (ascii) str
      else java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFC)
    val lower = composed.toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var j = 0
    while (j < lower.length) {
      val c = lower.charAt(j)
      // exactly RE2's \s class ([ \t\n\f\r]) so the oracle's
      // regexp_replace('\s+') sees the identical separator set
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
        c == '\f'
      if (isWs) {
        if (out.length() > 0) pendingSpace = true // leading ws drops
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      j += 1
    } // trailing ws drops: pendingSpace never flushed at end
    UTF8String.fromString(out.toString)
  }

  def normalizeText(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))

  /** Register `normalize_text` in a session's function registry
    * (idempotent) so `expr("normalize_text(c)")` resolves;
    * [[GraftExtensions]] injects the same binding for
    * `spark.sql.extensions` deployments. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("normalize_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => NormalizeText(children.head))
}
