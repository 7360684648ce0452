package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** `collect_set` over a BIGINT column that stops retaining elements once
  * the set holds `limit` distinct values, returned SORTED ascending.
  *
  * Built for the grouped-postings dedup path ([[graft.operators.Dedup
  * .jaccardPairs]]): postings lists are only *used* when the shingle's
  * document frequency is ≤ maxDocFreq — over-cap shingles (boilerplate
  * headers, license blurbs) are dropped by a `size(ids) <= cap` filter
  * right after the aggregation. A plain `collect_set` still materializes
  * the FULL postings array per key before that filter, so one shingle
  * present in millions of documents builds a multi-million-element
  * aggregation buffer on a single executor. With `limit = cap + 1` this
  * aggregate is exact for every kept group (a set that never reaches the
  * cap admits every element) and caps the dropped groups' buffers at
  * `cap + 1` elements — distinguishing ≤cap from >cap exactly while
  * bounding both memory AND the map-side shuffle volume of hot keys.
  *
  * Null inputs are ignored, as in `collect_set`.
  */
case class CollectSetSortedCapped(
    child: Expression, limit: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(limit > 0, s"limit must be positive, got $limit")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_set_sorted_capped"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BIGINT, got ${t.sql}")
  }
  override protected def withNewChildInternal(newChild: Expression)
  : CollectSetSortedCapped = copy(child = newChild)
  override def withNewMutableAggBufferOffset(newOffset: Int)
  : CollectSetSortedCapped = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
  : CollectSetSortedCapped = copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
    new java.util.HashSet[java.lang.Long]()

  override def update(buf: java.util.HashSet[java.lang.Long],
                      input: InternalRow): java.util.HashSet[java.lang.Long] = {
    if (buf.size < limit) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: java.util.HashSet[java.lang.Long],
                     other: java.util.HashSet[java.lang.Long])
  : java.util.HashSet[java.lang.Long] = {
    val it = other.iterator()
    while (buf.size < limit && it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: java.util.HashSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashSet[java.lang.Long])
  : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
  : java.util.HashSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashSet[java.lang.Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

object CollectSetSortedCapped {
  /** Column form: `collect_set_sorted_capped(col, limit)` as an
    * aggregate expression. */
  def apply(c: Column, limit: Int): Column =
    ColumnBridge.column(
      new CollectSetSortedCapped(ColumnBridge.expression(c), limit)
        .toAggregateExpression())
}
