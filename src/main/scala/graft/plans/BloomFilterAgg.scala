package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** GROUPED Bloom-filter build: one serialized filter per group, as an
  * aggregate — the per-file/per-partition index builder behind
  * [[graft.operators.ManifestSkip.buildBloomIndex]].
  *
  * Spark's own `df.stat.bloomFilter` builds ONE filter for a whole
  * frame (a treeAggregate to the driver); this aggregate builds one
  * PER GROUP inside a normal hash aggregation, so a single pass over a
  * sink tagged with `_metadata.file_path` yields the entire per-file
  * index — partial filters are built map-side and OR-merged in the
  * exchange like any other aggregation state, and what shuffles is
  * `filters × bitsize`, never rows.
  *
  * The buffer is sized up front from (`expectedKeys`, `fpp`) — Bloom
  * bit arrays don't grow, so over-cap groups silently degrade to a
  * higher false-positive rate rather than erroring; callers size from
  * the known rows-per-file bound (the write path's maxRecordsPerFile /
  * row-group budget). False positives only cost extra reads downstream
  * (the exact filter still applies); false negatives are impossible,
  * which is the property [[BloomMightContainLong]]'s scaladoc relies
  * on. Null inputs are ignored, as in every Spark aggregate. */
case class BloomFilterAgg(
    child: Expression, expectedKeys: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
  require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an integral or string key, got ${t.sql}")
  }
  override protected def withNewChildInternal(newChild: Expression)
  : BloomFilterAgg = copy(child = newChild)
  override def withNewMutableAggBufferOffset(newOffset: Int)
  : BloomFilterAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
  : BloomFilterAgg = copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedKeys, fpp)

  /** Value normalization contract shared with the probe side
    * ([[graft.operators.TableStats]] bloom pruning): integrals widen
    * to long (`putLong`), strings hash their UTF-8 bytes
    * (`putBinary`) — `String.getBytes(UTF_8)` on the probing driver
    * produces the same bytes as `UTF8String.getBytes` here. */
  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        buf.putBinary(s.getBytes)
      case n: Number => buf.putLong(n.longValue())
      case other => buf.putBinary(
        other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}

object BloomFilterAgg {
  /** Column form: one serialized Bloom filter of `c`'s values per
    * group. */
  def apply(c: Column, expectedKeys: Long, fpp: Double): Column =
    ColumnBridge.column(
      new BloomFilterAgg(ColumnBridge.expression(c), expectedKeys, fpp)
        .toAggregateExpression())
}
