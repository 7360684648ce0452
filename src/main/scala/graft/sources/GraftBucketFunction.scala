package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, DateType,
  IntegerType, LongType, ShortType, StringType, StructType}

/** The V2 `bucket(n, col)` function [[GraftCatalog]] serves through
  * its `FunctionCatalog` face — the missing piece that lets Spark
  * RESOLVE the `KeyGroupedPartitioning(bucket(n, col))` a bucketed
  * graft scan reports: `V2ExpressionUtils.toCatalystTransformOpt`
  * loads `bucket` from the scan relation's function catalog, binds it
  * against `(int, <key type>)`, and wraps both join sides'
  * partitionings in `TransformExpression`s whose compatibility check
  * is the bound function's `canonicalName` — so two graft tables
  * bucketed `(n, same-typed key)` storage-partition-join with zero
  * exchanges (Iceberg ships the same function-catalog shape for the
  * same reason).
  *
  * The result MUST equal the writer's routing expression
  * ([[graft.operators.Bucketing.bucketExpr]] =
  * `pmod(functions.hash(col), n)`): both are Murmur3 seed 42 over the
  * Catalyst value, positive modulo — a divergence would co-locate the
  * wrong buckets and return wrong join rows, so BucketedSpjSpec pins
  * function-vs-expression equality over every supported type. */
final class GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): Murmur3(seed 42) hash bucket id in [0, n) — " +
      "the graft bucketed-layout routing function"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"graft bucket(n, col) takes exactly 2 arguments (got " +
        s"${inputType.fields.length})")
    require(inputType.fields(0).dataType == IntegerType,
      s"graft bucket: the bucket count must be INT (got " +
        s"${inputType.fields(0).dataType.catalogString})")
    val keyType = inputType.fields(1).dataType
    require(GraftBucketFunction.supported(keyType),
      s"graft bucket: unsupported key type ${keyType.catalogString} " +
        "(supported: tinyint, smallint, int, bigint, date, string)")
    GraftBoundBucket(keyType)
  }
}

object GraftBucketFunction {
  /** Types the routing hash is defined over — fixed-seed Murmur3 of
    * the primitive/UTF8 value, identical between `functions.hash` and
    * [[GraftBoundBucket.produceResult]]. */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         StringType => true
    case _ => false
  }
}

/** Bound form: `(int n, keyType) => int` — [[Murmur3HashFunction]]
  * (the exact engine behind `functions.hash`) then positive modulo.
  * `canonicalName` carries the key type, so an int-keyed and a
  * long-keyed bucketing never read as compatible partitionings. */
final case class GraftBoundBucket(keyType: DataType)
  extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] =
    Array(IntegerType, keyType)

  override def resultType(): DataType = IntegerType

  override def name(): String = "bucket"

  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"

  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // functions.hash(null) = the seed itself (Catalyst skips null
    // children) — match it exactly
    val h =
      if (input.isNullAt(1)) 42
      else Murmur3HashFunction.hash(input.get(1, keyType), keyType,
        42L).toInt
    val r = h % n
    Integer.valueOf(if (r < 0) r + n else r)
  }
}
