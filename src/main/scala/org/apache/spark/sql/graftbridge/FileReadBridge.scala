package org.apache.spark.sql.graftbridge

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat,
  PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet
  .ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Minimal `private[sql]` bridge for the graft V2 micro-batch
  * streaming source's per-partition PARQUET readers.
  *
  * A [[org.apache.spark.sql.connector.read.PartitionReaderFactory]]
  * must produce `InternalRow`s on executors without a DataFrame plan,
  * which is exactly what Spark's own file sources do through
  * `FileFormat.buildReaderWithPartitionValues` — a `private[sql]`
  * function-factory designed to be built on the driver and shipped
  * inside `FileScanRDD`. This object exposes that factory (and the
  * `PartitionedFile` constructor it consumes) and nothing else — the
  * same one-object bridge discipline as [[StreamBridge]] and
  * [[ColumnBridge]]. */
object FileReadBridge {

  /** A serializable whole-file parquet row reader: rows arrive in
    * FILE ORDER (the `_metadata.row_index` order deletion vectors
    * speak) with the partition values appended after the data
    * columns. `OPTION_RETURNING_BATCH = false` pins the ROW-iterator
    * contract — the vectorized reader still runs inside, it just
    * exposes rows, so the caller never needs ColumnarBatch
    * handling. No filters are pushed: a streamed window must deliver
    * every row. */
  def parquetRowReader(spark: SparkSession,
                       dataSchema: StructType,
                       partitionSchema: StructType,
                       requiredSchema: StructType)
  : PartitionedFile => Iterator[InternalRow] =
    parquetRowReader(spark, dataSchema, partitionSchema,
      requiredSchema, Seq.empty)

  /** Same reader with data filters pushed to the parquet reader for
    * row-group/page skipping. ONLY legal for files whose rows need no
    * positional accounting: a filtered iterator SKIPS rows, so the
    * row-index ↔ deletion-vector-position correspondence the
    * unfiltered form guarantees does not hold — callers (the
    * bucketed batch scan) route DV-carrying files through the
    * unfiltered reader. */
  def parquetRowReader(spark: SparkSession,
                       dataSchema: StructType,
                       partitionSchema: StructType,
                       requiredSchema: StructType,
                       filters: Seq[org.apache.spark.sql.sources.Filter])
  : PartitionedFile => Iterator[InternalRow] = {
    val classic = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    new ParquetFileFormat().buildReaderWithPartitionValues(
      classic, dataSchema, partitionSchema, requiredSchema,
      filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      classic.sessionState.newHadoopConf())
  }

  /** One whole-file split (offset 0, the full length) with the
    * file's partition values. */
  def partitionedFile(partValues: InternalRow, absPath: String,
                      length: Long): PartitionedFile =
    PartitionedFile(partValues, SparkPath.fromPathString(absPath),
      0L, length, Array.empty, 0L, length)
}
