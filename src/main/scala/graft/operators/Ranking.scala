package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — the scalable form of
  * `row_number() OVER (ORDER BY …)`.
  *
  * A plain unpartitioned window collapses the whole input onto ONE task
  * (Spark plans a single-partition Exchange for an empty PARTITION BY),
  * which is the classic 100 TB cliff: the query "works" at test scale
  * and then one executor sorts the corpus. This operator produces the
  * identical numbering with no single-partition stage:
  *
  *   1. `repartitionByRange` on the sort key, MATERIALIZED ONCE by an
  *      eager `localCheckpoint` — each partition holds one contiguous
  *      key range, partition index = range order. The checkpoint is
  *      load-bearing, not an optimization: the range boundaries come
  *      from a SAMPLING pass whose seed varies per execution, and the
  *      count job (step 2) and window job (step 3) would otherwise
  *      each re-execute the exchange and can land rows near range
  *      borders in DIFFERENT partitions — offsets from one
  *      partitioning applied to another yields overlapping/duplicated
  *      global ranks (caught by q197's dense duplicate-heavy sort key;
  *      q164's sparser keys never tripped it). Materializing pins ONE
  *      partitioning that every downstream job — including the
  *      caller's own actions on the returned frame — reads. Cost: one
  *      write of the shuffled input to local executor storage, the
  *      honest price of a consistent global rank (the q63/q87
  *      iterative-loop discipline applied to a two-job operator);
  *   2. ONE metadata-sized aggregation counts rows per partition; the
  *      running offsets (|partitions| longs, collected — bounded by the
  *      partition count, not the data) broadcast back as a join;
  *   3. within each range, an ordinary `row_number` over
  *      PARTITION BY partition-id — every window group is one range,
  *      all ranges rank in parallel — plus the range's offset.
  *
  * Total cost: one range shuffle + one count pass + one per-range sort;
  * no stage sees more than one range's rows. Ties: rows equal on the
  * full sort key land in the same range (boundaries are key values), so
  * tie behavior is exactly plain `row_number`'s — arbitrary within the
  * tie, identical ordering guarantees. Callers that need a
  * deterministic, oracle-matchable numbering must pass a total
  * (tie-free) sort key, same as they would with the window form. */
object Ranking {

  /** Append `outCol` = the 1-based global row number of each row under
    * `sortCols` (interpreted like ORDER BY — pass `col(...).desc` /
    * `.asc` columns). `numRanges` defaults to the session's shuffle
    * parallelism. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      outCol: String = "rn",
                      numRanges: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs a sort key")
    val n = if (numRanges > 0) numRanges
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val pidCol = "__graft_range_pid"
    val offCol = "__graft_range_off"
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint(true) // pin ONE sampled partitioning (see doc)
    // |partitions|-row aggregate → exclusive-prefix-sum offsets; the
    // collect is bounded by the range count (a config, not the data).
    // Both this job and the window job read the CHECKPOINTED blocks —
    // same rows in the same partitions by construction (the explicit
    // partition count additionally keeps the exchange
    // REPARTITION_BY_NUM so AQE cannot re-coalesce it).
    val counts = ranged.groupBy(pidCol).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val o = (pid, acc); acc += c; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDF = offsets.toSeq.toDF(pidCol, offCol)
    ranged
      .join(broadcast(offDF), pidCol)
      .withColumn(outCol,
        (col(offCol) +
          row_number().over(
            Window.partitionBy(pidCol).orderBy(sortCols: _*)))
          .cast("long"))
      .drop(pidCol, offCol)
  }
}
