package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters without shuffling the key universe — the
  * two-pass Misra-Gries algorithm (Misra & Gries 1982; the MapReduce
  * form in Berinde et al., PODS 2009):
  *
  *   pass 1  every partition runs an MG summary with k counters over
  *           its local stream — O(k) memory, no shuffle — and emits
  *           its surviving candidate keys;
  *   pass 2  ONLY the candidates (≤ k per partition) are exactly
  *           counted and thresholded.
  *
  * Completeness: MG with k counters retains every item whose local
  * frequency exceeds n_p/(k+1). If count(x)·(k+1) > N globally, then
  * by pigeonhole count_p(x)·(k+1) > n_p in at least one partition, so
  * x survives somewhere. The pass-2 threshold count(x)·k > N is
  * strictly stronger than the (k+1) bound, hence every reported item
  * is found, and the exact recount discards MG's false candidates —
  * the result is EXACTLY {x : count(x) > N/k} with true counts,
  * which is what the q124 oracle computes with a plain GROUP BY.
  *
  * Scale math: a full token group-count at corpus scale shuffles one
  * partial per DISTINCT key per task — a web corpus's 10⁸⁺ vocabulary
  * — where this shuffles at most k·P candidate keys (P = task count).
  * The price is a second pass over the data; for the common case
  * (tokens derived from a scanned column) that is one extra columnar
  * scan, not a shuffle. The candidate table is k·P-sized — small, but
  * P grows with the data, so its join into pass 2 gets the same
  * conditional hint as every data-dependent build side
  * ([[Graphs.triangleStats]] discipline). */
object FrequentItems {

  /** All items of `itemCol` with count·k > total (i.e. frequency
    * strictly above N/k), with exact counts, ordered count-desc then
    * item. `tokens` is scanned twice (MG pass, exact pass) plus one
    * count for N — materialize it if it is expensive to derive. */
  def exactFrequent(tokens: DataFrame, itemCol: String, k: Int,
                    broadcastMaxRows: Long = 4_000_000L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    val items: Dataset[String] =
      tokens.select(col(itemCol).cast("string")).as[String]
    val cand = items.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { w =>
        counters.get(w) match {
          case Some(c) => counters.update(w, c + 1)
          case None if counters.size < k => counters.update(w, 1L)
          case None => // MG decrement step: all counters down one
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.filterInPlace((_, c) => c > 0)
        }
      }
      counters.keysIterator
    }.toDF(itemCol).distinct()
    val nCand = cand.count()
    val candSide =
      if (nCand <= broadcastMaxRows) broadcast(cand) else cand
    val total = tokens.count()
    // same cast as the MG pass, so the join keys agree for any input type
    tokens.select(col(itemCol).cast("string").as(itemCol))
      .join(candSide, itemCol)
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > total)
      .orderBy(col("cnt").desc, col(itemCol))
  }
}
