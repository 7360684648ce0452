package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass tie-broken mode as a typed `Aggregator` — the UDAF surface
  * (SURVEY §4 "optional custom pieces"). Semantically identical to
  * [[ModeAgg.modeOf]] (most frequent value, ties → largest value) but
  * executes as ONE hash aggregation: partial frequency maps are built
  * map-side, merged at the reducer, and finished to the winner — versus
  * the window formulation's aggregate + second shuffle + sort.
  *
  * Scale trade-off: the buffer is a value→count map, so this wins when
  * per-group distinct-value cardinality is bounded (the reference's use
  * case: trip lengths / stop counts per route). With unbounded distinct
  * values per group the window formulation's fixed-width shuffle rows
  * are safer. */
class ModeAggregator
  extends Aggregator[Double, mutable.HashMap[Double, Long], Double] {

  override def zero: mutable.HashMap[Double, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[Double, Long], a: Double)
  : mutable.HashMap[Double, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L); b
  }

  override def merge(b1: mutable.HashMap[Double, Long],
                     b2: mutable.HashMap[Double, Long])
  : mutable.HashMap[Double, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (v, c) => big.update(v, big.getOrElse(v, 0L) + c) }
    big
  }

  /** Winner = max by (frequency, value) — the reference's deterministic
    * tie-break (`src/queries.py:27-28`). */
  override def finish(b: mutable.HashMap[Double, Long]): Double =
    if (b.isEmpty) Double.NaN
    else b.maxBy { case (v, c) => (c, v) }._1

  override def bufferEncoder: Encoder[mutable.HashMap[Double, Long]] =
    Encoders.kryo[mutable.HashMap[Double, Long]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ModeAggregator {
  /** Column function: `df.groupBy(g).agg(ModeAggregator.modeUdaf(col))`. */
  def modeUdaf(c: Column): Column = udaf(new ModeAggregator).apply(c)
}
