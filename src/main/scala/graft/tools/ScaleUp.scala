package graft.tools

import graft.io.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an N× scale-up of a driver test-data dir, for
  * second-scale probes of the heavy operators (SCALING.md). The driver
  * only ships sf ≤ 0.1; the 100 TB claims need a measured scaling
  * exponent, which needs a bigger input.
  *
  * Replication is query-aware — each fact-side table is replicated
  * `factor`× with the replicas made DISJOINT in exactly the space the
  * probed operators measure, so the workload grows linearly instead of
  * collapsing (dedup merging replicas) or exploding (replicas becoming
  * near-duplicates of each other):
  *
  *   - `documents` (q26/q63): replica k > 0 suffixes every token with
  *     `~k`, so cross-replica shingle sets are disjoint — the postings
  *     lists and near-dup structure of each replica match sf0.1's, and
  *     the corpus-wide doc-frequency profile scales like a corpus that
  *     grew by new content (vocabulary ∝ corpus), not by copies.
  *   - `embeddings` (q92): replica k > 0 rotates the vector by k
  *     positions and sign-flips via bit (i mod 4) of k — norms and
  *     within-replica geometry are exactly preserved, cross-replica
  *     cosines drop far below any dup threshold (verified ≤ ~0.5 on
  *     the driver fixtures).
  *   - `events` (q56 star build): replica k shifts `ts` by k×31 days —
  *     ten months of feed instead of one, the way fact data actually
  *     grows; hour/day surrogate keys (time_id, weather_id) stay
  *     distinct so the publish dedup keeps all replicas.
  *   - `lineitem` (q87/q97): all three keys offset per replica → ten
  *     disjoint copies of the co-occurrence graph (components ×N,
  *     triangles ×N, PageRank mass per copy unchanged).
  *
  * Dimension-side tables (region/nation/customer/supplier/part/orders)
  * are copied verbatim: the star dimensions are modulo-bounded (100
  * routes, 50 stops) and real dimensions don't grow with fact volume —
  * scaling them would distort the broadcast-ability the plans rely on.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.Verify.session(defaultCpus = "32")
    val reps = broadcast(
      spark.range(factor.toLong).select(col("id").cast("int").as("k")))

    def t(name: String): DataFrame = Sources.table(spark, src, name)
    def rep(name: String): DataFrame = t(name).crossJoin(reps)
    def keyStride(name: String, keys: String*): Map[String, Long] =
      keys.map(c => c ->
        (t(name).agg(max(col(c))).head().getLong(0) + 1L)).toMap
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale-up] $name -> " +
        spark.read.parquet(s"$dst/$name.parquet").count() + " rows")
    }

    val docStride = keyStride("documents", "doc_id")("doc_id")
    write(rep("documents").select(
      (col("doc_id") + col("k") * docStride).as("doc_id"),
      when(col("k") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit("~"), col("k"))), " ")).as("text"),
      col("lang"), col("source"),
      length(when(col("k") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit("~"), col("k"))), " ")))
        .cast("long").as("n_chars")), "documents")

    val vecStride = keyStride("embeddings", "vec_id")("vec_id")
    val dim = t("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    write(rep("embeddings").select(
      (col("vec_id") + col("k") * vecStride).as("vec_id"),
      expr(s"""transform(
          case when k = 0 then embedding
               else concat(slice(embedding, (k % $dim) + 1,
                                 $dim - (k % $dim)),
                           slice(embedding, 1, k % $dim)) end,
          (x, i) -> cast(x * (1 - 2 * (shiftright(k, i % 4) & 1))
                         as float))""").as("embedding"),
      col("label")), "embeddings")

    val evStride = keyStride("events", "event_id")("event_id")
    write(rep("events").select(
      (col("event_id") + col("k") * evStride).as("event_id"),
      (col("ts") + expr("make_dt_interval(k * 31, 0, 0, 0)")).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props")),
      "events")

    val li = keyStride("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    write(rep("lineitem").select(
      (col("l_orderkey") + col("k") * li("l_orderkey")).as("l_orderkey"),
      (col("l_partkey") + col("k") * li("l_partkey")).as("l_partkey"),
      (col("l_suppkey") + col("k") * li("l_suppkey")).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach(n => write(t(n), n))
    spark.stop()
  }
}
