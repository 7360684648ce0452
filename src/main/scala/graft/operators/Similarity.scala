package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column — the ANN
  * surface a training-data pipeline needs for near-dup mining and
  * retrieval. Not in the reference (no vector data there); built
  * Spark-first as pure Catalyst expressions.
  *
  * Exactness strategy: float sums are order-sensitive, so similarities are
  * computed over vectors quantized to integers (`round(x * 1e6)` as long).
  * Integer dot products are exact and order-independent; the final cosine
  * is one IEEE double expression — bit-identical across engines, which
  * makes brute-force and LSH results oracle-checkable and makes re-runs
  * deterministic under any parallelism.
  *
  * Scale shape:
  *   - brute-force top-k: |Q| × |D| zip_with/aggregate dot products inside
  *     whole-stage codegen, then a per-query window top-k. Right answer,
  *     linear scan — the baseline.
  *   - hyperplane LSH: each vector is reduced to a small bucket id by the
  *     signs of `numPlanes` pseudo-random projections; candidates meet in
  *     an equi-join on the bucket. Probe cost drops from |D| to the bucket
  *     occupancy (|D| / 2^planes expected); recall is tunable by planes /
  *     multi-probe. The plane matrix is derived from md5 so both engines
  *     (and every executor) materialize identical planes with no shared
  *     state.
  */
object Similarity {

  /** Quantize array<float> → array<long> of round(x * 1e6). */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x * lit(1000000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors (left fold —
    * deterministic, and exact for |x| ≤ ~1e3 at 64 dims). */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity from quantized vectors, as one IEEE double
    * expression: dot / (sqrt(|a|²) * sqrt(|b|²)). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (including itself when present). Deterministic
    * tie-break by corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int)
  : DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
      quantize(col("embedding")).as("qe"))
    val d = corpus.select(col("vec_id").as("did"),
      quantize(col("embedding")).as("de"))
    q.crossJoin(d)
      .select(col("qid"), col("did"),
        cosineQ(col("qe"), col("de")).as("cosine"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("qid")
          .orderBy(col("cosine").desc, col("did").asc)))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: weight(plane p, dim j) =
    * 2 * instr("0123456789abcdef", md5("p-j")[0]) − 17 — odd integers in
    * [−15, 15], derived identically everywhere from md5. One small frame
    * (numPlanes × dims), broadcast to every executor. */
  def planeWeights(spark: org.apache.spark.sql.SparkSession,
                   numPlanes: Int, dims: Int): DataFrame = {
    val planes = spark.range(numPlanes).toDF("plane")
    val ds = spark.range(dims).toDF("dim")
    planes.crossJoin(ds)
      .select(col("plane"), col("dim"),
        (instr(lit("0123456789abcdef"),
          substring(md5(concat(col("plane").cast("string"), lit("-"),
            col("dim").cast("string"))), 1, 1)) * 2 - 17).as("w"))
  }

  /** LSH bucket id per vector: bit p of the bucket is the sign of the
    * projection onto plane p. Input must carry (id, qvec: array<long>). */
  def lshBuckets(vecs: DataFrame, planes: DataFrame, idCol: String)
  : DataFrame =
    vecs.select(col(idCol), posexplode(col("qvec")).as(Seq("dim", "v")))
      .join(broadcast(planes), "dim")
      .groupBy(col(idCol), col("plane"))
      .agg(sum(col("v") * col("w")).as("proj"))
      .groupBy(col(idCol))
      .agg(sum(when(col("proj") > 0,
        pow(lit(2), col("plane")).cast("long")).otherwise(0L))
        .as("bucket"))

  /** ANN top-k via hyperplane LSH: exact cosine, but only within the
    * query's bucket. Trades recall for a |D|/2^planes probe cost. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, numPlanes: Int,
              k: Int): DataFrame = {
    val spark = queries.sparkSession
    val dims = 64
    val planes = planeWeights(spark, numPlanes, dims)
    val q = queries.select(col("vec_id").as("qid"),
      quantize(col("embedding")).as("qvec"))
    val d = corpus.select(col("vec_id").as("did"),
      quantize(col("embedding")).as("qvec"))
    val qb = lshBuckets(q, planes, "qid").withColumnRenamed("qid", "id")
    val db = lshBuckets(d, planes, "did").withColumnRenamed("did", "id")
    val qq = q.join(qb.withColumnRenamed("id", "qid"), "qid")
      .withColumnRenamed("qvec", "qe")
    val dd = d.join(db.withColumnRenamed("id", "did"), "did")
      .withColumnRenamed("qvec", "de")
    val scored = qq.join(dd, "bucket")
      .select(col("qid"), col("did"),
        cosineQ(col("qe"), col("de")).as("cosine"))
    scored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("qid")
          .orderBy(col("cosine").desc, col("did").asc)))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a, id_b, cosine)
    * with cosine ≥ `threshold`, id_a < id_b. Candidates come from the
    * hyperplane-LSH bucket equi-join (near-identical vectors agree on
    * every projection sign with high probability), then the exact
    * quantized cosine filters them — so the pair set never materializes
    * the |D|² cross product. At corpus scale the bucket join shuffles
    * only (bucket, id, vec) rows and each bucket's pair generation is
    * local to one task; recall/occupancy trades by `numPlanes`. */
  def cosineNearDupPairs(corpus: DataFrame, numPlanes: Int,
                         threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    val d = corpus.select(col("vec_id").as("did"),
      quantize(col("embedding")).as("qvec"))
    val planes = planeWeights(spark, numPlanes, dims = 64)
    val withBuckets = d.join(lshBuckets(d, planes, "did"), "did")
    withBuckets.as("x")
      .join(withBuckets.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.did") < col("y.did"))
      .select(col("x.did").as("id_a"), col("y.did").as("id_b"),
        cosineQ(col("x.qvec"), col("y.qvec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** IVF (inverted-file) ANN: partition the corpus into `numCentroids`
    * cells by nearest centroid, then probe only the query's `nProbe`
    * nearest cells. Probe cost drops from |D| to nProbe × |D|/centroids.
    *
    * Centroids here are the first `numCentroids` corpus vectors by id —
    * deterministic and engine-portable; a production deployment would
    * k-means-train them, leaving every downstream step unchanged. The
    * centroid set is tiny and broadcast; cell assignment is one pass over
    * the corpus (the shape that scales: at 100 TB the corpus×centroid
    * score is a map-side broadcast join, and the probe join shuffles only
    * cell-assigned ids, re-partitioned by cell). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, numCentroids: Int,
              nProbe: Int, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cents = corpus.orderBy("vec_id").limit(numCentroids)
      .select(col("vec_id").as("cid"), quantize(col("embedding")).as("ce"))
    def assign(vecs: DataFrame, idC: String, vecC: String,
               keep: Int): DataFrame =
      vecs.crossJoin(broadcast(cents))
        .select(col(idC), col(vecC), col("cid"),
          cosineQ(col(vecC), col("ce")).as("ccos"))
        .withColumn("crank", row_number().over(
          w.partitionBy(idC).orderBy(col("ccos").desc, col("cid").asc)))
        .filter(col("crank") <= keep)
        .drop("ccos", "crank")
    val cells = assign(corpus.select(col("vec_id").as("did"),
      quantize(col("embedding")).as("de")), "did", "de", 1)
    val probes = assign(queries.select(col("vec_id").as("qid"),
      quantize(col("embedding")).as("qe")), "qid", "qe", nProbe)
    probes.join(cells, "cid")
      .select(col("qid"), col("did"),
        cosineQ(col("qe"), col("de")).as("cosine"))
      .groupBy("qid", "did") // a (q,d) pair can meet via several probes
      .agg(max("cosine").as("cosine"))
      .withColumn("rank", row_number().over(
        w.partitionBy("qid").orderBy(col("cosine").desc, col("did").asc)))
      .filter(col("rank") <= k)
  }
}
