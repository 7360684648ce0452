package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale text deduplication — the operator family a 100 TB
  * training-data pipeline runs before anything else. Not present in the
  * reference (jakublaba/idh-etl-demo deduplicates only on exact key columns,
  * `src/weather.py:88`, `dags/idh_etl.py:214-221`); these are the standard
  * scale generalizations, built Spark-first:
  *
  *   - exact: hash-groupBy on a content digest — one shuffle of (digest,
  *     doc_id) pairs, never of the documents themselves;
  *   - n-gram Jaccard: shingle → inverted-index self-join → intersection
  *     count. Shuffle volume is bounded by shingle postings, and rare
  *     shingles keep the candidate pair set near-linear;
  *   - MinHash + LSH: constant-size signature per document (k hashes),
  *     banded so only probable near-dups ever meet in a join — the
  *     standard sub-quadratic near-dup path at corpus scale;
  *   - SimHash: one 16-bit fingerprint per document; near-dups share
  *     fingerprints (or low hamming distance), so bucketing is a groupBy.
  *
  * Everything is pure Catalyst expressions (md5 / transform / zip_with /
  * explode) — whole-stage codegen, no UDFs, no driver-side loops.
  * Determinism note: hash components are md5 hex strings; lexicographic
  * `min` over fixed-width hex = numeric min over the 128-bit value, and is
  * identical across engines, which is what makes these oracle-checkable.
  */
object Dedup {

  /** Word n-gram shingles of a single-space-tokenized text column.
    * Returns an array column (empty when the text has < n tokens). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup by content digest: one row per distinct text, with the
    * number of copies and the smallest doc_id kept. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Distinct (id, shingle) pairs — the inverted-index input shared by the
    * Jaccard join and MinHash. */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        explode(shingles(col(textCol), n)).as("sh"))
      .distinct()

  /** All-pairs n-gram Jaccard similarity ≥ `threshold`, via inverted-index
    * self-join. Output: (id_a, id_b, jaccard), id_a < id_b.
    * Scale: candidate pairs are generated per shared shingle, so the join
    * cost tracks Σ postings² per shingle — near-linear when shingles are
    * discriminative (use n ≥ 3); hot shingles can be dropped by a
    * frequency cap upstream. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val ds = docShingles(df, idCol, textCol, n).cache()
    val sizes = ds.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val inter = ds.as("x").join(ds.as("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.sid") < col("y.sid"))
      .groupBy(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures, wide form: ONE row per document with a
    * `numPerm`-element array column `sig`, sig(p) = min over shingles of
    * md5(p ++ "|" ++ shingle). The md5 work happens map-side over the
    * shingle rows; the shuffle carries only (doc, numPerm hashes) — the
    * constant-size-per-document property that makes near-dup detection
    * sub-quadratic at corpus scale. (A row-per-perm formulation would
    * shuffle |shingles| × numPerm rows instead.) */
  def minHashSignatures(docSh: DataFrame, numPerm: Int): DataFrame = {
    val mins = (0 until numPerm).map(p =>
      min(md5(concat(lit(s"$p|"), col("sh")))).as(s"__s$p"))
    docSh.groupBy(col("sid"))
      .agg(mins.head, mins.tail: _*)
      .select(col("sid"),
        array((0 until numPerm).map(p => col(s"__s$p")): _*).as("sig"))
  }

  /** LSH band keys from a wide signature: `numPerm / rowsPerBand` rows per
    * document, (sid, band, band_key = md5 of the band's signature slice).
    * Documents agreeing on any full band become candidate pairs. */
  def lshBands(sigs: DataFrame, numPerm: Int, rowsPerBand: Int): DataFrame = {
    val nBands = numPerm / rowsPerBand
    val bandKeys = (0 until nBands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(j =>
          col("sig").getItem(b * rowsPerBand + j)): _*))
    }
    sigs.select(col("sid"), posexplode(array(bandKeys: _*))
      .as(Seq("band", "band_key")))
  }

  /** Candidate near-dup pairs from banded MinHash, with the signature-
    * estimated Jaccard (fraction of agreeing permutations, compared
    * directly between the two signature arrays — no joins back into the
    * signature table). Output: (id_a, id_b, est_jaccard), id_a < id_b. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numPerm: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minHashSignatures(docShingles(df, idCol, textCol, n), numPerm)
      .cache()
    val bands = lshBands(sigs, numPerm, rowsPerBand)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("sid").as("id_a"), col("sig").as("sig_a")),
        "id_a")
      .join(sigs.select(col("sid").as("id_b"), col("sig").as("sig_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numPerm)
          .as("est_jaccard"))
  }

  /** 16-bit SimHash from unigram token counts. Bit i is derived from hex
    * nibble i/4 of md5(token); the document bit is the sign of the
    * count-weighted ±1 vote. One integer per document — near-dup buckets
    * are then a plain groupBy on the fingerprint. */
  def simHash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokCounts = df
      .select(col(idCol).as("sid"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("sid", "tok")
      .agg(count(lit(1)).as("cnt"))
    val bits = tokCounts.sparkSession.range(16).toDF("bit")
    tokCounts.crossJoin(bits)
      .select(col("sid"), col("bit"), col("cnt"),
        // hex nibble bit/4 of md5(tok), tested at bit position bit%4
        (instr(lit("0123456789abcdef"),
          substring(md5(col("tok")), (col("bit") / 4).cast("int") + 1, lit(1)))
          - 1).as("nib"))
      .select(col("sid"), col("bit"),
        (col("cnt") * (floor(col("nib") / pow(lit(2), pmod(col("bit"), lit(4))))
          .cast("long") % 2 * 2 - 1)).as("vote"))
      .groupBy("sid", "bit")
      .agg(sum("vote").as("votes"))
      .groupBy("sid")
      .agg(sum(when(col("votes") > 0,
        pow(lit(2), col("bit")).cast("long")).otherwise(0L))
        .as("simhash"))
  }
}
