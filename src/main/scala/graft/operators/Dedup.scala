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

  /** MinHash signatures: `numPerm` rows per document,
    * (sid, perm, sig = min over shingles of md5(perm ++ "|" ++ shingle)).
    * The signature is constant-size per document regardless of length —
    * the property that makes near-dup detection sub-quadratic at scale. */
  def minHashSignatures(docSh: DataFrame, numPerm: Int): DataFrame = {
    val perms = docSh.sparkSession.range(numPerm).toDF("perm")
    docSh.crossJoin(perms)
      .groupBy(col("sid"), col("perm"))
      .agg(min(md5(concat(col("perm").cast("string"), lit("|"), col("sh"))))
        .as("sig"))
  }

  /** LSH band keys: `numPerm / rowsPerBand` rows per document,
    * (sid, band, band_key = md5 of the band's signature slice). Documents
    * agreeing on any full band become candidate pairs. */
  def lshBands(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val r = rowsPerBand
    val slots = (0 until r).map(j =>
      min(when(pmod(col("perm"), lit(r)) === j, col("sig"))).as(s"s$j"))
    sigs
      .groupBy(col("sid"), (col("perm") / r).cast("long").as("band"))
      .agg(slots.head, slots.tail: _*)
      .select(col("sid"), col("band"),
        md5(concat_ws("|", (0 until r).map(j => col(s"s$j")): _*))
          .as("band_key"))
  }

  /** Candidate near-dup pairs from banded MinHash, with the signature-
    * estimated Jaccard (fraction of agreeing permutations).
    * Output: (id_a, id_b, est_jaccard), id_a < id_b, distinct. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numPerm: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minHashSignatures(docShingles(df, idCol, textCol, n), numPerm)
      .cache()
    val bands = lshBands(sigs, rowsPerBand)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("sid").as("id_a"), col("perm"),
        col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("sid").as("id_b"), col("perm"),
        col("sig").as("sig_b")), Seq("id_b", "perm"))
      .groupBy("id_a", "id_b")
      .agg((sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0))
        .cast("double") / numPerm).as("est_jaccard"))
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
