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
  *   - n-gram Jaccard: shingle → per-shingle postings list (one wide
  *     shuffle) → map-side pair enumeration → intersection count, with a
  *     document-frequency cap so a boilerplate shingle can never produce
  *     a quadratic candidate bucket;
  *   - MinHash + LSH: constant-size signature per document (k permutation
  *     hashes), banded so only probable near-dups ever meet in a join —
  *     the standard sub-quadratic near-dup path at corpus scale;
  *   - SimHash: one 16-bit fingerprint per document; near-dups share
  *     fingerprints (or low hamming distance), so bucketing is a groupBy.
  *
  * Everything is pure Catalyst expressions — whole-stage codegen, no UDFs,
  * no driver-side loops.
  *
  * Hashing strategy (engine-portable AND aggregation-friendly): a shingle
  * is reduced once to a 60-bit long via the first 15 hex chars of its md5
  * (`conv(substr(md5(s),1,15),16,10)` ≡ DuckDB
  * `('0x' || substr(md5(s),1,15))::BIGINT`). All downstream work — the
  * inverted-index join, the MinHash permutations `(aₚ·h + bₚ) mod P`
  * (P = 2³¹−1, classic universal-hash family) — is 64-bit integer
  * arithmetic: exact, identical across engines, and min-aggregatable in
  * Spark's `HashAggregateExec` (a `min` over *strings* has no fixed-width
  * buffer and silently falls back to sort-based aggregation — the one-md5-
  * per-perm formulation this replaces was 16 string mins and paid exactly
  * that cost).
  */
object Dedup {

  /** Modulus of the MinHash permutation family: the Mersenne prime 2³¹−1.
    * (aₚ·(h mod P) + bₚ) stays far below 2⁶³ — no overflow anywhere. */
  val MinHashP = 2147483647L

  /** Drop the localCheckpoint blocks behind an eagerly-checkpointed
    * frame. Iterative loops ([[connectedComponents]], PageRank) must
    * release each superseded round's blocks explicitly: ContextCleaner
    * only frees them on a driver GC, which a large heap may not run for
    * a long session — measured: rounds slowed ~7× once accumulated
    * blocks filled the block manager. */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Word n-gram shingles over an ALREADY-SPLIT token-array column.
    * Returns an array column (empty when there are < n tokens).
    *
    * Taking the token array (not the text) is deliberate: higher-order
    * lambdas re-evaluate every subtree they reference per element, so a
    * `split(text)` inside the lambda body would re-tokenize the document
    * once per shingle index — O(tokens²) splits per document. Callers
    * project `split(text, " ")` once, below the explode, and the lambda
    * then slices the bound array. */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles of a single-space-tokenized text column.
    * Convenience form for single-pass uses; see [[shinglesOfTokens]] for
    * why hot paths must pre-project the token array instead. */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(split(text, " "), n)

  /** 60-bit content hash of a string: first 15 hex chars of md5, as long.
    * Always non-negative; identical in DuckDB as
    * `('0x' || substr(md5(s),1,15))::BIGINT`. Computed by the native
    * [[graft.plans.Hash60]] expression — one digest, no hex-string
    * round-trip (the `conv(substring(md5(s),1,15),16,10)` formulation it
    * replaces rendered and re-parsed 15 hex chars per shingle row, the
    * innermost allocation of the whole dedup family at corpus scale);
    * a property spec pins value equality against the composed form. */
  def hash60(s: Column): Column = graft.plans.Hash60Expr.hash60(s)

  /** Exact dedup by content digest: one row per distinct text, with the
    * number of copies and the smallest doc_id kept. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Raw (id, shingle-hash) rows — NOT deduplicated. Hashing to long
    * right at the source means everything downstream carries (long, long)
    * rows, not shingle strings — ~4× less shuffle volume at corpus scale.
    *
    * Deliberately no `.distinct()`: both consumers absorb duplicate
    * (sid, h) rows inside their own single aggregation (`collect_set` in
    * [[jaccardPairs]]; `min` in [[minHashSignatures]], which is
    * duplicate-insensitive), so a separate distinct would add a full
    * extra shuffle of every shingle occurrence for nothing. Measured
    * cost of the trade (sf0.1): the MinHash path pays ~0.5 s of extra
    * map-side multiply-adds re-hashing duplicate occurrences (q27
    * 2.3 → 2.8 s) — at corpus scale the saved shuffle wins, since
    * shuffle volume, not per-row CPU, is the 100 TB bottleneck. */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    // tokenize ONCE per document in the projection below the Generate —
    // the shingle lambda then slices the bound array (see shinglesOfTokens)
    df.select(col(idCol).as("sid"), split(col(textCol), " ").as("__tk"))
      .select(col("sid"),
        explode(transform(shinglesOfTokens(col("__tk"), n),
          s => hash60(s))).as("h"))

  /** Longest shared token span per candidate document pair — the
    * plagiarism/quotation LOCATOR that set-based similarity (Jaccard,
    * containment) cannot express: not "how much overlaps" but WHERE,
    * and for how long contiguously. Output per (id_a, id_b) pair
    * (id_a < id_b) whose longest common run is ≥ `minRun` shingles:
    * the run length, its token span (run + n − 1), and the 0-based
    * start offsets in both documents.
    *
    * Shape: positional shingle postings (sid, pos, h) — same
    * (long, long) hash discipline as [[docShingles]] plus one position
    * int — self-joined on the hash to matching-position pairs, then the
    * classic diagonal trick: a contiguous common run lies on one
    * diagonal (pa − pb constant), so islands of consecutive `pa` per
    * (pair, diagonal) ARE the shared spans, found by one partitioned
    * window (pa − row_number) + aggregation — O(hits log hits), the
    * documents' text never rescanned after the one shingle pass.
    * `maxOccurrences` caps the postings of boilerplate shingles
    * exactly like [[jaccardPairs]]'s `maxDocFreq` (per-shingle join
    * work ≤ cap²) — but the cap is damage control, not the scale
    * path: this form still enumerates every co-occurring pair below
    * the cap, Σ occ² over shingles, which at 100 TB is quadratic-ish
    * however you cap it. At corpus scale use [[sharedSpansFor]], which
    * takes the candidate PAIRS from [[minHashCandidates]] and bounds
    * all pair generation by the LSH candidate list (q311 is the
    * demonstrated composition). This all-pairs form is for bounded
    * inputs: one shard, one cluster, a forensics batch. Ties (equal
    * run length) resolve deterministically: smallest start_a, then
    * smallest diagonal. */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
                  n: Int, minRun: Long,
                  maxOccurrences: Long = 10_000L): DataFrame = {
    val psh = positionalShingles(df, idCol, textCol, n)
    val keep = psh.groupBy("h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxOccurrences).select("h")
    val pshc = psh.join(keep, "h")
    val hits = pshc.as("a").join(pshc.as("b"),
        col("a.h") === col("b.h") && col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"),
        col("a.pos").as("pa"), (col("a.pos") - col("b.pos")).as("diag"))
    spansFromHits(hits, n, minRun)
  }

  /** Candidate-bounded [[sharedSpans]] — the 100 TB form: `candidates`
    * carries the (id_a, id_b) pairs to locate spans for (normally
    * [[minHashCandidates]] output above a threshold; any pair frame
    * works), and ALL pair generation is bounded by that list instead
    * of by every co-occurring shingle. Shape:
    *   1. postings are computed only for documents named by some
    *      candidate pair (semi-join — at a 0.1% near-dup rate this
    *      prunes 99.9% of the corpus before any token is shingled);
    *   2. hits come from candidates ⋈ postings(id_a) ⋈ postings(id_b,
    *      same hash) — per-pair cost is the matching-position count of
    *      THAT pair, so a boilerplate shingle costs nothing outside
    *      the candidate list (no occ² term, hence no cap parameter);
    *   3. the diagonal-island window is [[sharedSpans]]'s, unchanged.
    * Output schema and tie-breaks are identical to [[sharedSpans]];
    * pairs are normalized to id_a < id_b and deduplicated first. */
  def sharedSpansFor(df: DataFrame, idCol: String, textCol: String,
                     n: Int, minRun: Long,
                     candidates: DataFrame): DataFrame = {
    val cand = candidates
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
    val ids = cand.select(col("id_a").as("sid"))
      .unionByName(cand.select(col("id_b").as("sid"))).distinct()
    val psh = positionalShingles(df, idCol, textCol, n)
      .join(ids, Seq("sid"), "left_semi")
    val hits = cand
      .join(psh.as("a"), col("id_a") === col("a.sid"))
      .join(psh.as("b"),
        col("id_b") === col("b.sid") && col("a.h") === col("b.h"))
      .select(col("id_a"), col("id_b"), col("a.pos").as("pa"),
        (col("a.pos") - col("b.pos")).as("diag"))
    spansFromHits(hits, n, minRun)
  }

  /** Positional shingle postings (sid, pos, h): [[docShingles]] plus
    * the 0-based shingle offset — the span locators' shared scan. */
  private def positionalShingles(df: DataFrame, idCol: String,
                                 textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"), split(col(textCol), " ").as("__tk"))
      .select(col("sid"),
        posexplode(transform(shinglesOfTokens(col("__tk"), n),
          s => hash60(s))))
      .select(col("sid"), col("pos").cast("long").as("pos"),
        col("col").as("h"))

  /** The diagonal-island reduction shared by both span locators:
    * matching-position hits (id_a, id_b, pa, diag = pa − pb) →
    * longest contiguous run per pair (islands of consecutive `pa` per
    * diagonal via the pa − row_number trick, then one best-run window
    * with the deterministic tie-break). */
  private def spansFromHits(hits: DataFrame, n: Int,
                            minRun: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRun = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    val islands = hits
      .withColumn("grp", col("pa") - row_number().over(wRun))
      .groupBy("id_a", "id_b", "diag", "grp")
      .agg(count(lit(1)).as("run_len"), min("pa").as("start_a"))
    val wBest = Window.partitionBy("id_a", "id_b")
      .orderBy(col("run_len").desc, col("start_a").asc, col("diag").asc)
    islands
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1 && col("run_len") >= minRun)
      .select(col("id_a"), col("id_b"), col("run_len").as("run_shingles"),
        (col("run_len") + (n - 1)).as("span_tokens"),
        col("start_a"), (col("start_a") - col("diag")).as("start_b"))
  }

  /** All-pairs n-gram Jaccard similarity ≥ `threshold`, via grouped
    * postings lists. Output: (id_a, id_b, jaccard), id_a < id_b.
    *
    * `maxDocFreq` is the scale guard: shingles occurring in more than that
    * many documents (boilerplate headers, license blurbs) are dropped from
    * the *universe* — both the pair generation and the per-doc sizes — so
    * jaccard is computed consistently over discriminative shingles only.
    * Without it one hot shingle emits postings² candidate pairs in a
    * single task; with it per-shingle work is ≤ cap². The guard is ON by
    * default (10k: a single shingle can cost at most ~50M pairs and a
    * 10k-element buffer — survivable on any executor; a boilerplate
    * shingle in millions of documents would otherwise be a task-killer),
    * because "exact Jaccard over everything" is exactly the call that
    * must not be the API's path of least resistance at corpus scale.
    * Pass `Long.MaxValue` explicitly to disable the cap for a corpus
    * known to be boilerplate-free. Total pair-count cost tracks
    * Σ postings² per surviving shingle — inherent to exact Jaccard;
    * [[minHashCandidates]] is the sub-quadratic alternative.
    *
    * `eager = false` (default): the result is the lazy, uncached plan —
    * composable with further filters/sampling like any DataFrame, and
    * the two postings consumers share their shuffle via ReuseExchange.
    * `eager = true`: the result is materialized to the DRIVER on call
    * and the operator's internal cache is released before returning —
    * repeated per-shard invocations leave ZERO executor residue (no
    * cache, no checkpoint blocks). Use it for loop-style call sites
    * whose outputs are small (pairs above a similarity threshold are
    * tiny by construction) and where session residue, not plan
    * composition, is the concern — the bench queries do. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double,
                   maxDocFreq: Long = 10_000L,
                   eager: Boolean = false): DataFrame = {
    val (grouped, sizes, inter) =
      shingleIntersections(df, idCol, textCol, n, maxDocFreq, eager)
    val out = inter
      .join(sizes.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    if (eager) selfClean(out, grouped) else out
  }

  /** Directed n-gram containment ≥ `threshold`: rows (sub_id, super_id,
    * containment) where containment = |sh(sub) ∩ sh(super)| / |sh(sub)|
    * (Broder's resemblance/containment split). This is the near-dup
    * detector for SUBSET relationships that Jaccard structurally
    * misses: a paragraph embedded verbatim in a 100× longer page has
    * containment 1.0 but Jaccard ≈ 0.01 — below any usable Jaccard
    * threshold — and quote-chains / boilerplate-wrapped reposts are
    * exactly that shape in a web corpus. Candidate generation, the cap
    * discipline, and the cost bound are identical to [[jaccardPairs]]
    * (shared [[shingleIntersections]] core); only the final scoring
    * divides by ONE side's set size, emitting each unordered candidate
    * pair in both directions before the threshold filter. Self-pairs
    * are excluded by construction (the pair generator enumerates
    * distinct ids). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double,
                       maxDocFreq: Long = 10_000L,
                       eager: Boolean = false): DataFrame = {
    val (grouped, sizes, inter) =
      shingleIntersections(df, idCol, textCol, n, maxDocFreq, eager)
    val directed = inter
      .select(col("id_a").as("sub_id"), col("id_b").as("super_id"),
        col("n_common"))
      .unionByName(inter.select(col("id_b").as("sub_id"),
        col("id_a").as("super_id"), col("n_common")))
    val out = directed
      .join(sizes.withColumnRenamed("sid", "sub_id")
        .withColumnRenamed("n_sh", "n_sub"), "sub_id")
      .select(col("sub_id"), col("super_id"),
        (col("n_common").cast("double") / col("n_sub").cast("double"))
          .as("containment"))
      .filter(col("containment") >= threshold)
    if (eager) selfClean(out, grouped) else out
  }

  /** Shared exact-intersection core of [[jaccardPairs]] and
    * [[containmentPairs]]: (capped postings universe, per-doc
    * shingle-set sizes, unordered candidate-pair intersection counts).
    * In eager mode the returned postings frame is CACHED and must be
    * released by the caller (via [[selfClean]]) after consuming the
    * result. */
  private def shingleIntersections(df: DataFrame, idCol: String,
      textCol: String, n: Int, maxDocFreq: Long, eager: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    // ONE wide shuffle builds the postings universe: group raw shingle
    // rows by h, the set agg absorbing per-(sid,h) duplicates that an
    // explicit distinct would have paid a second full shuffle for. The
    // df cap (and the df>=2 can-ever-pair filter below) become free
    // size(ids) predicates instead of a frequency join — measured at
    // sf0.1 this replaced distinct + freq-join + self-join (three wide
    // exchanges plus their sorts) with this single aggregation. With a
    // finite cap the set agg itself is CAPPED at cap+1 elements per key
    // ([[graft.plans.CollectSetSortedCapped]]), so a boilerplate shingle
    // in millions of documents can never build a multi-million-element
    // aggregation buffer — ≤cap groups are exact, >cap groups stop
    // accumulating the moment they are provably over the cap.
    val postings =
      if (maxDocFreq < Int.MaxValue)
        graft.plans.CollectSetSortedCapped(col("sid"), maxDocFreq.toInt + 1)
      else sort_array(collect_set("sid"))
    val grouped0 = docShingles(df, idCol, textCol, n)
      .groupBy("h").agg(postings.as("ids"))
      .filter(size(col("ids")) <= maxDocFreq)
      .select("ids")
    // two consumers (sizes and pair generation); lazy mode leaves the
    // plan uncached — Catalyst's ReuseExchange still shares the shuffle
    val grouped = if (eager) grouped0.cache() else grouped0
    val sizes = grouped.select(explode(col("ids")).as("sid"))
      .groupBy("sid").agg(count(lit(1)).as("n_sh"))
    // candidate pairs are generated MAP-SIDE from each posting array
    // (ids are sorted+distinct, so i<j enumerates exactly the id_a<id_b
    // pairs); per-shingle work is bounded by maxDocFreq² — the cap is
    // the scale guard that keeps one boilerplate shingle from emitting
    // postings² rows in a single task. Two STREAMING Generates (posexplode
    // then explode of the tail slice) instead of one nested
    // flatten(transform(transform(struct))): the nested form materialized
    // the full ≤cap²/2 struct array per hot shingle inside one row — a
    // per-row allocation spike that at bench scale was measured as pure
    // task-side GC (the generated rows are identical either way).
    val inter = grouped.filter(size(col("ids")) >= 2)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + 2,
          size(col("ids")) - col("i") - 1)).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"))
    (grouped, sizes, inter)
  }

  /** Eagerly materialize an operator's (small) output on the DRIVER, then
    * drop the operator's internal cache before returning — the operator
    * cleans up after itself instead of documenting a "caller must
    * clearCache()" footgun. Near-dup outputs are tiny by construction
    * (pairs above a similarity threshold), so the collect is KBs and the
    * returned frame is a LocalRelation: unlike the localCheckpoint form
    * this replaces, it leaves NO block-manager blocks behind at all (the
    * checkpoint's own blocks were invisible to clearCache and lived until
    * a driver GC), and it cannot be lost to executor failure. The caches
    * it releases are the full shingle/signature universes, whose
    * accumulation was measured to slow a second same-session invocation
    * 2.5× through block-manager pressure and task-side GC. Callers with
    * outputs too large to collect use the operators' `eager = false`
    * path, which never calls this. */
  private def selfClean(out: DataFrame, caches: DataFrame*): DataFrame = {
    val spark = out.sparkSession
    val schema = out.schema
    val rows = out.collect()
    caches.foreach(_.unpersist(blocking = false))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** MinHash signatures, wide form: ONE row per document with a
    * `numPerm`-element array column `sig`,
    * sig(p) = min over shingles of ((2p+1)·(h mod P) + 7919p + 13) mod P.
    * One md5 per shingle row (inside [[docShingles]]); the per-perm hashes
    * are integer multiply-adds, all `numPerm` mins run in a single
    * codegen'd HashAggregate, and the shuffle carries only (doc, numPerm
    * longs) — the constant-size-per-document property that makes near-dup
    * detection sub-quadratic at corpus scale. Duplicate (sid, h) rows in
    * the input are harmless — min is duplicate-insensitive — which is
    * what lets [[docShingles]] skip its own distinct shuffle. */
  def minHashSignatures(docSh: DataFrame, numPerm: Int): DataFrame = {
    val hP = pmod(col("h"), lit(MinHashP))
    val mins = (0 until numPerm).map(p =>
      min((lit(2L * p + 1L) * hP + lit(7919L * p + 13L)) % MinHashP)
        .as(s"__s$p"))
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
          col("sig").getItem(b * rowsPerBand + j).cast("string")): _*))
    }
    sigs.select(col("sid"), posexplode(array(bandKeys: _*))
      .as(Seq("band", "band_key")))
  }

  /** Candidate near-dup pairs from banded MinHash, with the signature-
    * estimated Jaccard (fraction of agreeing permutations, compared
    * directly between the two signature arrays — no joins back into the
    * signature table). Output: (id_a, id_b, est_jaccard), id_a < id_b.
    *
    * Eager/lazy contract as in [[jaccardPairs]]: the default is the
    * lazy, uncached plan (composable, normal DataFrame semantics);
    * `eager = true` materializes the candidate list to the driver on
    * call and releases the signature cache (three consumers: bands,
    * both sides of the estimate join) before returning — for loop-style
    * call sites where session residue is the concern. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numPerm: Int, rowsPerBand: Int,
                        eager: Boolean = false): DataFrame = {
    val sigs0 = minHashSignatures(docShingles(df, idCol, textCol, n), numPerm)
    val sigs = if (eager) sigs0.cache() else sigs0
    val bands = lshBands(sigs, numPerm, rowsPerBand)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .distinct()
    val out = cand
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
    if (eager) selfClean(out, sigs) else out
  }

  /** Connected components over an undirected pair list by iterative
    * min-label propagation: every node's label converges to the smallest
    * id in its component. The standard way to turn near-dup PAIRS into
    * dedup CLUSTERS (keep one representative per component).
    *
    * Scale shape: each iteration is one join + one aggregation, both
    * shuffling only (id, label) pairs — never documents. Iterations
    * needed = component diameter; near-dup clusters are tiny and dense
    * (diameter ≤ ~3), so the loop converges in a handful of rounds.
    * (A graph with long chains would want pointer-jumping/GraphX; that
    * is not the near-dup shape.) Convergence is detected by counting
    * changed labels — one extra cheap job per round.
    *
    * Output: (id, cluster_rep = min id of the component). */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // Iterative-loop resource discipline (the part that matters as much
    // as the algorithm):
    //   - localCheckpoint (eager) per round rather than cache: the loop
    //     otherwise grows its logical plan by one join per round, and
    //     re-analysis/planning of the deepening tree quickly dominates
    //     the label propagation;
    //   - the PREVIOUS round's checkpoint blocks are unpersisted
    //     explicitly the moment the new round is materialized (see
    //     [[unpersistCheckpoint]]);
    //   - frames coalesce to one partition per ~2M rows (counted once —
    //     labels never grow): near-dup label/pair frames are tiny, and
    //     a round over 32-partition frames schedules 32× the tasks the
    //     data needs. At real corpus scale the same formula keeps
    //     thousands of partitions.
    def partsFor(n: Long): Int =
      math.min(math.max(1L, n / 2000000L), 10000L).toInt
    // checkpoint, count (cheap: reads the fresh blocks), re-checkpoint
    // compacted when the natural partitioning is wider than the data
    def compact(df: DataFrame): (DataFrame, Long) = {
      val cp0 = df.localCheckpoint(true)
      val n = cp0.count()
      val parts = partsFor(n)
      if (parts < cp0.rdd.getNumPartitions) {
        val cp = cp0.coalesce(parts).localCheckpoint(true)
        unpersistCheckpoint(cp0)
        (cp, n)
      } else (cp0, n)
    }
    val (sym, _) = compact(
      pairs.select(col(aCol).as("a"), col(bCol).as("b"))
        .unionByName(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
        .distinct())
    val (labels0, nNodes) = compact(
      nodes.select(col(idCol).as("id"))
        .withColumn("cluster_rep", col("id")))
    var labels = labels0
    val parts = partsFor(nNodes)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("cluster_rep").cast(
        org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d // empty node set
    }
    // labels only ever decrease, so the label sum is strictly monotone:
    // an unchanged sum == a fixpoint — one cheap aggregate per round
    // instead of a change-detection join
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "__nid"),
          col("b") === col("__nid"))
        .groupBy(col("a")).agg(min("cluster_rep").as("__nmin"))
      val next = labels
        .join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"),
          least(col("cluster_rep"),
            coalesce(col("__nmin"), col("cluster_rep"))).as("cluster_rep"))
        .coalesce(parts)
        .localCheckpoint(true)
      unpersistCheckpoint(labels)
      labels = next
      val newSum = labelSum(labels)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    unpersistCheckpoint(sym)
    if (!converged)
      // a silent iteration-cap exit would hand downstream dedup WRONG
      // cluster representatives — components wider than maxIter rounds
      // need a higher cap (or pointer-jumping/GraphX, not this shape)
      System.err.println(s"[connectedComponents] NOT CONVERGED after " +
        s"$maxIter rounds — labels are still moving; results are not a " +
        s"fixpoint. Raise maxIter for graphs with diameter > $maxIter.")
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * contraction (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
    * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    * round-count answer [[connectedComponents]]'s scaladoc points at
    * for high-diameter graphs: label propagation needs diameter-many
    * rounds (a 10⁶-node chain = 10⁶ rounds — unrunnable), star
    * contraction converges in O(log²) rounds regardless of diameter
    * because each round rewires nodes directly toward their component
    * minimum rather than leaking the label one hop.
    *
    *   - large-star (on the symmetrized edge list, grouped by u):
    *     m = min(Γ(u) ∪ {u}); REPLACE the edge set with
    *     {(v, m) : v ∈ Γ(u), v > u};
    *   - small-star (on max→min canonical edges, grouped by u):
    *     m = min(Γ(u)); replace with
    *     {(v, m) : v ∈ Γ(u), v ≠ m} ∪ {(u, m)}.
    *
    * Both steps preserve connectivity; the fixpoint is a forest of
    * stars centered on each component's minimum node. Convergence is
    * detected by an edge-set signature (count + decimal sum of
    * per-edge xxhash64 — one cheap aggregate per round, the
    * [[connectedComponents]] label-sum trick generalized to sets).
    * Per-round cost: two grouped aggregations + joins over the edge
    * list, shuffling only (long, long) pairs; the same
    * localCheckpoint/unpersist/coalesce loop discipline as the
    * propagation form. Returns (id, cluster_rep) — drop-in equal to
    * [[connectedComponents]] where both converge. */
  def connectedComponentsStar(nodes: DataFrame, idCol: String,
                              pairs: DataFrame, aCol: String,
                              bCol: String,
                              maxIter: Int = 30): DataFrame = {
    def partsFor(n: Long): Int =
      math.min(math.max(1L, n / 2000000L), 10000L).toInt
    def compact(df: DataFrame): (DataFrame, Long) = {
      val cp0 = df.localCheckpoint(true)
      val n = cp0.count()
      val parts = partsFor(n)
      if (parts < cp0.rdd.getNumPartitions) {
        val cp = cp0.coalesce(parts).localCheckpoint(true)
        unpersistCheckpoint(cp0)
        (cp, n)
      } else (cp0, n)
    }
    // canonical storage: (a, b) with a > b, no self-loops
    def canon(df: DataFrame): DataFrame = df
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    var (edges, nEdges) = compact(canon(
      pairs.select(col(aCol).as("a"), col(bCol).as("b"))))
    val labelsOf = (e: DataFrame) => nodes
      .select(col(idCol).as("id"))
      .join(e.groupBy(col("a").as("id")).agg(min("b").as("__rep")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__rep"), col("id")).as("cluster_rep"))
    if (nEdges == 0) return labelsOf(edges)
    var (prevN, prevSum) = sig(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized neighborhoods
      val sym = edges.select(col("a"), col("b"))
        .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      val mLarge = sym.groupBy("a").agg(min("b").as("__mn"))
        .select(col("a").as("__u"),
          least(col("a"), col("__mn")).as("__m"))
      val large = sym.join(mLarge, col("a") === col("__u"))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("__m").as("b"))
      // small-star over the large output — ALREADY canonical (each
      // emitted edge is (v, m) with v > u ≥ m), so no mid-round
      // greatest/least/distinct pass: duplicate emissions only inflate
      // the tiny per-round frames and die in the final canon
      val c = large
      val mSmall = c.groupBy("a").agg(min("b").as("__m"))
      val small = c.join(mSmall, Seq("a"))
        .filter(col("b") =!= col("__m"))
        .select(col("b").as("a"), col("__m").as("b"))
        .unionByName(mSmall.select(col("a"), col("__m").as("b")))
      // ONE checkpoint and ONE aggregate per round: contraction never
      // grows the edge count, so the previous round's count is a safe
      // upper bound for the coalesce width, and the convergence
      // signature (count + hash sum) doubles as the size read
      val next = canon(small).coalesce(partsFor(prevN))
        .localCheckpoint(true)
      unpersistCheckpoint(edges)
      edges = next
      val (n, s) = sig(edges)
      converged = n == prevN && s.compareTo(prevSum) == 0
      prevN = n; prevSum = s
      iter += 1
    }
    if (!converged)
      System.err.println(s"[connectedComponentsStar] NOT CONVERGED " +
        s"after $maxIter alternating rounds — edge set still moving; " +
        s"results are not a fixpoint. O(log²|V|) rounds suffice; " +
        s"raise maxIter.")
    else
      System.err.println(s"[connectedComponentsStar] converged after " +
        s"$iter rounds (|E| $nEdges → $prevN)")
    labelsOf(edges)
  }

  /** All pairs within Hamming distance `maxDist` over a 64-bit
    * fingerprint column (SimHash, image dHash, audio energy contour),
    * WITHOUT the all-pairs compare: split the 64 bits into `bands`
    * contiguous chunks with `bands > maxDist` — by pigeonhole, two
    * fingerprints within `maxDist` agree EXACTLY on at least one chunk
    * (≤ maxDist chunks can differ) — so candidates are an equi-join on
    * (chunk index, chunk value) and the exact `bit_count(a ^ b)`
    * verification runs per candidate. Recall is 1.0 by construction
    * (unlike probabilistic MinHash banding); the cost trade is chunk
    * width: more bands → guaranteed recall at higher maxDist but
    * shorter chunks → more accidental bucket collisions (expected
    * Σ_buckets n² / 2^width). Default 8 bands of 8 bits covers
    * maxDist ≤ 7 with 1/256 random-collision rate per band.
    *
    * Scale shape: the exchange carries (id, fp, chunk) rows — bands·|D|
    * longs, never documents; candidate pairs are generated AND verified
    * inside the join stage (bit_count is codegen'd), so only true
    * near-pairs reach the final dedup exchange. Per-bucket candidate
    * cost is Σ n² — with fixed chunk width the mean bucket occupancy
    * grows as |D|/2^width, so the guaranteed-recall envelope of a
    * 64-bit fingerprint ends around |D| ≈ 10⁶-10⁷: beyond that, use a
    * wider fingerprint (128/256 bits → more chunks of the same width,
    * same pigeonhole) or accept MinHash-style probabilistic recall.
    * Degenerate fingerprints (all-zero band from blank media) make hot
    * buckets — cap or drop them the [[jaccardPairs]] maxDocFreq way;
    * callers with blank-heavy corpora should filter those upstream.
    * Output: (id_a, id_b, hamming), id_a < id_b, each pair once. */
  def hammingNearPairs(df: DataFrame, idCol: String, fpCol: String,
                       maxDist: Int, bands: Int = 8): DataFrame = {
    require(bands > maxDist,
      s"pigeonhole needs bands ($bands) > maxDist ($maxDist)")
    require(bands >= 2 && bands <= 64, "bands must be in [2, 64]")
    val width = 64 / bands
    val chunks = (0 until bands).map { i =>
      val lo = i * width
      val w = if (i == bands - 1) 64 - lo else width
      struct(lit(i).as("bi"),
        (shiftrightunsigned(col(fpCol), lo)
          .bitwiseAND(lit((1L << w) - 1))).as("bv"))
    }
    val banded = df
      .select(col(idCol).as("hid"), col(fpCol).as("hfp"),
        explode(array(chunks: _*)).as("b"))
      .select(col("hid"), col("hfp"), col("b.bi").as("bi"),
        col("b.bv").as("bv"))
    val left = banded
    val right = banded.select(col("bi"), col("bv"),
      col("hid").as("hid_b"), col("hfp").as("hfp_b"))
    // verify BEFORE distinct: the bit_count filter is codegen'd and
    // consumes candidate pairs inside the join's own stage, so the
    // Σ-bucket-n² candidate stream never reaches an exchange — only
    // true near-pairs (duplicated once per agreeing chunk) flow into
    // the dedup. With distinct-first, the full candidate volume
    // shuffles (measured 21× at 10× data on the q169 fixture; this
    // order restores ~linear growth until buckets saturate).
    left.join(right, Seq("bi", "bv"))
      .filter(col("hid") < col("hid_b"))
      .select(col("hid").as("id_a"), col("hid_b").as("id_b"),
        bit_count(col("hfp").bitwiseXOR(col("hfp_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct() // pairs agreeing on several chunks meet several times
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
