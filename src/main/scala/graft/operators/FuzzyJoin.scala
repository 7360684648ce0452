package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution) without the cross join.
  *
  * The naive best-edit-distance match is |L|·|R| Levenshtein
  * evaluations — the scale-killer. This implements the standard
  * prefix-filtering decomposition (Chaudhuri, Ganti & Kaushik, ICDE
  * 2006): order the vocabulary by document frequency ascending; a pair
  * whose token sets overlap in ≥ |set| − (k−1) tokens is guaranteed to
  * share a token within the k RAREST tokens of each side, so the
  * candidate generation is an equi-join on those prefix tokens and the
  * exact Levenshtein verification runs only on candidates. `prefixLen`
  * (k) trades recall for candidate count: k=2 covers records that
  * differ by one dropped/corrupted word — the typical dirty-entity
  * case — including corruptions OUTSIDE the reference vocabulary
  * (an unseen token ranks rarest at df 0, contributes no candidates,
  * and the record's other prefix token still surfaces the true pair).
  *
  * Scale shape: the document-frequency table is vocabulary-sized and
  * BROADCASTS into both tokenizations; per-record prefix selection
  * compiles to WindowGroupLimit (map-side top-k before its exchange);
  * candidates shuffle only (token, id) pairs; the expensive Levenshtein
  * runs once per CANDIDATE — Σ over prefix tokens of df(token)·k/|set|
  * pairs instead of |L|·|R|. Rarity ranking comes from the RIGHT
  * (reference) side — the shared-vocabulary assumption every
  * filter-and-verify join makes. */
object FuzzyJoin {

  /** Best right-side match per left row: (lid, rid, dist) with dist =
    * levenshtein(left string, right string), ties broken by rid
    * ascending. Left rows none of whose prefix tokens appear in any
    * right prefix are absent from the output (no candidates).
    *
    * Recall limit under MULTIPLE corruptions: the k=`prefixLen` prefix
    * covers one corrupted/dropped word. A left record whose k rarest
    * tokens are ALL out-of-vocabulary (e.g. two typos in a two-word
    * name) generates no candidates — its df-0 tokens join nothing —
    * and the row is silently ABSENT from the output rather than
    * matched at low confidence. Entity resolution over dirtier data
    * should (a) raise `prefixLen` so a clean token survives into the
    * prefix (cost grows with Σ df(token) per extra slot), and (b)
    * anti-join the output against `left` to surface the unmatched
    * remainder for a fallback pass (q93 resolves against a deduped
    * canonical catalog for the same reason). */
  def bestEditMatch(left: DataFrame, leftId: String, leftStr: String,
                    right: DataFrame, rightId: String, rightStr: String,
                    prefixLen: Int = 2): DataFrame = {
    val l = left.select(col(leftId).as("lid"), col(leftStr).as("lname"))
    val r = right.select(col(rightId).as("rid"), col(rightStr).as("rname"))
    def toks(d: DataFrame, id: String, str: String) =
      d.select(col(id), explode(split(col(str), " ")).as("tok")).distinct()
    val rtok = toks(r, "rid", "rname")
    val dfreq = rtok.groupBy("tok").agg(count(lit(1)).as("df"))
    def prefix(tok: DataFrame, id: String) =
      tok.join(broadcast(dfreq), Seq("tok"), "left")
        .withColumn("rk", row_number().over(
          Window.partitionBy(id)
            .orderBy(coalesce(col("df"), lit(0L)).asc, col("tok").asc)))
        .filter(col("rk") <= prefixLen).select("tok", id)
    val cand = prefix(toks(l, "lid", "lname"), "lid")
      .join(prefix(rtok, "rid"), "tok")
      .select("lid", "rid").distinct()
    cand.join(l, "lid").join(r, "rid")
      .select(col("lid"), col("rid"),
        levenshtein(col("lname"), col("rname")).as("dist"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lid").orderBy(col("dist").asc, col("rid").asc)))
      .filter(col("rk") === 1).drop("rk")
  }
}
