package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph motif analytics over edge-list DataFrames — the corpus/link
  * graph measurements (connectivity priors, community density) a
  * training-data pipeline derives next to [[Dedup.connectedComponents]]
  * and the PageRank prior. */
object Graphs {

  /** Exact triangle census of an undirected simple graph: ONE row
    * (n_vertices, n_edges, n_wedges, n_triangles, transitivity) with
    * transitivity = 3·triangles / wedges (the global clustering
    * coefficient), 0.0 for a wedge-free graph.
    *
    * Input: distinct (u, v) edge rows with u < v (simple, no loops).
    *
    * Algorithm: the degree-ordered wedge join (Schank & Wagner 2005;
    * Suri & Vassilvitskii's MapReduce form, WWW 2011). Each edge is
    * oriented from its (degree, id)-smaller endpoint to the larger —
    * a total acyclic order — so every triangle has exactly ONE apex
    * with two out-edges and is counted once, and out-degrees are
    * O(√m)-bounded, which caps the wedge fan-out at Σ outdeg² ≪
    * Σ deg² — the "curse of the last reducer" fix: a celebrity node
    * of degree d contributes d² wedges naively but only √m² = m
    * after orientation, spread across its neighbors' tasks.
    *
    * Scale shape: the degree table is |V|-sized and joins into the
    * orientation pass — broadcast-HINTED only while |V| ≤
    * `broadcastDegreeMaxRows` (the hint overrides
    * autoBroadcastJoinThreshold, so an unconditional hint would
    * collect a multi-GB table onto the driver for a web-scale graph);
    * above the cutoff the join is left unhinted and the planner/AQE
    * pick a shuffled join keyed on the vertex id, which is the right
    * plan there. |V| is read off the persisted degree table with one
    * count — a value the final aggregate needs anyway. The wedge join
    * shuffles oriented (src, dst) pairs by src; the closing-edge join
    * is an equi-join on the (x, y) pair — the planner broadcasts the
    * edge side when it fits (the wedge side is the big one by
    * construction, never broadcast it). The input feeds five passes
    * (degrees, orientation, both wedge sides, the closing join), so
    * `edges` and the degree table are cached for the computation and
    * released before returning — the one-row result comes back as a
    * LocalRelation, leaving no executor-side residue (the q26/q63
    * self-clean contract).
    *
    * @param broadcastDegreeMaxRows largest |V| for which the degree
    *   table is broadcast-hinted into the orientation join. The
    *   default (4M rows of two longs ≈ tens of MB serialized) keeps
    *   the driver safe by orders of magnitude; raise it only with a
    *   driver sized for the collect. */
  def triangleStats(edges: DataFrame,
      broadcastDegreeMaxRows: Long = 4_000_000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("u"), col("v")).persist()
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d")).persist()
    // materializes the cached degree table; doubles as the broadcast guard
    val nVertices = deg.count()
    val o = orientEdges(e, deg, hintBroadcast = nVertices <= broadcastDegreeMaxRows)
      .persist() // feeds both wedge sides and the closing join
    val wedges = o.select(col("src"), col("dst").as("x"), col("dd").as("dx"))
      .join(o.select(col("src"), col("dst").as("y"), col("dd").as("dy")),
        Seq("src"))
      // keep each unordered out-pair once, (x, y) in orientation order:
      // the closing edge, if present, is oriented x → y
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x"), col("y"))
    val tri = wedges
      .join(o.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
    // vertex count, wedge count AND edge count all come from the degree
    // table in one aggregate: Σd = 2m exactly (handshake lemma) — no
    // second pass over the edges
    val result = deg
      .agg(count(lit(1)).as("n_vertices"),
        // coalesce: sum over an empty degree table is NULL, but the
        // contract is non-null longs even for an edgeless graph
        coalesce(expr("sum(d) div 2"), lit(0L)).as("n_edges"),
        coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
      .crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          (lit(3) * col("n_triangles")).cast("double") /
            col("n_wedges").cast("double"))
          .otherwise(lit(0.0)).as("transitivity"))
    val rows = result.collect()
    Seq(e, deg, o).foreach(_.unpersist(blocking = false))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
  }

  /** Orientation pass: joins the degree table onto both endpoints and
    * emits each edge as (src, dst, dd) directed from the (degree, id)-
    * smaller endpoint, with dd = the destination's degree (the wedge
    * tie-break key). `hintBroadcast` gates the explicit broadcast hint
    * on the |V|-sized degree side — see [[triangleStats]]'s scale
    * note; package-private so the spec can pin the guarded plan. */
  private[graft] def orientEdges(e: DataFrame, deg: DataFrame,
      hintBroadcast: Boolean): DataFrame = {
    def hinted(df: DataFrame): DataFrame =
      if (hintBroadcast) broadcast(df) else df
    e
      .join(hinted(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(hinted(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst"),
            col("dv").as("dd")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"),
            col("du").as("dd"))).as("oe"))
      .select(col("oe.src").as("src"), col("oe.dst").as("dst"),
        col("oe.dd").as("dd"))
  }

  /** Multi-source BFS: minimum hop distance from ANY source to every
    * node reachable within `maxHops`, as (node, dist BIGINT) rows —
    * the reachability/radius measurement next to
    * [[Dedup.connectedComponents]] (which answers *whether* connected;
    * this answers *how far*). Single-source shortest path is the
    * one-row-source special case.
    *
    * Input: directed (src, dst) edge rows (feed both orientations for
    * an undirected graph) and a (node) frame of sources.
    *
    * Algorithm: level-synchronous frontier expansion — the textbook
    * distributed BFS (Pregel's canonical example; Malewicz et al.,
    * SIGMOD 2010). Round h joins the CURRENT FRONTIER ONLY against the
    * edge list and anti-joins the visited set, so each round's shuffle
    * carries |frontier ∪ neighbors| (node, dist) longs — never the
    * full vertex set, never paths. Every vertex enters the frontier at
    * most once (the anti-join), so total work across rounds is
    * O(|E| + |V|) regardless of `maxHops`, unlike the recursive-CTE
    * form whose working table re-derives (node, dist) pairs per level
    * — that asymmetry is why the oracle caps at small depth while this
    * scales to graph diameter.
    *
    * Loop discipline = the [[Dedup.connectedComponents]] /
    * q87-PageRank contract: each round's frontier and visited set are
    * EAGERLY localCheckpointed (truncating lineage so round k does not
    * re-plan rounds 1..k-1) and the previous round's blocks dropped;
    * the early exit on an empty frontier costs one count per round —
    * frontier-sized, the value the loop needs anyway. The edge list is
    * cached for the loop and released before returning. The result is
    * the FINAL checkpoint, returned distributed (|V|-sized — never
    * collected to the driver); after materializing, the caller
    * releases its blocks via [[Dedup.unpersistCheckpoint]] — the
    * [[Dedup.connectedComponents]] return contract. */
  /** Bounded-hop weighted shortest paths (distributed Bellman-Ford):
    * minimum path cost from any source to every node reachable within
    * `maxHops` edges, as (node, cost BIGINT) rows — the weighted tier
    * above [[multiSourceBfs]] (which counts hops; this sums edge
    * weights). Semantics are EXACTLY "min cost over paths of ≤ maxHops
    * edges": a fixed number of relaxation rounds, each one
    * join-then-min-aggregate — dist_k(v) = min(dist_{k-1}(v),
    * min_u dist_{k-1}(u) + w(u,v)). Negative weights are fine (no
    * negative-cycle divergence: rounds are capped), which is what
    * separates Bellman-Ford from a Dijkstra frontier.
    *
    * Per round the shuffle carries |dist ⋈ edges| (node, long) pairs
    * reduced by a map-side partial min — never paths, never the
    * DP table × levels the naive unrolled form materializes. Loop
    * discipline = the [[multiSourceBfs]] / q87 contract: eager
    * localCheckpoint per round, previous round's blocks dropped, edge
    * list cached for the loop and released; the result is the final
    * checkpoint, released by the caller via
    * [[Dedup.unpersistCheckpoint]].
    *
    * Input: directed (src, dst, w) edges (feed both orientations for
    * undirected), (node) sources. */
  def boundedSssp(edges: DataFrame, sources: DataFrame,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src"), col("dst"), col("w")).persist()
    try {
      e.count() // materialize before the loop reuses it
      var dist = sources.select(col("node")).distinct()
        .withColumn("cost", lit(0L))
        .localCheckpoint(true)
      var prev: Option[DataFrame] = None
      var h = 0
      while (h < maxHops) {
        h += 1
        val relaxed = dist.join(e, col("node") === col("src"))
          .select(col("dst").as("node"),
            (col("cost") + col("w")).cast("long").as("cost"))
          .unionByName(dist)
          .groupBy("node").agg(min("cost").as("cost"))
          .localCheckpoint(true)
        prev.foreach(Dedup.unpersistCheckpoint)
        prev = Some(dist)
        dist = relaxed
      }
      prev.foreach(Dedup.unpersistCheckpoint)
      dist
    } finally e.unpersist(blocking = false)
  }

  /** k-core peeling: repeatedly delete nodes of degree < k (degrees
    * measured in the CURRENT induced subgraph) for up to `rounds`
    * rounds, and return (node, degree) over the surviving edges — the
    * standard dense-substructure / spam-cluster primitive one tier
    * below [[triangleStats]]. Fixed-round semantics ("the graph after
    * `rounds` peels") make the operator oracle-unrollable; peeling
    * short-circuits as soon as a round deletes nothing, and a stable
    * round is a fixpoint (further peels are no-ops), so early-stop
    * output ≡ the fixed-round answer — callers that want the true
    * k-core pass `rounds` ≥ the peel depth (bounded by |V|, in
    * practice tiny: each round must delete ≥ 1 node to continue).
    *
    * Per round: one degree aggregation (map-side partial count over
    * 2|E| (node) rows) + two semi-joins of the edge list against the
    * ≥k survivor set — shuffles carry (long, long) edges and (long)
    * nodes only. Loop discipline = [[boundedSssp]]'s: eager
    * localCheckpoint per round, previous round's blocks dropped.
    * Input: undirected simple edges (u, v), u < v, deduplicated. */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(col("u"), col("v")).localCheckpoint(true)
    var prev: Option[DataFrame] = None
    var r = 0
    var nEdges = e.count()
    var stable = false
    while (r < rounds && !stable && nEdges > 0) {
      r += 1
      val deg = e.select(col("u").as("n"))
        .unionByName(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val e2 = e
        .join(keep.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("n").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(true)
      val n2 = e2.count()
      stable = n2 == nEdges
      nEdges = n2
      prev.foreach(Dedup.unpersistCheckpoint)
      prev = Some(e)
      e = e2
    }
    val out = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    prev.foreach(Dedup.unpersistCheckpoint)
    out
  }

  def multiSourceBfs(edges: DataFrame, sources: DataFrame,
                     maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).persist()
    try {
      var visited = sources.select(col("node")).distinct()
        .withColumn("dist", lit(0L))
        .localCheckpoint(true)
      var frontier = visited
      var prevVisited: Option[DataFrame] = None
      var prevFrontier: Option[DataFrame] = None
      var h = 0L
      var frontierSize = frontier.count()
      while (h < maxHops && frontierSize > 0) {
        h += 1
        val next = frontier
          .join(e, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(h))
          .localCheckpoint(true)
        val nextVisited = visited.unionByName(next).localCheckpoint(true)
        prevFrontier.foreach(Dedup.unpersistCheckpoint)
        prevVisited.foreach(Dedup.unpersistCheckpoint)
        prevFrontier = Some(frontier)
        prevVisited = Some(visited)
        frontier = next
        visited = nextVisited
        frontierSize = frontier.count()
      }
      // superseded rounds' blocks are dropped; the RESULT stays
      // distributed (|V|-sized — never collected) as the final
      // checkpoint, the [[Dedup.connectedComponents]] return contract:
      // the caller materializes/aggregates it, then
      // [[Dedup.unpersistCheckpoint]] releases the last blocks
      prevFrontier.foreach(Dedup.unpersistCheckpoint)
      prevVisited.foreach(Dedup.unpersistCheckpoint)
      if (frontier ne visited) Dedup.unpersistCheckpoint(frontier)
      visited
    } finally e.unpersist(blocking = false)
  }
}
