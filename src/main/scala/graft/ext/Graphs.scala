package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the link-structure
  * signals a web-scale curation pipeline derives per host/page before
  * quality filtering (Common Crawl pipelines rank hosts by PageRank and
  * drop bottom-percentile link-spam neighborhoods; component and
  * triangle structure flag mirror farms and boilerplate rings).
  *
  * Every algorithm here is expressed as a FIXED number of DataFrame
  * join+aggregate rounds — no driver-side graph state, no collected
  * adjacency, vertex/edge tables stay distributed end to end. Ranks are
  * integer "mass" (scaled fixed-point), never doubles: integer sums are
  * order-independent, so plain `sum()` partial aggregation is safe and
  * the result is bit-portable across engines (a float PageRank would
  * need order-pinned folds — see the x63 KL query — which costs a sort
  * per aggregation at 100 TB; integer mass needs none).
  *
  * Scale notes: each round is one shuffle-hash join of the edge table
  * against the vertex-state table on `src` plus one partial-aggregated
  * `groupBy(dst)` — the canonical Pregel round in relational form. The
  * edge table's partitioning on `src` is reusable across rounds
  * (ReuseExchange); vertex state is corpus-vertex-sized, never
  * broadcast. Plans grow linearly in the (small, fixed) round count.
  */
object Graphs {

  /** Deterministic synthetic citation graph over a dense id space:
    * every vertex `d` emits out-edges to `(d*31+7) % C`, `(d*57+13) % C`
    * and `(d*97+29) % C` where `C = max(id)+1`. Mirrors the testdata
    * convention used across the query surface (x58's URL scheme):
    * the oracle can re-derive the identical edge list in SQL. Parallel
    * edges and self-loops are kept (outdegree is exactly 3), so the
    * graph is reproducible with no dedup pass. */
  def syntheticEdges(df: DataFrame, idCol: String): DataFrame = {
    val c = df.agg((max(col(idCol)) + 1).cast("long").as("__c"))
    df.select(col(idCol).cast("long").as("src"))
      .crossJoin(broadcast(c))
      .select(col("src"), explode(array(
        (col("src") * 31 + 7) % col("__c"),
        (col("src") * 57 + 13) % col("__c"),
        (col("src") * 97 + 29) % col("__c"))).as("dst"))
  }

  /** Ring-lattice + chord variant of [[syntheticEdges]]: every vertex
    * links its two ring successors `(d+1) % C`, `(d+2) % C` plus one
    * hash chord `(d*31+7) % C`. The consecutive-successor pair closes a
    * triangle at every vertex (d, d+1, d+2), so triangle-counting
    * contracts stay non-empty at every corpus scale. */
  def ringEdges(df: DataFrame, idCol: String): DataFrame = {
    val c = df.agg((max(col(idCol)) + 1).cast("long").as("__c"))
    df.select(col(idCol).cast("long").as("src"))
      .crossJoin(broadcast(c))
      .select(col("src"), explode(array(
        (col("src") + 1) % col("__c"),
        (col("src") + 2) % col("__c"),
        (col("src") * 31 + 7) % col("__c"))).as("dst"))
  }

  /** Fixed-point integer PageRank: `iters` synchronous rounds at damping
    * 85/100 over a total mass of `scale` (default 1e12 — six digits of
    * headroom under the 9.2e18 BIGINT ceiling even at 85× fan-in sums).
    *
    * All arithmetic is non-negative BIGINT with floor division, so
    * Spark `div` and any ANSI engine's integer `/` agree bit-for-bit:
    *
    *   mass0     = scale div C                     (C = vertex count)
    *   contrib_u = mass_t(u) div outdeg(u)         (per out-edge)
    *   mass_t+1  = (15*mass0) div 100 + (85 * Σ inflow) div 100
    *
    * The floor-division remainders leak a little mass each round
    * (bounded by outdeg+1 units per vertex — ~1e-9 relative at the
    * default scale); that loss is deterministic and identical in every
    * engine, which is the point: ranking fidelity with bit-exact
    * verifiability. Vertices without out-edges simply retain no
    * outflow (standard dangling-mass drop). */
  def pageRankInt(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1 && scale >= 1000000L && checkpointEvery >= 1)
    val vertices = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // deliberately NOT persist()ed: the per-round subtrees are
    // IDENTICAL, so ReuseExchange computes the (edge ⋈ outdeg) shuffle
    // once for the whole plan already — measured at sf0.1, caching it
    // instead REGRESSED every graph op (x97 1.4→1.6 s, x98 6→27 s,
    // x99 1.6→2.3 s: InMemoryRelation scans replace reused exchange
    // files and break whole-stage codegen around the join)
    val e = edges.join(outdeg, "src")
    val nV = vertices.agg(count(lit(1)).as("__n"))
    // `div` everywhere, never `/`+cast: long `/` is DOUBLE division in
    // Spark, and a 52-bit-mantissa quotient floor-cast can land one off
    // the true integer floor — `div` is exact and matches ANSI `//`
    var mass = vertices.crossJoin(broadcast(nV))
      .select(col("id"),
        expr(s"${scale}L div __n").as("mass"),
        expr(s"(15 * (${scale}L div __n)) div 100").as("base"))
    for (i <- 1 to iters) {
      val inflow = e.join(mass.select(col("id"), col("mass")),
          e("src") === col("id"))
        .select(col("dst"), expr("mass div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      mass = mass.join(inflow, mass("id") === inflow("dst"), "left")
        .select(mass("id"),
          expr("base + (85 * coalesce(inflow, 0L)) div 100").as("mass"),
          mass("base"))
      // truncate lineage periodically: an N-round loop otherwise hands
      // Catalyst an N-join tree whose re-analysis cost grows
      // superlinearly in N (the standard iterative-DataFrame trap);
      // localCheckpoint materializes vertex state (vertex-sized, cheap)
      // and restarts the plan from it
      if (i % checkpointEvery == 0 && i < iters)
        mass = mass.localCheckpoint()
    }
    mass.select(col("id"), col("mass"))
  }

  /** Connected components via min-label propagation: `iters` synchronous
    * rounds of `label(v) ← min(label(v), min over neighbors)` on the
    * undirected closure of `edges`, starting from `label(v) = v`.
    * Pure-integer, so partial-aggregated `min()` is order-free and the
    * round count is the only convergence knob — after `iters` rounds
    * every vertex holds the smallest id within distance `iters`, which
    * equals its component min once `iters` ≥ the component diameter.
    * (Production pointer-jumping halves diameters per round —
    * [[TextDedup]]'s cluster op does that; this is the bounded-round
    * relational form whose intermediate state is verifiable.) */
  def labelPropagation(edges: DataFrame, iters: Int,
      checkpointEvery: Int = 1): DataFrame = {
    // default = truncate EVERY round (unlike pageRankInt's 8): LP's
    // round subtree is heavy (undirected-closure union+distinct feeds
    // both join sides), and uncheckpointed rounds compound — at sf0.1
    // the old default-8 measured 6.4 s vs 2.8 s at cp=1 (iters=5), and
    // on an 8x-replicated corpus 75 s vs 15 s — the lineage tax grows
    // superlinearly with BOTH iters and data. x98's explicit cp=1 had
    // the same numbers at 1x; round 10's 8x curve showed the default
    // itself was the trap and flipped it.
    require(iters >= 1 && checkpointEvery >= 1)
    // localCheckpoint (NOT persist — cache-manager persist() measured
    // 4.5× slower here, r12): ReuseExchange dedups the closure's
    // distinct only WITHIN one round's plan; each round's eager
    // checkpoint is its own execution, so uncheckpointed the
    // scan+union+distinct subtree re-ran once per round (round-15
    // measured: jobs drop ~2 per round, see x98 notes)
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    var labels = und.select(col("src").as("id"))
      .union(und.select(col("dst").as("id"))).distinct()
      .select(col("id"), col("id").as("label"))
    for (i <- 1 to iters) {
      val nbrMin = und.join(labels, und("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nmin"))
      labels = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
      if (i % checkpointEvery == 0 && i < iters) // see pageRankInt note
        labels = labels.localCheckpoint()
    }
    labels
  }

  /** Bounded-round k-core peeling: `rounds` synchronous iterations of
    * "drop every vertex whose degree among SURVIVING vertices is < k".
    * The fixpoint is the k-core (the densest-cohesion subgraph family —
    * spam/mirror rings and template farms surface as high-core
    * neighborhoods); a fixed round count makes each intermediate state
    * oracle-verifiable exactly like [[labelPropagation]]. Returns one
    * row per round: (round, n_alive) — round 0 is the full vertex set.
    *
    * Scale shape per round: two semi joins of the edge table against
    * the alive set (hash-partitioned on the vertex id) + one count
    * aggregation; the alive table only shrinks. */
  def kCoreRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // same once-per-query closure checkpoint as [[labelPropagation]]
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    var alive = und.select(col("src").as("v"))
      .union(und.select(col("dst").as("v"))).distinct()
    var out = alive.agg(lit(0L).as("round"), count(lit(1)).as("n_alive"))
    for (i <- 1 to rounds) {
      val live = und
        .join(alive.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("v").as("dst")), Seq("dst"), "left_semi")
      // truncate lineage every round (the labelPropagation lesson:
      // peel rounds compound TWO semi joins each, and the alive set
      // ALSO feeds the per-round count — uncheckpointed, the union of
      // round summaries re-derives every earlier round per branch;
      // measured 8.7 → ~2 s at sf0.1). Vertex-sized state, shrinking.
      alive = live.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("v"))
        .localCheckpoint()
      out = out.unionByName(
        alive.agg(lit(i.toLong).as("round"), count(lit(1)).as("n_alive")))
    }
    out
  }

  /** Exact triangle counting with degree orientation (the MapReduce
    * classic — Suri & Vassilvitskii "Counting Triangles and the Curse of
    * the Last Reducer", WWW'11): orient each undirected edge from its
    * lower-(degree, id) endpoint to its higher one, build wedges only at
    * each edge's SOURCE, and close them against the oriented edge set.
    * Every triangle is generated exactly once, and per-vertex wedge
    * fan-out is bounded by the oriented outdegree ≤ O(√m) — the
    * high-degree hub that makes the naive wedge join quadratic never
    * becomes a wedge center. Returns one row per triangle corner:
    * `(id, n_triangles)` for vertices in ≥ 1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = canon.select(col("u").as("id"))
      .union(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient: (deg, id) lexicographic — ties on degree break by id
    val oriented = canon
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"),
        "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"),
        "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"))
      // NOT persist()ed: the three consumers below are identical
      // subtrees ReuseExchange serves from one computation (caching
      // measured slower — see the pageRankInt note)
    // wedges centered at a: (b, c) pairs of oriented out-neighbors,
    // pinned b < c so each wedge is generated once
    val w1 = oriented.select(col("a"), col("b"))
    val w2 = oriented.select(col("a"), col("b").as("c"))
    val wedges = w1.join(w2, "a").filter(col("b") < col("c"))
    // close the wedge: the (b, c) edge must exist in EITHER orientation
    val closer = oriented
      .select(least(col("a"), col("b")).as("b"),
        greatest(col("a"), col("b")).as("c"))
    val tris = wedges.join(closer, Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }
}
