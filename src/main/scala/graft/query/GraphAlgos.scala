package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Checkpoints

/** Graph analytics over the materialized entity/triple graph, expressed as
  * (iterative) DataFrame joins — the GraphFrames idiom without the jar.
  *
  * The reference surfaces its graph only through retrieval (1-hop expansion,
  * traversal, ENUMERATION drilldown's "top entities by incident facts",
  * /root/reference/src/query_v6.py). A standing KG warehouse also wants the
  * classic analytics: degree profiles, bounded-hop reachability, PageRank
  * centrality (the principled version of "top entities"), and triangle
  * counts (local clustering / community density). Each is a handful of
  * shuffles on the edge key, so the shapes below hold at 10^12-edge scale:
  *
  *  - [[degrees]]: one symmetrize + one hash aggregation.
  *  - [[kHop]]: `maxHops` rounds of frontier ⋈ edges with an anti-join
  *    against the visited set; per-round lineage truncation keeps plans
  *    flat. Frontiers are the only growing state and stay bounded by the
  *    reachable set.
  *  - [[pageRank]]: fixed-iteration contribution join + aggregation;
  *    dangling mass folded in via a 1-row broadcast cross join (never a
  *    driver collect inside the loop).
  *  - [[triangles]]: degree-ordered edge orientation (each undirected edge
  *    points low→high by (degree, id)) before the wedge self-join — the
  *    standard compact-forward bound: a hot vertex of degree d fans out
  *    wedges only from its lower-ordered endpoints, so the join is
  *    Σ outdeg² with outdeg ≈ O(√m) worst case instead of d².
  *
  * All operators take an edge DataFrame with columns (src, dst) of any
  * orderable id type; [[kHop]]/[[pageRank]]/[[triangles]] treat it as
  * undirected by symmetrizing internally (pass a pre-directed list to
  * [[pageRank]] via `directed = true` to keep link direction).
  */
object GraphAlgos {

  private def sym(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** Undirected degree per vertex: (id, degree). Isolated vertices (present
    * in no edge) are absent — join against the vertex table if zeros matter.
    */
  def degrees(edges: DataFrame): DataFrame =
    sym(edges).groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))

  /** Minimum-hop distance from any seed, bounded at `maxHops`:
    * (id, dist) with dist in [0, maxHops]. BFS as frontier expansion — each
    * round joins the current frontier to the symmetric edge list and
    * anti-joins the accumulated visited set, so a vertex is labeled the
    * first round it is reached (= its true minimum distance).
    *
    * Runs exactly `maxHops` rounds (no convergence probe — each round is
    * lazy until the final truncation), `maxHops` shuffle rounds total.
    *
    * @param seeds single-column DataFrame of seed vertex ids.
    */
  def kHop(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val adj = Checkpoints.truncate(sym(edges))
    val seed = seeds.toDF("id").distinct()
    var visited = Checkpoints.truncate(seed.withColumn("dist", lit(0)))
    var frontier = visited.select(col("id"))
    var h = 1
    while (h <= maxHops) {
      val next = frontier.join(adj, frontier("id") === adj("src"))
        .select(adj("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(h))
      // one truncation materializes the round; frontier/visited reuse it
      val nextT = Checkpoints.truncate(next)
      visited = Checkpoints.truncate(visited.unionByName(nextT))
      frontier = nextT.select(col("id"))
      h += 1
    }
    visited
  }

  /** Fixed-iteration PageRank: (id, rank). The vertex set is the distinct
    * edge endpoints (isolated vertices contribute nothing and receive only
    * the teleport term — join them back post hoc if needed).
    *
    * rank_{t+1}(v) = (1-d)/n + d * (Σ_{u→v} rank_t(u)/outdeg(u) + D_t/n)
    * where D_t is the total rank on dangling vertices (outdeg 0) — mass is
    * conserved every iteration. On a symmetrized graph D_t = 0.
    *
    * Per iteration: one contribution join (edges ⋈ ranks on src — the edge
    * side never re-shuffles once `adj` is materialized), one aggregation on
    * dst, one 1-row broadcast for the dangling mass. Lineage truncated per
    * iteration so the plan stays flat at any iteration count.
    *
    * @param directed keep edge direction (true) or symmetrize (false).
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      directed: Boolean = false): DataFrame =
    pageRankImpl(prepareAdj(edges, directed), iters, damping, seeds = None)

  /** Personalized PageRank: the teleport (and the dangling redistribution)
    * lands only on `seeds`, uniformly, instead of on every vertex — so rank
    * measures importance RELATIVE to the seed entities (the
    * "what matters around X" ranking). Seeds not present in the edge list
    * still receive teleport mass (they are added as vertices); iteration
    * starts from the teleport distribution. Same per-iteration shape as
    * [[pageRank]]: the seed flag rides the vertex table as a column, never
    * a driver-side structure.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
      damping: Double = 0.85, directed: Boolean = false): DataFrame =
    pageRankImpl(prepareAdj(edges, directed), iters, damping,
      seeds = Some(seeds.toDF("id").distinct()))

  /** PageRank + degree in one report, sharing ONE materialized symmetric
    * adjacency (calling [[pageRank]] and [[degrees]] separately pays the
    * dominant symmetrize-distinct shuffle twice).
    */
  def centralityReport(edges: DataFrame, iters: Int = 5,
      seeds: Option[DataFrame] = None, damping: Double = 0.85): DataFrame = {
    val adj = Checkpoints.truncate(sym(edges))
    val pr = pageRankImpl(adj, iters, damping,
      seeds.map(_.toDF("id").distinct()))
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    pr.join(deg, Seq("id"), "left")
  }

  /** WEIGHTED PageRank: multi-edges count. The weight of (u, v) is the
    * number of parallel input edges (for the KG graph: how many distinct
    * facts relate the pair — a multiplicity signal [[pageRank]] collapses),
    * and a vertex distributes its rank proportionally to edge weight:
    * rank_{t+1}(v) = (1-d)/n + d * Σ_{u→v} rank_t(u) * w(u,v)/W(u).
    * Undirected: each input edge contributes its weight in both directions.
    * Same iteration shape as [[pageRank]] (the weighted adjacency carries a
    * `w` column; W(u) is one aggregation); no dangling handling needed on
    * the symmetrized form, and directed inputs reuse the dangling term.
    */
  def pageRankWeighted(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85, directed: Boolean = false): DataFrame = {
    val pairs = if (directed)
      edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    else edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
    val adj = Checkpoints.truncate(
      pairs.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
    val verts = Checkpoints.truncate(
      adj.select(col("src").as("id"))
        .union(adj.select(col("dst").as("id"))).distinct())
    val outW = Checkpoints.truncate(
      adj.groupBy(col("src").as("id")).agg(sum(col("w")).as("ow")))
    val n = verts.count().toDouble
    val d = lit(damping)
    var ranks = Checkpoints.truncate(
      verts.withColumn("rank", lit(1.0) / lit(n)))
    var it = 0
    while (it < iters) {
      val withW = ranks.join(outW, Seq("id"), "left")
      val contribs = withW.filter(col("ow").isNotNull)
        .join(adj, col("id") === adj("src"))
        .groupBy(adj("dst").as("id"))
        .agg(sum(col("rank") * col("w") / col("ow")).as("contrib"))
      val dangling = withW.filter(col("ow").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val next = verts.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          ((lit(1.0) - d) * (lit(1.0) / lit(n)) +
            d * (coalesce(col("contrib"), lit(0.0)) +
              col("dmass") * (lit(1.0) / lit(n)))).as("rank"))
      ranks = Checkpoints.truncate(next)
      it += 1
    }
    ranks
  }

  /** Loop-free deduplicated adjacency, lineage-truncated (it feeds the
    * out-degree aggregation plus one join per iteration).
    */
  private def prepareAdj(edges: DataFrame, directed: Boolean): DataFrame =
    Checkpoints.truncate(if (directed)
      edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst")).distinct()
    else sym(edges))

  private def pageRankImpl(adj: DataFrame, iters: Int, damping: Double,
      seeds: Option[DataFrame]): DataFrame = {
    val baseVerts = adj.select(col("src").as("id"))
      .union(adj.select(col("dst").as("id"))).distinct()
    // the teleport distribution rides the vertex table as a column:
    // uniform over all vertices (standard), or over the seed set
    // (personalized — seeds outside the edge list still become vertices;
    // with no out-edges their mass re-enters through the dangling term)
    val verts = Checkpoints.truncate(seeds match {
      case Some(sd) => baseVerts.unionByName(sd).distinct()
        .join(sd.withColumn("is_seed", lit(true)), Seq("id"), "left")
        .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      case None => baseVerts.withColumn("is_seed", lit(true))
    })
    val outDeg = Checkpoints.truncate(
      adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("od")))
    val nTele = verts.filter(col("is_seed")).count().toDouble
    val withTele = verts.withColumn("tele",
      when(col("is_seed"), lit(1.0) / lit(nTele)).otherwise(lit(0.0)))
    val d = lit(damping)

    var ranks = Checkpoints.truncate(
      withTele.select(col("id"), col("tele").as("rank")))
    var it = 0
    while (it < iters) {
      val withDeg = ranks.join(outDeg, Seq("id"), "left")
      val contribs = withDeg.filter(col("od").isNotNull)
        .join(adj, col("id") === adj("src"))
        .groupBy(adj("dst").as("id"))
        .agg(sum(col("rank") / col("od")).as("contrib"))
      // dangling mass as a 1-row aggregate broadcast into the update — keeps
      // the whole iteration one lazy plan (no driver collect per round);
      // redistributed BY the teleport distribution (uniform in the standard
      // case), so mass is conserved in both variants
      val dangling = withDeg.filter(col("od").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val next = withTele.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          ((lit(1.0) - d) * col("tele") + d * (coalesce(col("contrib"), lit(0.0)) +
            col("dmass") * col("tele"))).as("rank"))
      ranks = Checkpoints.truncate(next)
      it += 1
    }
    ranks
  }

  /** Synchronous label-propagation community detection: (id, label) after
    * `iters` rounds. Every vertex starts labeled with its own id; each round
    * every vertex simultaneously adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — fully deterministic, no
    * RNG, no asynchronous update order (the classic LPA nondeterminism),
    * so the result is layout-invariant and replayable by any engine.
    *
    * Densely connected vertex groups converge to a shared label (their
    * minimum id) within a few rounds while bridges between communities stay
    * outvoted — the cheap community-structure complement to
    * [[graft.canon.ConnectedComponents]] (which merges ANY connectivity).
    * Known synchronous-LPA caveat applies: perfectly bipartite regions can
    * oscillate with period 2, which fixed `iters` keeps deterministic.
    *
    * Per round: one join of the adjacency against the current labels, one
    * (vertex, label) count aggregation, one per-vertex top-1 window — all
    * hash-partitioned on vertex id, no global sort; lineage truncated per
    * round. Scale note: the histogram is bounded by the true degree sum
    * (= 2|E| rows) regardless of label skew, so rounds cost O(|E|) shuffle
    * each at any graph size.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame = {
    val adj = Checkpoints.truncate(sym(edges))
    var labels = Checkpoints.truncate(
      adj.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
    val top1 = Window.partitionBy(col("id"))
      .orderBy(col("c").desc, col("label").asc)
    var it = 0
    while (it < iters) {
      // neighbor votes PLUS one self-vote: pure synchronous neighbor-only
      // LPA provably cuts every edge of a star or isolated pair forever
      // (the endpoints adopt each other's label in lockstep each round —
      // measured on the entity graph as modularity < 0 with zero internal
      // edges everywhere); the self-vote is the standard damping that
      // stabilizes those shapes while majority neighborhoods still win
      val votes = adj
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
        .union(labels)
      val hist = votes.groupBy(col("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val next = hist.withColumn("rn", row_number().over(top1))
        .filter(col("rn") === 1).select(col("id"), col("label"))
      labels = Checkpoints.truncate(next)
      it += 1
    }
    labels
  }

  /** Newman modularity per community: (label, n_vertices, internal_edges,
    * degree_sum, contribution), where contribution = e_c/m − (d_c/2m)² and
    * Σ contributions = Q — the quality metric that tells a user whether the
    * [[labelPropagation]] communities are real structure or noise (Q near 0
    * = no better than random given the degree sequence).
    *
    * `communities` is any (id, label) assignment; vertices of the edge set
    * missing from it are dropped from the edge-side stats (their rows can't
    * be attributed), communities with no surviving edges report zeros. One
    * shared symmetrized adjacency feeds both per-community aggregates in a
    * single pass (each directed row contributes 1 to its src community's
    * degree sum and, when the endpoints agree, 1 to internal×2), and the
    * global 2m total rides in as a 1-row broadcast — two shuffles on vertex
    * id + one bounded-by-#communities aggregation at any graph size.
    */
  def modularity(edges: DataFrame, communities: DataFrame): DataFrame = {
    val und = Checkpoints.truncate(sym(edges))
    val lab = communities.select(col("id"), col("label"))
    val withLabels = und
      .join(lab.select(col("id").as("src"), col("label").as("ls")), Seq("src"))
      .join(lab.select(col("id").as("dst"), col("label").as("ld")), Seq("dst"))
    val eStats = withLabels.groupBy(col("ls").as("label"))
      .agg(count(lit(1)).as("degree_sum"),
        sum(when(col("ls") === col("ld"), lit(1L)).otherwise(lit(0L)))
          .as("internal2"))
    val m2 = und.agg(count(lit(1)).as("m2"))
    lab.groupBy(col("label")).agg(count(lit(1)).as("n_vertices"))
      .join(eStats, Seq("label"), "left")
      .crossJoin(broadcast(m2))
      .select(col("label"), col("n_vertices"),
        (coalesce(col("internal2"), lit(0L)) / 2).cast("long").as("internal_edges"),
        coalesce(col("degree_sum"), lit(0L)).as("degree_sum"),
        (coalesce(col("internal2"), lit(0L)).cast("double") / col("m2")
          - (coalesce(col("degree_sum"), lit(0L)).cast("double") / col("m2"))
            * (coalesce(col("degree_sum"), lit(0L)).cast("double") / col("m2")))
          .as("contribution"))
  }

  /** Per-vertex triangle count: (id, triangles), vertices in no triangle
    * omitted. Compact-forward: orient each undirected edge from its lower
    * endpoint by (degree, id), enumerate wedges from the common LOW vertex,
    * and close them with a semi-join back onto the oriented edge list. Three
    * shuffles total (orient, wedge join, close); the orientation bounds the
    * wedge fan-out of skewed vertices, which is what makes this survive a
    * power-law 10^12-edge graph where the naive a<b<c self-join would not.
    */
  def triangles(edges: DataFrame): DataFrame =
    // three consumers (degree agg, orientation join, closing probe) — one
    // materialization instead of three symmetrize shuffles
    trianglesFromSym(Checkpoints.truncate(sym(edges)))

  /** [[triangles]] over an already-symmetrized, deduplicated, materialized
    * adjacency — shared by [[graphStats]] so the report symmetrizes once.
    */
  private def trianglesFromSym(und: DataFrame): DataFrame =
    triangleTriples(und)
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))

  /** Each triangle exactly once as (u, v, w): u = the degree-ordered apex
    * both oriented wedge arms leave from, v < w by id. Shared by the
    * per-vertex counts ([[trianglesFromSym]]) and the per-edge support
    * ([[edgeSupport]]) so both inherit the compact-forward bound.
    */
  private def triangleTriples(und: DataFrame): DataFrame = {
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // orient low→high by (degree, id); each undirected edge survives once
    val oriented = Checkpoints.truncate(
      und.join(deg.withColumnRenamed("id", "src")
            .withColumnRenamed("deg", "sdeg"), Seq("src"))
        .join(deg.withColumnRenamed("id", "dst")
            .withColumnRenamed("deg", "ddeg"), Seq("dst"))
        .filter(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")))
        .select(col("src"), col("dst")))
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"))
    val e2 = oriented.select(col("src").as("u"), col("dst").as("w"))
    // (v, w) vs (w, v) from the same u is the same wedge — keep one; the
    // closing probe uses the SYMMETRIC list because the (v, w) edge may be
    // oriented either way (orientation order is (degree, id), wedge dedup
    // order is plain id)
    val wedges = e1.join(e2, Seq("u")).filter(col("v") < col("w"))
    val closing = und.select(col("src").as("v"), col("dst").as("w"))
    wedges.join(closing, Seq("v", "w"), "left_semi")
  }

  /** Per-edge triangle support: (src, dst, support) for every undirected
    * edge in id-canonical orientation (src < dst) — the edge-level dual of
    * [[clusteringCoefficients]] and the quantity k-truss peels on (an edge
    * with high support sits inside a dense community; support 0 = bridge
    * or noise). Same cost envelope as [[triangles]]: the triple enumeration
    * plus one canonicalize-explode-aggregate keyed by the edge.
    */
  def edgeSupport(edges: DataFrame): DataFrame =
    edgeSupportFromSym(Checkpoints.truncate(sym(edges)))

  private def edgeSupportFromSym(und: DataFrame): DataFrame = {
    val tris = triangleTriples(und)
    def canon(x: String, y: String) = tris.select(
      least(col(x), col(y)).as("src"), greatest(col(x), col(y)).as("dst"))
    val sup = canon("u", "v").union(canon("u", "w")).union(canon("v", "w"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("support"))
    und.filter(col("src") < col("dst"))
      .join(sup, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Edges of the k-truss: the maximal subgraph in which every edge sits in
    * at least k−2 triangles of that subgraph — the edge-level strengthening
    * of [[kCore]] (a k-truss is always inside the (k−1)-core but prunes
    * tree-like tendrils a core keeps). Iterative peel to fixpoint, same
    * driver discipline as kCore: per-round edge COUNTS only, per-round
    * lineage truncation, O(peel-rounds) triangle passes. Returns the
    * surviving edges in id-canonical orientation (src, dst).
    */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 100): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    var e = Checkpoints.truncate(sym(edges).filter(col("src") < col("dst")))
    var prev = e.count()
    var round = 0
    while (prev > 0 && round < maxRounds) {
      val und = Checkpoints.truncate(
        e.union(e.select(col("dst").as("src"), col("src").as("dst"))))
      e = Checkpoints.truncate(
        edgeSupportFromSym(und).filter(col("support") >= k - 2)
          .select(col("src"), col("dst")))
      val n = e.count()
      if (n == prev) return e // fixpoint: every edge meets the bound
      prev = n
      round += 1
    }
    e
  }

  /** Local clustering coefficients: (id, degree, triangles, coefficient)
    * for every non-isolated vertex — coefficient = 2·T(v)/(deg(v)·(deg(v)−1)),
    * 0 when deg < 2 (the per-vertex community-density signal PageRank and
    * degree miss). One shared symmetrized adjacency feeds both the degree
    * aggregation and the triangle count (the [[graphStats]] sharing
    * discipline — never two symmetrize shuffles).
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val und = Checkpoints.truncate(sym(edges))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    deg.join(trianglesFromSym(und), Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(coalesce(col("triangles"), lit(0L)).cast("double") * 2.0
            / (col("degree") * (col("degree") - 1)).cast("double"))
          .as("coefficient"))
  }

  /** Vertices of the k-core: the maximal subgraph in which every vertex
    * has degree >= k (the standard graph-quality filter — noise entities
    * and weakly-attested facts peel away first). Iterative peeling as
    * DataFrame joins: drop all vertices below degree k, recompute degrees
    * on the induced subgraph, repeat to fixpoint. O(peel-rounds) shuffles;
    * the driver sees only per-round edge COUNTS (the CC precedent), never
    * rows; per-round lineage truncation keeps plans flat.
    *
    * No driver-oracle row: the fixpoint's MAXIMALITY is not expressible as
    * a bounded DuckDB recomputation (round count is data-dependent, and
    * SQL recursion cannot aggregate per round); the k-core properties are
    * instead asserted on hand graphs in GraphAlgosSpec.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var adj = Checkpoints.truncate(sym(edges))
    var before = adj.count()
    var it = 0
    var converged = before == 0L
    while (!converged && it < maxIter) {
      val keep = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("id"))
      val next = Checkpoints.truncate(
        adj.join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst")))
      val after = next.count()
      converged = after == before || after == 0L
      before = after
      adj = next
      it += 1
    }
    adj.select(col("src").as("id")).distinct()
  }

  /** One shortest path between two vertices on the undirected graph:
    * (step, vertex) rows from step 0 = `srcId` to step d = `dstId`, empty
    * when `dstId` is farther than `maxHops` (or unreachable).
    *
    * The path is DETERMINISTIC: among equal-length paths it follows, at
    * every vertex, the minimum-id predecessor on the previous BFS level —
    * so retries, layouts, and other engines (the DuckDB oracle) replay the
    * identical vertex sequence.
    *
    * Cost: one bounded BFS ([[kHop]]), one join to build the predecessor
    * table, then d ≤ maxHops single-row joins to walk back — the walk is
    * O(path length), never a second traversal.
    */
  def shortestPath(edges: DataFrame, srcId: Any, dstId: Any,
      maxHops: Int = 8): DataFrame = {
    val spark = edges.sparkSession
    val idField = edges.schema("src")
    val seed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(srcId)), 1),
      org.apache.spark.sql.types.StructType(Seq(idField.copy(name = "id"))))
    val dists = Checkpoints.truncate(kHop(edges, seed, maxHops))
    val dDst = dists.filter(col("id") === lit(dstId))
      .select(col("dist")).collect().headOption.map(_.getInt(0))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step",
          org.apache.spark.sql.types.IntegerType),
        idField.copy(name = "vertex"))))
    dDst match {
      case None => empty
      case Some(d) =>
        // pred(v) = min neighbor one BFS level closer to the source
        val und = sym(edges)
        val lvl = dists.select(col("id").as("pid"), col("dist").as("pdist"))
        val pred = Checkpoints.truncate(
          und.join(dists, und("dst") === dists("id"))
            .join(lvl, und("src") === lvl("pid") && lvl("pdist") === dists("dist") - 1)
            .groupBy(dists("id")).agg(min(und("src")).as("pred")))
        var cur = dists.filter(col("id") === lit(dstId))
          .select(col("dist").as("step"), col("id").as("vertex"))
        var path = cur
        var i = 0
        while (i < d) {
          // per-iteration renames: cur derives from pred after round one,
          // so a bare re-join would be an ambiguous self-join
          val p = pred.select(col("id").as(s"__pid$i"), col("pred").as(s"__pv$i"))
          cur = cur.join(p, col("vertex") === col(s"__pid$i"))
            .select((col("step") - 1).as("step"), col(s"__pv$i").as("vertex"))
          path = path.unionByName(cur)
          i += 1
        }
        path
    }
  }

  /** Strongly connected components of a DIRECTED graph: (id, component)
    * where component = the smallest vertex id in the SCC (isolated and
    * acyclic vertices are their own singleton components).
    *
    * Forward-backward min-label peeling (the distributed FW-BW/coloring
    * family): each pass computes to fixpoint fwd(v) = min vertex with a
    * directed path TO v and bwd(v) = min vertex reachable FROM v (both with
    * pointer jumping — label(label(v)) is always a valid label because
    * reachability composes). A vertex with fwd(v) == bwd(v) == m is mutually
    * reachable with m, and every member of SCC(m) shares both labels, so the
    * filter peels COMPLETE SCCs — at minimum the SCC of every locally
    * minimal vertex — and the remainder recurses on the induced subgraph.
    * Pass count is bounded by the longest chain of SCCs in the condensation
    * DAG, not by the SCC count.
    *
    * Scale: each fixpoint round is one shuffle on the vertex id (identical
    * shape to [[graft.canon.ConnectedComponents]]); the driver sees only
    * per-round changed-counts and per-pass remaining-counts, never rows.
    */
  def stronglyConnected(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val dir0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    var remaining = Checkpoints.truncate(
      dir0.select(col("src").as("id"))
        .union(dir0.select(col("dst").as("id"))).distinct())
    var rem = Checkpoints.truncate(dir0)
    var out: DataFrame = null
    var pass = 0
    var nRemaining = remaining.count()
    while (nRemaining > 0 && pass < maxIter) {
      val fwd = minReachLabel(rem, remaining, maxIter)
      val bwd = minReachLabel(
        rem.select(col("dst").as("src"), col("src").as("dst")), remaining, maxIter)
      val scc = Checkpoints.truncate(
        fwd.join(bwd.withColumnRenamed("label", "blabel"), "id")
          .filter(col("label") === col("blabel"))
          .select(col("id"), col("label").as("component")))
      out = if (out == null) scc else out.unionByName(scc)
      remaining = Checkpoints.truncate(remaining.join(scc, Seq("id"), "left_anti"))
      rem = Checkpoints.truncate(
        rem.join(scc.select(col("id").as("src")), Seq("src"), "left_anti")
          .join(scc.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .select(col("src"), col("dst")))
      nRemaining = remaining.count()
      pass += 1
    }
    require(nRemaining == 0, s"SCC peeling did not converge in $maxIter passes")
    out
  }

  /** Fixpoint min-label propagation along edge DIRECTION (src's label flows
    * to dst), with pointer jumping; the CC loop's observed-changed-count
    * pattern (one job per round). Returns (id, label) for every vertex.
    */
  private def minReachLabel(edges: DataFrame, vertices: DataFrame,
      maxRounds: Int): DataFrame = {
    val idType = vertices.schema("id").dataType
    var labels = Checkpoints.truncate(
      vertices.select(col("id"), col("id").as("label")))
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds * 4) {
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(edges("dst").as("id"), col("label"),
          lit(null).cast(idType).as("old"))
      val merged = labels
        .select(col("id"), col("label"), col("label").as("old"))
        .unionByName(msgs)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      val jump = merged.select(col("id").as("jid"), col("label").as("jlabel"))
      val obs = org.apache.spark.sql.Observation(
        s"scc_changed_${sccObsId.incrementAndGet()}")
      val next = Checkpoints.truncate(
        merged.join(jump, merged("label") === jump("jid"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"),
            col("old"))
          .observe(obs, sum(when(col("label") =!= col("old"), 1L)
            .otherwise(0L)).as("changed")))
      changed = {
        val row = try Some(scala.concurrent.Await.result(
          obs.future, scala.concurrent.duration.Duration(30, "s")))
        catch { case _: java.util.concurrent.TimeoutException => None }
        row.collect { case r if !r.isNullAt(0) => r.getLong(0) }.getOrElse {
          next.join(labels.withColumnRenamed("label", "old2"), "id")
            .filter(col("label") =!= col("old2")).count()
        }
      }
      labels = next.drop("old")
      round += 1
    }
    labels
  }

  private val sccObsId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One-row graph health report over the undirected graph: vertex/edge
    * counts, connected-component count + largest size, degree profile
    * (p50/p90 via percentile_approx — a report statistic, not an oracle
    * surface), and total triangle count. Shares ONE symmetrized adjacency
    * across the degree, component, and triangle passes.
    */
  def graphStats(edges: DataFrame): DataFrame = {
    val und = Checkpoints.truncate(sym(edges))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    val degStats = deg.agg(
      count(lit(1)).as("nodes"),
      max(col("degree")).as("max_degree"),
      percentile_approx(col("degree"), lit(0.5), lit(10000)).as("p50_degree"),
      percentile_approx(col("degree"), lit(0.9), lit(10000)).as("p90_degree"))
    val comps = graft.canon.ConnectedComponents.run(und.sparkSession, und)
      .groupBy(col("component")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("components"), max(col("n")).as("largest_component"))
    val triTotal = trianglesFromSym(und)
      .agg(coalesce(sum(col("triangles")) / 3, lit(0L)).cast("long").as("triangles"))
    val edgeCount = und.agg((count(lit(1)) / 2).cast("long").as("edges"))
    // global clustering = 3·triangles / wedges (closed over open triads)
    // and degree assortativity — the two one-number structure signals
    val wedges = deg.agg(coalesce(
      sum(col("degree") * (col("degree") - 1) / 2), lit(0L)).cast("long").as("wedges"))
    val assort = assortativityFromSym(und).select(col("assortativity"))
    degStats.crossJoin(edgeCount).crossJoin(comps).crossJoin(triTotal)
      .crossJoin(wedges).crossJoin(assort)
      .withColumn("global_clustering",
        when(col("wedges") === 0, lit(null).cast("double"))
          .otherwise(round(col("triangles").cast("double") * 3 / col("wedges"), 6)))
      .drop("wedges")
  }

  /** Newman degree assortativity (2002): the Pearson correlation of endpoint
    * degrees over directed edge stubs — positive = hubs attach to hubs
    * (social shape), negative = hub-and-spoke (the typical KG shape; a star
    * is exactly −1), NULL on a regular graph (zero variance). One row:
    * (m, se, s1, s2, assortativity) with the three stub sums kept as EXACT
    * integers (the double arithmetic happens once, at the end, in a pinned
    * op order — the oracle reproduces the row bit-for-bit). Two shuffles:
    * the degree aggregation and its broadcast-back join; the sums combine
    * map-side. Integer sums hold to ~10^6 max degree at 10^12 edges —
    * past that, pre-divide degrees or switch the sums to double.
    */
  def assortativity(edges: DataFrame): DataFrame =
    assortativityFromSym(Checkpoints.truncate(sym(edges)))

  private def assortativityFromSym(und: DataFrame): DataFrame = {
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val pairs = und
      .join(deg.select(col("id").as("src"), col("d").as("j")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("d").as("k")), Seq("dst"))
    val sums = pairs.agg(count(lit(1)).as("m"),
      sum(col("j") * col("k")).as("se"),
      sum(col("j")).as("s1"),
      sum(col("j") * col("j")).as("s2"))
    val mean = col("s1").cast("double") / col("m")
    val num = col("se").cast("double") / col("m") - mean * mean
    val den = col("s2").cast("double") / col("m") - mean * mean
    sums.select(col("m"), col("se"), col("s1"), col("s2"),
      when(den === 0.0, lit(null).cast("double"))
        .otherwise(round(num / den, 6)).as("assortativity"))
  }

  /** Link prediction over non-adjacent vertex pairs that share at least one
    * neighbor: (a, b, common, jaccard, adamic_adar) with a < b. The classic
    * missing-edge scores — common-neighbor count, Jaccard overlap of the
    * neighborhoods, and Adamic-Adar Σ 1/ln(deg(z)) over shared neighbors z
    * (rare shared neighbors weigh more).
    *
    * Shape: one wedge self-join through the shared neighbor (the same
    * Σ deg² bound as [[triangles]] — at power-law scale, cap or sample hub
    * neighborhoods upstream), one aggregation on the candidate pair, one
    * anti-join to drop already-connected pairs, one degree join. Never
    * enumerates all O(n²) pairs — only pairs at distance exactly 2.
    */
  def linkPrediction(edges: DataFrame): DataFrame = {
    val und = Checkpoints.truncate(sym(edges))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // wedges a–z–b through shared neighbor z, scored by z's rarity
    val byZ = und.select(col("src").as("z"), col("dst").as("n"))
      .join(deg.withColumnRenamed("id", "z").withColumnRenamed("deg", "zdeg"), Seq("z"))
    val pairs = byZ.select(col("z"), col("n").as("a"), col("zdeg"))
      .join(byZ.select(col("z"), col("n").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("zdeg").cast("double"))).as("adamic_adar"))
    val nonAdj = pairs.join(
      und.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"), "left_anti")
    nonAdj
      .join(deg.select(col("id").as("a"), col("deg").as("dega")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("degb")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        (col("common").cast("double") /
          (col("dega") + col("degb") - col("common")).cast("double")).as("jaccard"),
        col("adamic_adar"))
  }

  /** Deterministic pseudo-random walks for graph-embedding training
    * corpora (DeepWalk/node2vec input): `walksPerNode` walks per seed
    * vertex, `length` steps each, output (walk_id, walk_idx, step, vertex)
    * with step 0 = the seed.
    *
    * The "randomness" is a hash: at step t, walk (u, i) at vertex v moves
    * to the neighbor w minimizing md5(walk_id:i:t:w) — the same
    * hash-plays-the-RNG trick as Sampling.datasetSplit, so walks are
    * reproducible across retries, partitionings, and engines (no rand(),
    * no seed plumbing), at the cost of sampling without replacement
    * semantics nobody needs for skip-gram windows. The walk index is part
    * of the hash, so the i walks from one seed decorrelate after step 1.
    * Dead ends stop early.
    *
    * Shape: `length` rounds of frontier ⋈ adjacency + a min_by aggregation
    * per walk — the frontier is one row per live walk, so each round moves
    * O(vertices × walksPerNode) rows regardless of graph size.
    */
  def deterministicWalks(edges: DataFrame, length: Int,
      walksPerNode: Int = 1): DataFrame = {
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    val adj = Checkpoints.truncate(sym(edges))
    var cur = Checkpoints.truncate(
      adj.select(col("src").as("walk_id")).distinct()
        .select(col("walk_id"),
          explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk_idx"))
        .select(col("walk_id"), col("walk_idx"),
          lit(0).as("step"), col("walk_id").as("vertex")))
    var out = cur
    var t = 1
    while (t <= length) {
      val next = cur.join(adj, cur("vertex") === adj("src"))
        .groupBy(col("walk_id"), col("walk_idx"))
        .agg(min_by(col("dst"),
          md5(concat_ws(":", col("walk_id"), col("walk_idx"), lit(t),
            col("dst")))).as("vertex"))
        .select(col("walk_id"), col("walk_idx"), lit(t).as("step"), col("vertex"))
      cur = Checkpoints.truncate(next)
      out = out.unionByName(cur)
      t += 1
    }
    out
  }

  /** Betweenness centrality (Brandes 2001 as iterative DataFrame joins),
    * exact within a bounded shortest-path horizon: (id, betweenness) where
    * betweenness(v) = Σ_{s≠v≠t} σ_st(v)/σ_st over UNDIRECTED shortest paths
    * of length ≤ `maxDepth`. With maxDepth ≥ the graph diameter this is
    * exact textbook betweenness; a bounded horizon is itself the standard
    * web-scale relaxation (distant pairs contribute little and cost most).
    *
    * Forward pass: one multi-source BFS level table per depth carrying the
    * shortest-path COUNT σ(s,v) (sum over predecessors — never path
    * enumeration). Backward pass: Brandes dependency accumulation
    * δ(s,u) = Σ_{w: succ} σ(s,u)/σ(s,w) · (1 + δ(s,w)), level by level.
    * betweenness(v) = Σ_s δ(s,v) / 2 (each unordered pair counted from both
    * endpoints).
    *
    * Shape: 2·maxDepth join+aggregate rounds over (source, vertex) states —
    * O(n²) state for all-sources exact mode, never O(paths). Per-round
    * lineage truncation keeps plans flat. At 10^12-edge scale pass a
    * deterministic source sample as `sources` (Brandes–Pich 2007): the
    * returned sums then estimate n/|S| · betweenness — the caller scales,
    * keeping raw sums exact and engine-portable here.
    */
  def betweenness(edges: DataFrame, maxDepth: Int,
      sources: Option[DataFrame] = None): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val adj = Checkpoints.truncate(sym(edges))
    val verts = adj.select(col("src").as("id")).distinct()
    val srcs = sources.map(_.toDF("id").distinct()).getOrElse(verts)
    // forward BFS: levels(d) = (s, v, sigma) for vertices first reached at
    // depth d, sigma = number of distinct shortest s→v paths
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    levels += Checkpoints.truncate(srcs.select(
      col("id").as("s"), col("id").as("v"), lit(1L).as("sigma")))
    var visited = levels(0).select(col("s"), col("v"))
    var d = 1
    while (d <= maxDepth) {
      val next = levels(d - 1).join(adj, levels(d - 1)("v") === adj("src"))
        .select(col("s"), adj("dst").as("v"), col("sigma"))
        .join(visited, Seq("s", "v"), "left_anti")
        .groupBy(col("s"), col("v"))
        .agg(sum(col("sigma")).as("sigma"))
      val nextT = Checkpoints.truncate(next)
      levels += nextT
      visited = Checkpoints.truncate(
        visited.unionByName(nextT.select(col("s"), col("v"))))
      d += 1
    }
    // backward accumulation: deltaCur holds δ for the level being consumed
    var deltaCur = levels(maxDepth).select(
      col("s"), col("v"), lit(0.0).as("delta"))
    var acc = deltaCur // deepest level's δ = 0: contributes nothing but keeps
    d = maxDepth       // every reached (s,v≠s) pair present in the output sum
    while (d >= 1) {
      val wlv = levels(d).join(deltaCur, Seq("s", "v"))
      val contrib = wlv.join(adj, wlv("v") === adj("src"))
        .select(col("s"), adj("dst").as("v"),
          col("sigma").as("sigma_w"), col("delta"))
        .join(levels(d - 1).select(col("s"), col("v"),
          col("sigma").as("sigma_u")), Seq("s", "v"))
        .groupBy(col("s"), col("v"))
        .agg(sum(col("sigma_u").cast("double") / col("sigma_w").cast("double")
          * (lit(1.0) + col("delta"))).as("delta"))
      val prev = levels(d - 1).select(col("s"), col("v"))
        .join(contrib, Seq("s", "v"), "left")
        .select(col("s"), col("v"), coalesce(col("delta"), lit(0.0)).as("delta"))
      deltaCur = Checkpoints.truncate(prev)
      if (d > 1) acc = acc.unionByName(deltaCur) // level 0 is v = s: excluded
      d -= 1
    }
    acc.groupBy(col("v").as("id"))
      .agg((sum(col("delta")) / 2.0).as("betweenness"))
  }

  /** Closeness + harmonic centrality within a bounded horizon:
    * (id, reached, closeness, harmonic) over undirected min-hop distances
    * d(v,·) ≤ maxDepth, where reached = |{u ≠ v : d ≤ maxDepth}|,
    * closeness = reached / Σ d(v,u) (the Wasserman–Faust form is
    * reached/(n-1) × this — callers scale), harmonic = Σ 1/d(v,u).
    * Harmonic is the form that stays meaningful on disconnected graphs
    * (Boldi–Vigna); both are exact when maxDepth ≥ the diameter, and the
    * bounded horizon is the standard web-scale relaxation otherwise.
    *
    * Shape: the same all-sources BFS as [[betweenness]]'s forward pass —
    * maxDepth rounds of frontier ⋈ adjacency with an anti-join, O(n·reached)
    * state, one final aggregation per source. At 10^12-edge scale run it
    * over a source sample or swap the exact BFS for HyperBall-style HLL
    * neighborhood sketches ([[graft.ops.Sketch.hllRegisters]] is the
    * register layer that approach needs).
    */
  def closeness(edges: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val adj = Checkpoints.truncate(sym(edges))
    var level = Checkpoints.truncate(adj.select(col("src").as("s")).distinct()
      .select(col("s"), col("s").as("v")))
    var visited = level
    // accumulate (s, dist) per reached v>0 level; distances are the level no.
    var acc = level.filter(lit(false)).withColumn("dist", lit(0))
    var d = 1
    while (d <= maxDepth) {
      val next = level.join(adj, level("v") === adj("src"))
        .select(col("s"), adj("dst").as("v")).distinct()
        .join(visited, Seq("s", "v"), "left_anti")
      val nextT = Checkpoints.truncate(next)
      level = nextT
      visited = Checkpoints.truncate(visited.unionByName(nextT))
      acc = acc.unionByName(nextT.withColumn("dist", lit(d)))
      d += 1
    }
    acc.groupBy(col("s").as("id")).agg(
      count(lit(1)).as("reached"),
      (count(lit(1)).cast("double") / sum(col("dist")).cast("double")).as("closeness"),
      sum(lit(1.0) / col("dist").cast("double")).as("harmonic"))
  }

  /** Weighted shortest distances from `seeds` under a bounded relaxation
    * horizon — Bellman–Ford as iterative joins: (id, wdist) with wdist the
    * minimum total edge weight over UNDIRECTED paths of at most `maxRounds`
    * hops (non-negative weights; exact SSSP whenever every optimal path
    * uses ≤ maxRounds edges — always true at maxRounds = n−1; the bounded
    * form is the scale contract, same stance as [[kHop]]/[[betweenness]]).
    *
    * Input edges carry (src, dst, w); each edge relaxes both directions.
    * Per round: frontier ⋈ adjacency, a min-aggregation per vertex, and a
    * keep-better merge into the label table — only IMPROVED labels re-enter
    * the frontier, so post-convergence rounds are empty joins. Integer
    * weights keep min-comparisons exact across engines (no float-tie
    * ambiguity in the oracle).
    */
  def weightedDistances(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val adj = Checkpoints.truncate(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"),
          col("w").cast("long").as("w")))
        .filter(col("src") =!= col("dst")).distinct())
    var best = Checkpoints.truncate(
      seeds.toDF("id").distinct().withColumn("wdist", lit(0L)))
    var frontier = best
    var r = 0
    while (r < maxRounds) {
      val cand = frontier.join(adj, frontier("id") === adj("src"))
        .select(adj("dst").as("id"), (col("wdist") + col("w")).as("cand"))
        .groupBy(col("id")).agg(min(col("cand")).as("cand"))
      val improved = cand.join(
          best.select(col("id").as("bid"), col("wdist").as("bw")),
          cand("id") === col("bid"), "left")
        .filter(col("bw").isNull || col("cand") < col("bw"))
        .select(col("id"), col("cand").as("wdist"))
      val impT = Checkpoints.truncate(improved)
      best = Checkpoints.truncate(
        best.join(impT.select(col("id").as("iid")),
          best("id") === col("iid"), "left_anti").unionByName(impT))
      frontier = impT
      r += 1
    }
    best
  }

  /** HyperBall (Boldi & Vigna, 2013): per-vertex HLL sketches of the
    * distance-≤d neighborhood balls — THE way closeness/harmonic scale to
    * 10^12 edges, replacing [[closeness]]'s exact O(n·reached) BFS state
    * with O(n · 2^p) register rows that never grow with ball size.
    *
    * regs_0(v) = HLL({v}); regs_d(v) = register-wise max of regs_{d-1}(v)
    * and every neighbor's regs_{d-1} — max-merge is exactly HLL union, so
    * regs_d(v) sketches B(v, d). One join + one max-aggregation per round;
    * every register derives from the same md5 hex arithmetic as
    * [[graft.ops.Sketch.hllRegistersBy]], so the whole recurrence is
    * deterministic and engine-replayable (the driver oracle re-runs it
    * register-identically in DuckDB).
    *
    * Returns the round-`maxDepth` sketches: (id, register, max_rho).
    */
  def hyperBall(edges: DataFrame, maxDepth: Int, p: Int = 8): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val adj = Checkpoints.truncate(sym(edges))
    val verts = adj.select(col("src").as("id")).distinct()
    var regs = Checkpoints.truncate(graft.ops.Sketch.hllRegistersBy(
      verts.withColumn("member", col("id")), Seq("id"), "member", p))
    var d = 1
    while (d <= maxDepth) {
      val nbr = regs.join(adj, regs("id") === adj("src"))
        .select(adj("dst").as("id"), col("register"), col("max_rho"))
      regs = Checkpoints.truncate(
        nbr.unionByName(regs)
          .groupBy(col("id"), col("register"))
          .agg(max(col("max_rho")).as("max_rho")))
      d += 1
    }
    regs
  }

  /** Approximate neighborhood function + harmonic centrality from the
    * [[hyperBall]] recurrence: (id, ball_est, harmonic_est) where ball_est
    * estimates |B(v, maxDepth)| (self included) and
    * harmonic_est ≈ Σ_u 1/d(v,u) via Σ_d (est_d − est_{d−1})/d. Per-round
    * shrinkage (estimates can wiggle at the linear-counting boundary even
    * though registers only grow) clamps to 0, per the paper. Standard error
    * per estimate ≈ 1.04/√2^p.
    */
  def hyperBallHarmonic(edges: DataFrame, maxDepth: Int, p: Int = 8): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val adj = Checkpoints.truncate(sym(edges))
    val verts = adj.select(col("src").as("id")).distinct()
    var regs = Checkpoints.truncate(graft.ops.Sketch.hllRegistersBy(
      verts.withColumn("member", col("id")), Seq("id"), "member", p))
    def estAt(d: Int) = graft.ops.Sketch.hllEstimateBy(regs, Seq("id"), p)
      .withColumn("d", lit(d))
    var ests = estAt(0)
    var d = 1
    while (d <= maxDepth) {
      val nbr = regs.join(adj, regs("id") === adj("src"))
        .select(adj("dst").as("id"), col("register"), col("max_rho"))
      regs = Checkpoints.truncate(
        nbr.unionByName(regs)
          .groupBy(col("id"), col("register"))
          .agg(max(col("max_rho")).as("max_rho")))
      ests = ests.unionByName(estAt(d))
      d += 1
    }
    val byId = Window.partitionBy(col("id")).orderBy(col("d"))
    ests
      .withColumn("growth",
        greatest(col("estimate") - lag(col("estimate"), 1).over(byId), lit(0.0)))
      .groupBy(col("id"))
      .agg(max(when(col("d") === maxDepth, col("estimate"))).as("ball_est"),
        sum(when(col("d") > 0, col("growth") / col("d"))).as("harmonic_est"))
  }
}
