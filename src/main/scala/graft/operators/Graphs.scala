package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph primitives over edge-list DataFrames, complementing
  * [[Dedup.clusterLabels]] / [[Dedup.memberLabels]] (dedup clusters) and
  * the PageRank query (Ext8Queries): triangle counting via the oriented
  * two-path join.
  *
  * Scale posture: the classic distributed triangle count (Suri & Vassilvitskii
  * 2011, "Counting Triangles and the Curse of the Last Reducer") orients
  * every edge from its lower-degree endpoint to its higher-degree endpoint,
  * which bounds each node's out-degree by O(sqrt(|E|)) — the two-path
  * self-join then generates O(|E|^1.5) candidates total instead of
  * O(max_degree^2) on hub nodes. Both joins are plain shuffled equi-joins on
  * node ids, so the operator is one wide stage regardless of cluster size.
  */
object Graphs {

  /** Count triangles in an undirected simple graph given as (u, v) edge rows.
    * Input edges may be in either orientation and may contain duplicates;
    * self-loops are dropped. Returns one row: (n_nodes, n_edges,
    * n_triangles).
    */
  def triangleCount(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    // canonicalize: undirected simple graph, u < v
    val e = edges
      .select(least(col(uCol), col(vCol)).as("u"), greatest(col(uCol), col(vCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false) // three consumers below, one materialization
    // degree-based orientation: lower-degree endpoint -> higher-degree
    // endpoint (ties by node id), bounding out-degrees at O(sqrt(|E|))
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // each edge carries its dst's degree so the two-path pair below can be
    // canonicalized by ORIENTATION order — then the closing edge, if it
    // exists, is oriented a->b and the closure is a pure equi-join (an OR
    // over both directions would plan as a cartesian product)
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), Seq("u"))
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), Seq("v"))
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"),
        when(fwd, col("dv")).otherwise(col("du")).as("dstDeg"))
      .localCheckpoint(eager = false)
    // two-paths src->a, src->b with a before b in orientation order,
    // closed by the (necessarily a->b oriented) edge
    val p = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dstDeg") < col("e2.dstDeg") ||
            (col("e1.dstDeg") === col("e2.dstDeg") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("a"), col("e2.dst").as("b"))
    val closed = p.join(oriented.as("e3"),
      col("a") === col("e3.src") && col("b") === col("e3.dst"))
    // three scalar aggregates cross-joined (all single-row) — fully
    // declarative, no driver-side actions, one inspectable plan
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  /** Multi-hop reachability over a DIRECTED edge list — the recursive-CTE
    * shape (`WITH RECURSIVE`) Spark SQL does not parse, re-expressed as the
    * standard distributed BFS: level-synchronous frontier expansion with an
    * anti-join against the visited set, so each (src, dst) pair is labeled
    * with its MINIMUM hop count on first discovery. Returns (src, dst, hops)
    * for every pair reachable within `maxDepth` hops (hops >= 1; self-pairs
    * appear only if a cycle returns to the source).
    *
    * Scale posture: `maxDepth` wide stages, each a shuffled equi-join of the
    * current frontier against the edge list plus one anti-join against the
    * accumulated visited set — never an all-pairs product, and the frontier
    * monotonically shrinks on any graph whose k-hop closure saturates. Each
    * level is localCheckpoint'd (lazy) so the three consumers (union,
    * anti-join build, next join probe) share one materialization and the
    * unrolled lineage never re-executes earlier levels. FAULT-TOLERANCE
    * TRADE-OFF: localCheckpoint truncates lineage into NON-replicated
    * executor storage — on a long-running multi-thousand-executor job where
    * executor loss is routine, losing a holder of a checkpointed level
    * fails the job; swap `cp` for reliable `checkpoint()` (HDFS/object
    * store) or `persist(MEMORY_AND_DISK_2)` there, paying the write for
    * recoverability. At 1000-executor
    * scale the visited set for a social-scale graph is the memory bound;
    * the anti-join shuffles on (src, dst) and AQE handles frontier skew
    * (hub nodes) with no driver-side state beyond the loop counter.
    */
  def reachability(edges: DataFrame, srcCol: String, dstCol: String,
      maxDepth: Int, checkpointLevels: Boolean = true): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1: $maxDepth")
    // `checkpointLevels = false` keeps the whole unrolled lineage in ONE
    // inspectable plan (the PlanSpec pin); production keeps the default so
    // each level materializes once
    def cp(df: DataFrame): DataFrame =
      if (checkpointLevels) df.localCheckpoint(eager = false) else df
    val e = cp(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()) // probed at every level
    var visited = cp(e.withColumn("hops", lit(1)))
    var frontier: DataFrame = e
    for (k <- 2 to maxDepth) {
      val next = cp(frontier.as("f")
        .join(e.as("n"), col("f.dst") === col("n.src"))
        .select(col("f.src").as("src"), col("n.dst").as("dst"))
        .distinct()
        .join(visited.select("src", "dst"), Seq("src", "dst"), "left_anti"))
      visited = cp(visited.unionByName(next.withColumn("hops", lit(k))))
      frontier = next
    }
    visited.withColumn("hops", col("hops").cast("long"))
  }

  /** Adamic–Adar link prediction: for every NON-adjacent node pair (a, b)
    * sharing at least one neighbor, score = Σ_z 1/ln(deg(z)) over shared
    * neighbors z (deg(z) ≥ 2 whenever z is shared, so ln is safe). Returns
    * (u, v, common, aa_score) with u < v.
    *
    * Scale posture: candidate pairs come from the wedge join (adjacency
    * self-joined on the center z), which is O(Σ deg(z)²) — the same hub
    * blow-up the triangle count dodges with degree orientation. Orientation
    * can't help here (both wedge endpoints are outputs, not probes), so the
    * standard mitigation at 100 TB is capping the center degree: pairs
    * through a hub with deg(z) > maxCenterDegree contribute at most
    * 1/ln(maxCenterDegree) each — numerically negligible exactly when the
    * cap is high — and are dropped with the hub. Pass maxCenterDegree =
    * Int.MaxValue for exact scores on bounded graphs (the default used by
    * the oracle-gated query).
    */
  def adamicAdar(edges: DataFrame, uCol: String, vCol: String,
      maxCenterDegree: Int = Int.MaxValue): DataFrame = {
    val e = edges
      .select(least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false) // adjacency + anti-join both read it
    val adj = e.select(col("u").as("z"), col("v").as("n"))
      .unionAll(e.select(col("v").as("z"), col("u").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxCenterDegree)
    // wedge a—z—b with a < b; the center carries its degree weight.
    // round-13 fix: the cap must bind BEFORE the self-join — with CBO off
    // Catalyst keeps the written inner-join order, so capping after it
    // would still materialize every O(deg²) hub wedge and only then drop
    // them. Joining the (filtered) degree table into the adjacency first
    // makes a capped hub contribute zero wedge rows.
    val cappedAdj = adj.join(deg, "z")
    val wedges = cappedAdj.as("l")
      .join(cappedAdj.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("wu"), col("r.n").as("wv"),
        (lit(1.0) / log(col("l.d").cast("double"))).as("w"))
    wedges
      .groupBy(col("wu").as("u"), col("wv").as("v"))
      .agg(count(lit(1)).as("common"), round(sum(col("w")), 6).as("aa_score"))
      // link PREDICTION: only pairs not already connected
      .join(e, Seq("u", "v"), "left_anti")
  }
}
