package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation as repeated edge-keyed joins.
  *
  * PageRank (Brin & Page 1998) over an edge list is the canonical
  * "iterate a join until convergence" workload: each round every node
  * splits its rank mass over its out-edges and collects the mass
  * arriving on its in-edges, damped toward a uniform restart. On a
  * cluster each round is ONE shuffle: edges join the (node, rank, deg)
  * relation on the source key, the contributions hash-aggregate on the
  * destination key. The edge relation — the only data-sized input — is
  * cached once and re-partitioned by source ONCE; every iteration
  * reuses that layout, so the per-round cost is a rank-sized (not
  * edge-sized) shuffle plus an edge-sized map.
  *
  * Arithmetic is INTEGER mass, not floating point: ranks start at
  * `initMass` integer units and every step is `div` (integral
  * division) and integer multiply. Float PageRank sums partition-order
  * dependent doubles — two runs of the same query can disagree in the
  * last ulp, and a distributed run disagrees with any single-node
  * reference. Integer mass makes every iteration bit-exact and
  * engine-independent: the same unrolled arithmetic in any SQL engine
  * reproduces the ranks exactly. (Mass truncated by `div` leaks out of
  * the system rather than redistributing — the standard trade of the
  * exact formulation; ordering is unaffected because every node
  * truncates the same way.)
  *
  * Overflow headroom: total system mass stays ≤ nodes·initMass, and the
  * damping multiply is the largest intermediate — keep
  * nodes·initMass·dampNum below 2⁶³ (the default 1e10 units leaves
  * ~10⁷ nodes × 85 a 100× margin; drop initMass for larger graphs).
  */
object Graph {

  /** Damped PageRank over an UNDIRECTED edge list, exact in integer
    * mass units.
    *
    * `edges` rows are (srcCol, dstCol) pairs of BIGINT node ids from
    * disjoint or shared namespaces; duplicate pairs are collapsed, and
    * each undirected edge contributes both directions. A self-loop
    * (u, u) counts ONCE in deg(u) and contributes once (both of its
    * directions are the same row, collapsed by the distinct) — callers
    * mapping two key spaces into one id space must keep them disjoint
    * (e.g. `-(k+1)` for 0-based keys, since `-0 == 0`) or accidental
    * self-loops quietly reshape the merged node's mass flow. Every node
    * starts with `initMass` units; each of `iters` rounds computes
    *
    *   rank'(v) = initMass·(den−num)/den  +  num/den · Σ_{u~v} rank(u) div deg(u)
    *
    * with all products and divisions in integer arithmetic
    * (num/den = damping, default 85/100).
    *
    * Output: (node, rank, deg) for the `topK` nodes by
    * (rank desc, node asc), ordered.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, topK: Int = 30, initMass: Long = 10000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // undirected: both directions, duplicates collapsed — one distinct
    // (one shuffle), then cached and source-partitioned for reuse by
    // every iteration
    val adj = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .cache()
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val base = initMass * (dampDen - dampNum) / dampDen
    var ranks = deg.select(col("node"), lit(initMass).as("rank"), col("deg"))
    for (_ <- 1 to iters) {
      // per-edge contribution rank div deg, hash-aggregated on the
      // destination — the rank relation is node-sized, so this join's
      // shuffle is rank-sized; the edge side reuses its cached layout
      val contrib = adj
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("`rank` div `deg`").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__m"))
      // every node has deg >= 1 in an undirected edge list, so the
      // inner join back to deg loses nothing
      // Column `/` on longs is DOUBLE division — the damping multiply
      // must stay integral (`div`) to keep the iteration bit-exact
      ranks = deg.join(contrib.withColumnRenamed("dst", "node"), "node")
        .select(col("node"),
          (lit(base) + expr(s"__m * $dampNum div $dampDen")).as("rank"),
          col("deg"))
    }
    ranks.orderBy(col("rank").desc, col("node")).limit(topK)
  }
}
