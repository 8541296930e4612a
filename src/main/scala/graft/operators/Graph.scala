package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph centrality over edge frames — the link-analysis primitive of
  * corpus pipelines (page authority as a quality prior, à la the original
  * Common-Crawl PageRank filters). [EXT] — the reference has no graph
  * surface; this extends the dedup family's iterative-join discipline
  * ([[Dedup.connectedComponents]]) to value propagation.
  *
  * Scale shape (100 TB): ranks and edges are both corpus-sized frames —
  * each iteration is one shuffle-join of ranks onto edges keyed by `src`
  * plus one partial+final agg keyed by `dst`. Edge weight fractions are
  * precomputed ONCE and cached (the per-iteration join rides that same
  * partitioning), ranks are lineage-truncated per round (localCheckpoint,
  * the CC discipline), and the iteration count is a fixed small constant —
  * there is no O(diameter) dependence.
  *
  * Engine-parity discipline: the per-node contribution sum is a float
  * reduction whose order Spark's partial aggregation does not fix — each
  * contribution is cast to DECIMAL(27,12) (deterministic per-value
  * rounding) and summed EXACTLY, then the damped update is rounded to 9
  * (q82/q91 discipline), so every iteration's ranks are bit-identical in
  * any engine computing the same formula.
  */
object Graph {

  /** Weighted PageRank: `edges` is `(src, dst, w)` with multi-edge counts
    * as weights; a node's mass splits across out-edges in proportion to
    * `w`. Dangling mass is not redistributed (documented simplification —
    * ranks then sum to < 1; the standard fix is one extra agg per round).
    * Returns `(node, rank)` after `iters` damped rounds from a uniform
    * start. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    // out-weight per src, joined once: frac = w/wout rides every iteration
    val wout = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val frac = Dedup.cacheScoped(
      edges.join(wout, Seq("src"))
        .select(col("src"), col("dst"),
          (col("w").cast("double") / col("wout").cast("double")).as("frac")))
    val nodes = Dedup.cacheScoped(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct())
    // N as a broadcast scalar (q64 discipline — never a driver collect)
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), col("n_nodes"), round(lit(1.0) / col("n_nodes"), 9).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(frac, ranks("node") === frac("src"))
        .select(col("dst"), (col("rank") * col("frac")).cast(DecimalType(27, 12)).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = ranks.join(contrib, ranks("node") === contrib("dst"), "left")
        .select(col("node"), col("n_nodes"),
          round((lit(1.0) - lit(damping)) / col("n_nodes") +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 9).as("rank"))
        .localCheckpoint(true) // truncate lineage: plan depth stays O(1) per round
    }
    ranks.select(col("node"), col("rank"))
  }
}
