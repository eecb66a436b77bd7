package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration, integer-exact PageRank over an edge relation — the
  * iterative-graph-compute extension of the relational surface (nothing in
  * the reference iterates; this is the standard Pregel-on-DataFrames shape
  * expressed declaratively so Catalyst plans every superstep).
  *
  * All arithmetic is scaled-integer (rank × `scale`, damping × 100, floor
  * division), so results are bit-exact across engines and oracle-replayable —
  * no floating-point drift between Spark and the SQL mirror.
  *
  * Scale shape: each iteration is one hash join (ranks ⋈ edges, both keyed on
  * the source vertex) plus one aggregation exchange on the destination — the
  * canonical message-passing superstep. The vertex set and degree relation
  * are derived once. Iterations are a FIXED small count driven from the plan
  * builder (no driver-side data movement, no collect); at 100 TB the edge
  * relation would be persisted/bucketed on `src` once so every superstep
  * reuses the layout instead of re-scanning (documented trade here: the test
  * graphs re-derive it per iteration, keeping the query self-contained).
  */
object PageRank {

  /** @param edges directed edges `(src: long, dst: long)`; deduplicated
    *              internally so parallel edges do not double-weight.
    * @return `(node, rank_s)` — rank scaled by `scale`, exact integers.
    */
  def run(edges: DataFrame, iters: Int = 3, dampX100: Long = 85L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && dampX100 >= 0 && dampX100 <= 100)
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val eDeg = e.join(deg, "src")
    // Vertex set = distinct sources. Callers supplying one-directional edge
    // lists must union the reverse direction themselves if sinks should hold
    // rank (a sink node never re-emits mass — the usual dangling-node rule).
    val nodes = e.select(col("src").as("node")).distinct()
    val nn = nodes.agg(count(lit(1)).as("N"))
    val base = expr(s"(CAST($scale AS BIGINT) * ${100 - dampX100}) DIV (100 * N)")
    var ranks = nodes.crossJoin(nn)
      .select(col("node"), expr(s"CAST($scale AS BIGINT) DIV N").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(eDeg, col("node") === col("src"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes.crossJoin(nn)
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (base + expr(s"($dampX100 * coalesce(cin, 0)) DIV 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_s"))
  }
}
