package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl prioritization — the step between
  * WARC ingestion (q147) and corpus curation: Common Crawl publishes
  * exactly this artifact (host/domain-level PageRank + harmonic
  * centrality over the webgraph) to decide what to crawl and what to
  * keep, and quality-filtering recipes use link-graph rank as a
  * document prior (Page et al. 1999; the cc-webgraph releases).
  *
  * All rank arithmetic runs on a FIXED-POINT INTEGER GRID (micro-rank
  * units, `scale` per unit of total mass), the q129 LM-perplexity
  * trick: BIGINT sums are associative-exact, so the result is
  * bit-identical across engines, partitionings, and retries — a
  * floating-point PageRank would hash-differ per shuffle order and be
  * untestable against an external oracle.
  */
object LinkGraph {

  /** Damped PageRank over `edges`, `iters` synchronous power
    * iterations from a uniform start. Returns (idCol, rank_micro:
    * long) — rank in `scale`-ths of the total mass.
    *
    * Integer grid: r0 = scale/N; each iteration computes, per node v,
    *   r'(v) = ((100-dampingPct)·r0)/100 + (dampingPct·Σ_{u→v} r(u)/deg(u))/100
    * with EVERY division an integral `div` — truncation loses < 1
    * micro-unit per term, a deliberate, deterministic quantization
    * (the published float algorithm's values differ by < 1e-9 of
    * total mass). Edges pointing outside `nodes` leak their mass
    * (dropped by the node-side join); nodes without in-links keep the
    * teleport term only.
    *
    * Scale shape: one bounded scalar read (N — the watermark-read
    * exception), then per iteration exactly two shuffles — edges join
    * ranks on src (bucket/pre-partition edges by src in production
    * and the edge side of every iteration is exchange-free) and one
    * sum groupBy on dst whose MAP-SIDE PARTIALS collapse in-link
    * skew (a node with 10^9 in-links receives one partial per task,
    * the q90 groupBy argument). Rank rows are 16 bytes — the wide
    * payload (page text) never enters the loop. `checkpointEvery`
    * truncates lineage for deep iteration counts (leave 0 for a pure
    * plan: at the default 3 iterations the tree is shallow).
    */
  def pageRank(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000000000L, dampingPct: Int = 85,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct in [0,100], got $dampingPct")
    val n = nodes.select(col(idCol)).distinct().count()
    // empty graph → empty ranks (schema preserved), not a crash
    if (n == 0)
      return nodes.select(col(idCol)).withColumn("rank_micro", lit(0L))
    val r0 = scale / n
    val teleport = (100L - dampingPct) * r0 / 100L
    val deg = edges.groupBy(col(srcCol).as("_src")).agg(count(lit(1)).as("_deg"))
    val edgesDeg = edges
      .select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .join(deg, "_src")
    var ranks = nodes.select(col(idCol).as("_v")).withColumn("_r", lit(r0))
    var i = 1
    while (i <= iters) {
      val in = edgesDeg.join(ranks, col("_src") === col("_v"))
        .select(col("_dst"), expr("_r div _deg").as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_in"))
      ranks = nodes.select(col(idCol).as("_v"))
        .join(in, col("_v") === col("_dst"), "left")
        .select(col("_v"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(_in, 0L)) div 100")).as("_r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks.select(col("_v").as(idCol), col("_r").as("rank_micro"))
  }
}
