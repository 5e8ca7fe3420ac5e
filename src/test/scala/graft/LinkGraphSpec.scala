package graft

import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Pins the integer-grid PageRank (graph/LinkGraph.scala): hand-computed
  * ranks on a 3-node cycle-with-chord, dangling/teleport-only behavior,
  * and checkpointEvery's bit-identity with the pure-plan path. */
class LinkGraphSpec extends SparkSpec {

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      checkpointEvery: Int = 0): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.pageRank(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst",
      iters = iters, scale = 1000L, checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // 0→{1,2}, 1→2, 2→0; scale 1000 → r0=333, teleport=(15·333)/100=49.
  // iter1: in = (333, 166, 499) → r = (332, 190, 473)
  // iter2: in = (473, 166, 356) → r = (451, 190, 351)
  private val triEdges = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L)

  test("pageRank: hand-computed 2-iteration ranks on the 3-node grid") {
    assert(ranks(Seq(0L, 1L, 2L), triEdges, iters = 1) ==
      Map(0L -> 332L, 1L -> 190L, 2L -> 473L))
    assert(ranks(Seq(0L, 1L, 2L), triEdges, iters = 2) ==
      Map(0L -> 451L, 1L -> 190L, 2L -> 351L))
  }

  test("pageRank: no in-links → teleport only; dangling node's mass leaks") {
    // 0→1 only: node 0 keeps teleport 75; node 1 gets 75 + (85·500)/100.
    assert(ranks(Seq(0L, 1L), Seq(0L -> 1L), iters = 1) ==
      Map(0L -> 75L, 1L -> 500L))
  }

  test("pageRank: checkpointEvery truncates lineage without changing a digit") {
    assert(ranks(Seq(0L, 1L, 2L), triEdges, iters = 3, checkpointEvery = 1) ==
      ranks(Seq(0L, 1L, 2L), triEdges, iters = 3))
  }

  test("pageRank: total mass stays within quantization loss of scale") {
    val total = ranks(Seq(0L, 1L, 2L), triEdges, iters = 4).values.sum
    // every node has out-links here, so only integer truncation leaks:
    // < 1 unit per division, a handful of divisions per iteration
    assert(total <= 1000L && total > 950L)
  }
}
