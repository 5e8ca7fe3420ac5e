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

  private def harmonic(nodes: Seq[Long], edges: Seq[(Long, Long)],
      radius: Int, scale: Long = 1000L): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.harmonicCentrality(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst",
      radius = radius, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // tri-graph distances: d(1,0)=2 d(2,0)=1 | d(0,1)=1 d(2,1)=2 | d(0,2)=d(1,2)=1
  test("harmonicCentrality: hand-computed radius-3 values on the 3-node graph") {
    assert(harmonic(Seq(0L, 1L, 2L), triEdges, radius = 3) ==
      Map(0L -> 1500L, 1L -> 1500L, 2L -> 2000L))
  }

  test("harmonicCentrality: radius 1 truncates to direct in-links; isolated node scores 0") {
    assert(harmonic(Seq(0L, 1L, 2L), triEdges, radius = 1) ==
      Map(0L -> 1000L, 1L -> 1000L, 2L -> 2000L))
    // node 3 has no in-links within any radius
    assert(harmonic(Seq(0L, 1L, 2L, 3L), triEdges, radius = 3)(3L) == 0L)
  }

  test("harmonicCentrality: self-loops and duplicate edges never contribute") {
    val noisy = triEdges ++ Seq(0L -> 0L, 0L -> 1L, 2L -> 2L)
    assert(harmonic(Seq(0L, 1L, 2L), noisy, radius = 3) ==
      harmonic(Seq(0L, 1L, 2L), triEdges, radius = 3))
  }

  test("harmonicApprox: HyperBall sparse-regime estimates equal the exact grid") {
    import spark.implicits._
    // the q151/q152 fixture shape at N=20: i -> (31i + 7j) mod 20
    val n = 20L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => (1L to (i % 3 + 1)).map(j => i -> ((i * 31 + 7 * j) % n)))
    val exact = harmonic(nodes, edges, radius = 3, scale = 1000000L)
    val approx = LinkGraph.harmonicApprox(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst", radius = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    // sparse-regime sketches are exact, so the only gap is the exact
    // side's integer grid (1/3 → 0.333333): < 1 micro-unit per pair
    for ((v, h) <- approx)
      assert(math.abs(h - exact(v) / 1e6) < 1e-4,
        s"node $v: hyperball $h vs exact ${exact(v) / 1e6}")
  }

  test("harmonicFromStore: row-identical to the raw-edge path, multi-edges and self-loops collapsed") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L)
    // parallel edges + a self-loop: the store carries n_links > 1 rows,
    // which must collapse exactly as raw duplicates do
    val noisy = triEdges ++ Seq(0L -> 1L, 0L -> 1L, 2L -> 2L, 1L -> 3L)
    val store = LinkGraph.adjacencyStore(noisy.toDF("src", "dst"), "src", "dst")
    assert(store.filter(col("n_links") > 1).count() > 0, "fixture must carry multi-edges")
    val viaStore = LinkGraph.harmonicFromStore(nodes.toDF("id"), "id", store,
      radius = 3, scale = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStore == harmonic(nodes, noisy, radius = 3))
  }

  test("hyperBallGrow: a persisted radius-1 state resumes to the cold radius-3 values — the warm-start contract") {
    import spark.implicits._
    val n = 20L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => (1L to (i % 3 + 1)).map(j => i -> ((i * 31 + 7 * j) % n)))
    val store = LinkGraph.adjacencyStore(edges.toDF("src", "dst"), "src", "dst")
    def hm(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select(col("id"), col("harmonic"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cold = LinkGraph.harmonicApproxFromStore(nodes.toDF("id"), "id", store, radius = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // raw-edge harmonicApprox and the store path agree (multiplicity collapses)
    val rawEdge = LinkGraph.harmonicApprox(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst", radius = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cold == rawEdge)
    // publish the radius-1 state THROUGH PARQUET (the persistability
    // claim is the contract: the HLL ball serializes as bytes), then
    // resume radii 2..3 from the re-read frame
    val r1 = LinkGraph.hyperBallGrow(
      LinkGraph.hyperBallInit(nodes.toDF("id"), "id"), "id", store, 1, 1)
    val dir = java.nio.file.Files.createTempDirectory("hyperball").toString
    r1.write.mode("overwrite").parquet(dir)
    val resumed = LinkGraph.hyperBallGrow(spark.read.parquet(dir), "id", store, 2, 3)
    assert(hm(resumed) == cold)
    // zero-step grow is the identity on the harmonic column
    assert(hm(LinkGraph.hyperBallGrow(r1, "id", store, 2, 1)) == hm(r1))
  }

  private def triangles(nodes: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    LinkGraph.triangleCounts(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("triangleCounts: 4-clique — every node 3 triangles, clustering 1.0") {
    val k4 = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L, 1L -> 3L, 2L -> 3L)
    val got = triangles(Seq(0L, 1L, 2L, 3L), k4)
    for (v <- 0L to 3L) assert(got(v) == ((3L, 3L, 1.0)), s"node $v: ${got(v)}")
  }

  test("triangleCounts: triangle + pendant + isolated node") {
    // 0-1-2 triangle, 2-3 pendant, 4 isolated (in nodes, no edges)
    val got = triangles(Seq(0L, 1L, 2L, 3L, 4L),
      Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L))
    assert(got(0L) == ((2L, 1L, 1.0)))
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((3L, 1L, 2.0 / 6.0)))
    assert(got(3L) == ((1L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("triangleCounts: direction, duplicates and self-loops never change counts") {
    val clean = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val noisy = clean ++ Seq(1L -> 0L, 0L -> 1L, 2L -> 2L, 0L -> 0L)
    assert(triangles(Seq(0L, 1L, 2L), noisy) == triangles(Seq(0L, 1L, 2L), clean))
  }

  test("triangleCounts: degree-skewed star has zero triangles") {
    // a hub with 6 spokes and no spoke-spoke edges: the wedge join must
    // orient every edge AWAY from the spokes (degree order), so the hub
    // generates no wedges and the count is 0 everywhere
    val star = (1L to 6L).map(i => 0L -> i)
    val got = triangles(0L to 6L, star)
    assert(got(0L) == ((6L, 0L, 0.0)))
    for (v <- 1L to 6L) assert(got(v) == ((1L, 0L, 0.0)))
  }

  test("anchorText: normalization, counts, rank order, shares; null/empty dropped") {
    import spark.implicits._
    val edges = Seq(
      (1L, 10L, " Click  HERE "), (2L, 10L, "click here"), (3L, 10L, "docs"),
      (4L, 10L, null.asInstanceOf[String]), (5L, 10L, ""),
      (6L, 11L, "a"), (7L, 11L, "b"), (8L, 11L, "b"))
      .toDF("src", "dst", "anchor")
    val got = LinkGraph.anchorText(edges, "src", "dst", "anchor", topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == Set(
      (10L, "click here", 2L, 1L, 3L, 2.0 / 3.0),
      (10L, "docs", 1L, 2L, 3L, 1.0 / 3.0),
      (11L, "b", 2L, 1L, 3L, 2.0 / 3.0),
      (11L, "a", 1L, 2L, 3L, 1.0 / 3.0)))
  }

  test("anchorText: topK cuts below the rank; count ties break anchor-ascending") {
    import spark.implicits._
    val edges = Seq((1L, 9L, "zz"), (2L, 9L, "aa"), (3L, 9L, "mm"))
      .toDF("src", "dst", "anchor")
    val got = LinkGraph.anchorText(edges, "src", "dst", "anchor", topK = 2)
      .collect().map(r => (r.getString(1), r.getLong(3))).toSet
    assert(got == Set(("aa", 1L), ("mm", 2L))) // zz ranks 3rd, cut
  }

  private def lpa(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      checkpointEvery: Int = 0): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.labelPropagation(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst",
      iters = iters, checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // two triangles bridged at 2-3: hand-traced sweeps
  //   l1 = (1,0,0,2,3,3), l2 = (0,0,0,3,2,2), l3 = (0,0,0,2,2,2)
  private val twoTris = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L,
    3L -> 4L, 4L -> 5L, 5L -> 3L, 2L -> 3L)

  test("labelPropagation: bridged triangles converge to two communities") {
    assert(lpa(0L to 5L, twoTris, iters = 2) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
    assert(lpa(0L to 5L, twoTris, iters = 3) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("labelPropagation: isolated node keeps its own label; ties take the min") {
    val got = lpa(0L to 6L, twoTris, iters = 3)
    assert(got(6L) == 6L)
    // star tie-break: node 0's neighbors {1,2} each vote once → min label 1
    assert(lpa(0L to 2L, Seq(0L -> 1L, 0L -> 2L), iters = 1) ==
      Map(0L -> 1L, 1L -> 0L, 2L -> 0L))
  }

  test("labelPropagation: direction, duplicates, self-loops and checkpointing are inert") {
    val noisy = twoTris ++ Seq(1L -> 0L, 2L -> 1L, 0L -> 0L, 4L -> 4L)
    assert(lpa(0L to 5L, noisy, iters = 3) == lpa(0L to 5L, twoTris, iters = 3))
    assert(lpa(0L to 5L, twoTris, iters = 3, checkpointEvery = 1) ==
      lpa(0L to 5L, twoTris, iters = 3))
  }

  test("contractTo: page edges roll up to weighted host pairs, loops drop (or stay on demand)") {
    import spark.implicits._
    // pages 0..5 on hosts page%3; edges chosen so host pair (h0,h1)
    // carries 2 page links, (h1,h2) carries 1, and 2->5 is intra-host
    val edges = Seq(0L -> 1L, 3L -> 4L, 1L -> 2L, 2L -> 5L).toDF("src", "dst")
    val host = (c: org.apache.spark.sql.Column) => concat(lit("h"), c % 3)
    val got = LinkGraph.contractTo(edges, "src", "dst", host)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("h0", "h1") -> 2L, ("h1", "h2") -> 1L))
    val withLoops = LinkGraph.contractTo(edges, "src", "dst", host, dropLoops = false)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(withLoops(("h2", "h2")) == 1L && withLoops.values.sum == 4L)
  }

  test("hits: hand-computed 2-round hub/authority on the 3-node graph") {
    import spark.implicits._
    // 1->3, 2->3, 3->1: node 3 is the authority, nodes 1/2 the hubs.
    // Hand trace on the micro grid (scale = 10^6, n = 3, h0 = 333333):
    //   round 1: au = {3: 666666, 1: 333333}, tot 999999
    //            a1 = {3: 666666·10^6 div 999999 = 666666, 1: 333333, 2: 0}
    //            hu = {1: 666666, 2: 666666, 3: 333333}, tot 1666665
    //            h1 = {1: 400000 (exact), 2: 400000, 3: 200000 (exact)}
    //   round 2: au = {3: 800000, 1: 200000}, tot 1000000
    //            a2 = {3: 800000, 1: 200000, 2: 0}
    //            hu = {1: 800000, 2: 800000, 3: 200000}, tot 1800000
    //            h2 = {1: 444444, 2: 444444, 3: 111111}
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq(1L -> 3L, 2L -> 3L, 3L -> 1L).toDF("src", "dst")
    val got = LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((444444L, 200000L)),
      2L -> ((444444L, 0L)),
      3L -> ((111111L, 800000L))))
    // checkpointing is value-inert
    val ck = LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 2,
      checkpointEvery = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ck == got)
  }

  test("hits: edgeless graph scores all zero after one round; empty graph keeps the schema") {
    import spark.implicits._
    val nodes = Seq(1L, 2L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = LinkGraph.hits(nodes, "id", empty, "src", "dst", iters = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.forall(_ == ((0L, 0L))))
    val none = LinkGraph.hits(nodes.filter(col("id") < 0), "id", empty, "src", "dst")
    assert(none.count() == 0 &&
      none.columns.sameElements(Array("id", "hub_micro", "auth_micro")))
  }

  test("adjacencyStore: merge == build-of-union with additive multi-edge counts") {
    import spark.implicits._
    val a = Seq(1L -> 2L, 1L -> 2L, 2L -> 3L).toDF("src", "dst")
    val b = Seq(1L -> 2L, 3L -> 1L).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val merged = LinkGraph.mergeAdjacency(
      LinkGraph.adjacencyStore(a, "src", "dst"), b, "src", "dst")
    assert(rows(merged) == rows(LinkGraph.adjacencyStore(a.unionAll(b), "src", "dst")))
    assert(rows(merged) == Set((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 1L)))
  }

  test("pageRankFromStore: bit-identical to the raw-edge pageRank, multi-edges included") {
    import spark.implicits._
    val nodes = (0L to 6L).toDF("id")
    // duplicate edges exercise the n_links-weighted flow
    val edges = Seq(0L -> 1L, 0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 2L,
      4L -> 5L, 5L -> 4L, 6L -> 0L, 0L -> 3L).toDF("src", "dst")
    def rank(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStore = LinkGraph.pageRankFromStore(nodes, "id",
      LinkGraph.adjacencyStore(edges, "src", "dst"), iters = 4)
    assert(rank(viaStore) ==
      rank(LinkGraph.pageRank(nodes, "id", edges, "src", "dst", iters = 4)))
  }

  test("warm-start pageRank: start-independent fixed point; warm seed strictly closer per round") {
    import spark.implicits._
    val nodes = (0L to 9L).toDF("id")
    // genuinely asymmetric flow (NOT a permutation, and no accidental
    // conservation: a cycle plus three extra half-mass edges into node
    // 0 leaves nodes 2/5/8 under-fed and node 0 over-fed) — uniform is
    // NOT the fixed point, so the warm seed differs from a cold start
    val oldEdges = ((0L to 9L).map(i => i -> ((i + 1) % 10)) ++
      Seq(1L, 4L, 7L).map(i => i -> 0L)).toDF("src", "dst")
    val oldStore = LinkGraph.adjacencyStore(oldEdges, "src", "dst").localCheckpoint(true)
    val (oldFp0, _) = LinkGraph.pageRankFixedPoint(nodes, "id", oldStore)
    val oldFp = oldFp0.localCheckpoint(true)
    // today's batch: two new edges perturb the graph
    val batch = Seq(0L -> 5L, 7L -> 2L).toDF("src", "dst")
    val store = LinkGraph.mergeAdjacency(oldStore, batch, "src", "dst")
      .localCheckpoint(true)
    def rank(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (coldFp, _) = LinkGraph.pageRankFixedPoint(nodes, "id", store)
    val (warmFp, _) = LinkGraph.pageRankFixedPoint(nodes, "id", store,
      seed = Some(oldFp))
    // the contraction's absorbing state is start-independent
    val fp = rank(coldFp)
    assert(rank(warmFp) == fp)
    // the warm-start payoff: after the SAME few rounds, the warm run
    // sits strictly closer to the fixed point than the cold run —
    // i.e. a tolerance stop fires earlier from a warm seed
    def l1(df: org.apache.spark.sql.DataFrame) =
      rank(df).map { case (v, r) => math.abs(r - fp(v)) }.sum
    val warm5 = LinkGraph.pageRankFromStore(nodes, "id", store, iters = 5,
      seed = Some(oldFp))
    val cold5 = LinkGraph.pageRankFromStore(nodes, "id", store, iters = 5)
    assert(l1(warm5) < l1(cold5),
      s"warm must be closer after 5 rounds: warm ${l1(warm5)} vs cold ${l1(cold5)}")
    // tolerance stop: never MORE rounds from the warm seed (strictly
    // fewer needs a perturbation small relative to the graph — a
    // 10-node toy's round count is too coarse; the strict speed claim
    // is the L1 assertion above)
    val (_, rTol) = LinkGraph.pageRankFixedPoint(nodes, "id", store,
      tolMicro = 1000000000L, seed = Some(oldFp))
    val (_, rColdTol) = LinkGraph.pageRankFixedPoint(nodes, "id", store,
      tolMicro = 1000000000L)
    assert(rTol <= rColdTol,
      s"warm tolerance stop must never fire later: $rTol vs $rColdTol")
  }

  test("hits: n > scale floors the uniform init at 1 instead of underflowing to all-zero") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq(1L -> 3L, 2L -> 3L, 3L -> 1L).toDF("src", "dst")
    // scale = 2 < n = 3: scale/n truncates to 0 — the old init zeroed
    // every score silently. Hand trace with init 1: au={3:2,1:1} tot 3
    // → a1={3: 2·2 div 3 = 1, 1: 0, 2: 0}; hu={1:1,2:1} tot 2 →
    // h1={1:1,2:1,3:0}.
    val got = LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 1, scale = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 0L)), 2L -> ((1L, 0L)), 3L -> ((0L, 1L))))
  }

  test("labelPropagation: string node ids (contractTo host graphs) — tie-break never negates the label") {
    import spark.implicits._
    // the twoTris communities, relabeled onto string host ids: the doc
    // on contractTo promises every analytic incl. LPA runs unchanged
    // on its (string, string, weight) output
    val ids = (0L to 5L).map(i => s"host$i")
    val edges = twoTris.map { case (a, b) => (s"host$a", s"host$b") }
    val got = LinkGraph.labelPropagation(
      ids.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("host0" -> "host0", "host1" -> "host0", "host2" -> "host0",
      "host3" -> "host2", "host4" -> "host2", "host5" -> "host2"))
  }

  test("hitsFromStore: bit-identical to the raw-edge hits, multi-edges included") {
    import spark.implicits._
    val nodes = (0L to 6L).toDF("id")
    // duplicate edges exercise the n_links-weighted sums
    val edges = Seq(0L -> 1L, 0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 2L,
      4L -> 5L, 5L -> 4L, 6L -> 0L, 0L -> 3L).toDF("src", "dst")
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaStore = LinkGraph.hitsFromStore(nodes, "id",
      LinkGraph.adjacencyStore(edges, "src", "dst"), iters = 3)
    assert(scores(viaStore) ==
      scores(LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 3)))
  }

  test("hits seeding decomposes: 1 cold round + 1 seeded round == 2 cold rounds") {
    import spark.implicits._
    val nodes = (0L to 6L).toDF("id")
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 2L,
      4L -> 5L, 5L -> 4L, 6L -> 0L, 0L -> 3L).toDF("src", "dst")
    val store = LinkGraph.adjacencyStore(edges, "src", "dst").localCheckpoint(true)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the hub vector is the COMPLETE state: seeding round 2 with round
    // 1's output must land exactly where 2 straight rounds land
    val r1 = LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 1)
      .localCheckpoint(true)
    assert(scores(LinkGraph.hitsFromStore(nodes, "id", store, iters = 1, seed = Some(r1))) ==
      scores(LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 2)))
  }

  test("warm-start hits: start-independent fixed point; warm tolerance stop never later; replay no-op") {
    import spark.implicits._
    val nodes = (0L to 9L).toDF("id")
    // the warm-start pageRank test's asymmetric graph
    val oldEdges = ((0L to 9L).map(i => i -> ((i + 1) % 10)) ++
      Seq(1L, 4L, 7L).map(i => i -> 0L)).toDF("src", "dst")
    val oldStore = LinkGraph.adjacencyStore(oldEdges, "src", "dst").localCheckpoint(true)
    val (oldFp0, _) = LinkGraph.hitsFixedPoint(nodes, "id", oldStore)
    val oldFp = oldFp0.localCheckpoint(true)
    val batch = Seq(0L -> 5L, 7L -> 2L).toDF("src", "dst")
    val store = LinkGraph.mergeAdjacency(oldStore, batch, "src", "dst")
      .localCheckpoint(true)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (coldFp, coldRounds) = LinkGraph.hitsFixedPoint(nodes, "id", store)
    val (warmFp, _) = LinkGraph.hitsFixedPoint(nodes, "id", store, seed = Some(oldFp))
    // start-independent UP TO THE GRID: the renormalizing `div`
    // truncation admits neighboring absorbing states, so warm and cold
    // limits may differ by 1 micro per score (measured: they do, on
    // exactly this graph) — the band is the quantization unit, never
    // wider. (PageRank's teleport affine term collapses the band to a
    // single state; HITS' pure renormalization doesn't.)
    val (w, c) = (scores(warmFp), scores(coldFp))
    for (v <- 0L to 9L)
      assert(math.abs(w(v)._1 - c(v)._1) <= 1L && math.abs(w(v)._2 - c(v)._2) <= 1L,
        s"node $v outside the quantization band: warm ${w(v)} vs cold ${c(v)}")
    assert(coldRounds < 100, s"cold run must absorb, used $coldRounds")
    // tolerance stop from the warm seed never fires later than cold
    val (_, rWarm) = LinkGraph.hitsFixedPoint(nodes, "id", store,
      tolMicro = 10000L, seed = Some(oldFp))
    val (_, rCold) = LinkGraph.hitsFixedPoint(nodes, "id", store, tolMicro = 10000L)
    assert(rWarm <= rCold, s"warm tolerance stop fired later: $rWarm vs $rCold")
    // replay: seeding with the fixed point itself is a one-round no-op
    val (fpAgain, rReplay) = LinkGraph.hitsFixedPoint(nodes, "id", store,
      seed = Some(coldFp.localCheckpoint(true)))
    assert(rReplay == 1 && scores(fpAgain) == scores(coldFp))
  }

  test("labelPropagationFromStore: identical to raw-edge LPA; multiplicity inert; seeding decomposes") {
    import spark.implicits._
    val nodes = (0L to 5L).toDF("id")
    val noisy = (twoTris ++ Seq(1L -> 0L, 2L -> 1L, 0L -> 0L, 4L -> 4L)).toDF("src", "dst")
    val store = LinkGraph.adjacencyStore(noisy, "src", "dst").localCheckpoint(true)
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(LinkGraph.labelPropagationFromStore(nodes, "id", store, iters = 3)) ==
      lpa(0L to 5L, twoTris, iters = 3))
    // sweeps decompose: 2 cold + 1 seeded == 3 cold
    val l2 = LinkGraph.labelPropagation(nodes, "id", noisy, "src", "dst", iters = 2)
      .localCheckpoint(true)
    assert(labels(LinkGraph.labelPropagationFromStore(nodes, "id", store,
      iters = 1, seed = Some(l2))) == lpa(0L to 5L, twoTris, iters = 3))
  }

  test("labelPropagationFixedPoint: absorbing state; replay from the fixed point is a one-sweep no-op") {
    import spark.implicits._
    val nodes = (0L to 5L).toDF("id")
    val store = LinkGraph.adjacencyStore(twoTris.toDF("src", "dst"), "src", "dst")
      .localCheckpoint(true)
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (fp, sweeps) = LinkGraph.labelPropagationFixedPoint(nodes, "id", store)
    assert(sweeps < 50, s"must absorb, used $sweeps")
    assert(labels(fp) == lpa(0L to 5L, twoTris, iters = 3),
      "the fixed point is the converged cold state")
    val (fpAgain, sReplay) = LinkGraph.labelPropagationFixedPoint(nodes, "id", store,
      seed = Some(fp.localCheckpoint(true)))
    assert(sReplay == 1 && labels(fpAgain) == labels(fp))
  }

  test("triangleCountsFromStore: identical to raw-edge counts — direction and multiplicity collapse") {
    import spark.implicits._
    val clean = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L)
    val noisy = clean ++ Seq(1L -> 0L, 0L -> 1L, 2L -> 2L, 0L -> 0L)
    val store = LinkGraph.adjacencyStore(noisy.toDF("src", "dst"), "src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(LinkGraph.triangleCountsFromStore((0L to 4L).toDF("id"), "id", store)) ==
      rows(LinkGraph.triangleCounts((0L to 4L).toDF("id"), "id",
        clean.toDF("src", "dst"), "src", "dst")))
  }
}
