package graft

import org.apache.spark.sql.functions._

import graft.dedup.TextDedup

/** SimHash, LSH recall vs brute force, and plan-shape checks. */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (3L, "completely different text about spark catalyst optimizer and shuffle exchanges"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("simhash: exact dup distance 0, near-dup small, unrelated large") {
    val sigs = TextDedup.simhash64(TextDedup.tokenSets(docs, "doc_id", "text"))
    val m = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(m(1) ^ m(4)) == 0)
    val near = java.lang.Long.bitCount(m(1) ^ m(2))
    val far = java.lang.Long.bitCount(m(1) ^ m(3))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16)
  }

  test("simhashNearPairs finds the dup/near-dup cluster, not unrelated docs") {
    val sigs = TextDedup.simhash64(TextDedup.tokenSets(docs, "doc_id", "text"))
    val pairs = TextDedup.simhashNearPairs(sigs, maxDist = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH candidates achieve full recall on the planted near-dups at sf0.001") {
    val d = Tables.documents(spark, sfDir)
    val sets = TextDedup.shingleSets(d, "doc_id", "text", 3)
    val brute = TextDedup.jaccardPairs(sets, 0.5).select("id_1", "id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashLshPairs(d, "doc_id", "text").select("id_1", "id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "test data should contain planted near-dups")
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall over ${brute.size} true pairs")
    assert(lsh.subsetOf(brute), "verification must filter false candidates")
  }

  test("LSH pipeline plan contains no cartesian product") {
    val plan = TextDedup.minhashLshPairs(Tables.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH must not degrade to all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "LSH must join on band keys")
  }

  test("dedupClusters: transitive pairs collapse to one cluster; removal keeps min id") {
    import spark.implicits._
    // chain 1-2, 2-3 (one component) plus isolated 4 — verified on BOTH
    // physical strategies: driver union-find (default) and iterative
    // propagation (forced via maxDriverEdges = 0)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_1", "id_2")
    val ids = Seq(1L, 2L, 3L, 4L).toDF("id")
    for (threshold <- Seq(4000000L, 0L)) {
      val clusters = TextDedup.dedupClusters(pairs, ids, maxDriverEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L),
        s"maxDriverEdges=$threshold")
    }

    val kept = TextDedup.removeNearDuplicates(
      Tables.documents(spark, sfDir), "doc_id", "text")
    val all = Tables.documents(spark, sfDir).count()
    val pairCount = TextDedup.minhashLshPairs(
      Tables.documents(spark, sfDir), "doc_id", "text").count()
    assert(kept.count() < all || pairCount == 0)
    assert(kept.count() >= all - 2 * pairCount) // each pair removes at most one doc
  }

  test("dedupClusters: union-find and propagation are row-identical AT the adaptive boundary") {
    // The one adaptive switch without an equivalence test at its exact
    // boundary (round-8 verdict item 6). Internally each pair doubles
    // into two directed edges, so the routing count is 2x the pair
    // count: maxDriverEdges = 2E takes the driver union-find path
    // (<=), 2E - 1 the distributed min-label path. Property-style over
    // seeded random graphs — chains, merged components, singletons —
    // with a reference union-find computed in the test.
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val n = 120
      // random sparse graph + one deliberate 8-node chain (diameter
      // exercises multiple propagation rounds without hitting maxIter)
      val chainBase = 1000L
      val chain = (0 until 7).map(i => (chainBase + i, chainBase + i + 1))
      val random = Seq.fill(60)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairSeq = (random ++ chain).distinct
      val ids = ((0L until n.toLong) ++ (chainBase to chainBase + 7) ++ Seq(5000L)).toDF("id")
      val pairs = pairSeq.toDF("id_1", "id_2")
      // reference components: plain union-find over the same pairs
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (((0L until n.toLong) ++ (chainBase to chainBase + 7)) :+ 5000L)
        .map(id => id -> find(id)).toMap
      val boundary = 2L * pairSeq.length
      for (mde <- Seq(boundary, boundary - 1)) {
        val got = TextDedup.dedupClusters(pairs, ids, maxIter = 50, maxDriverEdges = mde)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected,
          s"seed=$seed maxDriverEdges=$mde (boundary=$boundary): " +
            s"diff=${(got.toSet -- expected.toSet).take(5)}")
      }
    }
  }

  test("jaccardPairs: bitmask fast path == item-join path on the same sets") {
    // documents at sf0.001 has a ≤64-token vocabulary, so jaccardPairs
    // takes the bitmask path; the item-join path is the semantics
    // reference — both must emit identical (id_1, id_2, jaccard) rows.
    val sets = TextDedup.tokenSets(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    for (t <- Seq(0.5, 0.95)) {
      val fast = TextDedup.jaccardPairs(sets, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ref = TextDedup.jaccardPairsItemJoin(sets, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == ref, s"threshold $t: paths disagree " +
        s"(fast-only=${(fast -- ref).take(3)}, ref-only=${(ref -- fast).take(3)})")
      assert(fast.nonEmpty, s"threshold $t: expected pairs in the corpus")
    }
  }

  test("dedupClusters leaves no cached DataFrames behind after evaluation") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_1", "id_2")
    val ids = Seq(1L, 2L, 3L, 4L).toDF("id")
    // both strategies must release every cache — a long-running session
    // would otherwise accrete one pinned entry per near-dup query forever
    for (threshold <- Seq(4000000L, 0L)) {
      TextDedup.dedupClusters(pairs, ids, maxDriverEdges = threshold).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"dedupClusters left cached DataFrames (maxDriverEdges=$threshold)")
    }
  }

  test("jaccardPairs falls back to the item join when distinct masks exceed maxMasks") {
    import spark.implicits._
    // 12 docs over a 6-token vocabulary with (almost) all-distinct masks:
    // vocab ≤ 64 so the bitmask path is eligible, but maxMasks=4 forces
    // the guard to reject the O(masks²) cross join and take the item join.
    val vocabDocs = (1L to 12L)
      .map(i => i -> (0 until 6).filter(b => ((i >> b) & 1L) == 1L).map(b => s"tok$b").mkString(" "))
      .toDF("doc_id", "text")
    val sets = TextDedup.tokenSets(vocabDocs, "doc_id", "text")
    val guarded = TextDedup.jaccardPairs(sets, 0.5, maxMasks = 4)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"mask guard must avoid the all-pairs compare:\n$plan")
    // and the fallback is still exact
    val ref = TextDedup.jaccardPairsItemJoin(sets, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = guarded.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref)
  }

  test("jaccardPairsPrefix: exact — identical rows to the item join on a Zipfian corpus") {
    // 300 docs over a realistic heavy-tailed vocabulary (the ZipfCorpus
    // generator), where the >64-type vocab forces the general paths
    val docs = graft.ZipfCorpus.generate(spark, 300)
    val toks = TextDedup.tokenSets(docs, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    for (t <- Seq(0.95, 0.7)) {
      val ref = rows(TextDedup.jaccardPairsItemJoin(toks, t))
      assert(rows(TextDedup.jaccardPairsPrefix(toks, t)) == ref, s"t=$t")
      // and the adaptive chooser takes the prefix path at high t — same rows
      assert(rows(TextDedup.jaccardPairs(toks, t)) == ref, s"t=$t adaptive")
      assert(ref.nonEmpty, s"t=$t should find the planted dups")
    }
    // t = 1 edge: prefix collapses to the single rarest item per set
    assert(rows(TextDedup.jaccardPairsPrefix(toks, 1.0)) ==
      rows(TextDedup.jaccardPairsItemJoin(toks, 1.0)))
    // zero-row sets: every stage degrades to empty, not an error
    assert(TextDedup.jaccardPairsPrefix(toks.limit(0), 0.8).count() == 0)
  }

  test("jaccardPairs rejects thresholds outside (0, 1] and null items") {
    import spark.implicits._
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    intercept[IllegalArgumentException](TextDedup.jaccardPairs(sets, 0.0))
    intercept[IllegalArgumentException](TextDedup.jaccardPairs(sets, 1.5))
    val withNull = sets.unionByName(Seq((99L, null: String)).toDF("id", "item"))
    val e = intercept[IllegalArgumentException](TextDedup.jaccardPairs(withNull, 0.5))
    assert(e.getMessage.contains("null item"))
  }

  test("incrementalNearDups: new batch vs signed corpus — no old×old pairs, estimates track Jaccard") {
    import spark.implicits._
    // "yesterday's corpus": docs 1-4 signed once; only signatures kept
    val oldSigs = TextDedup.minhashSignatures(
      TextDedup.shingleSets(docs, "doc_id", "text", 3), k = 16)
      .localCheckpoint(true)
    // today's batch: 10 near-dups doc 1 (one word differs), 11 is novel,
    // 12/13 are exact dups of each other (new×new pair)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (11L, "entirely novel content with no relation to anything previously ingested here"),
      (12L, "twin payload replicated inside the same incremental batch for pairing checks"),
      (13L, "twin payload replicated inside the same incremental batch for pairing checks"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.incrementalNearDups(batch, "doc_id", "text", oldSigs,
      n = 3, k = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every pair involves >= 1 new id (old×old 1~2~4 near-dups are NOT re-reported)
    assert(pairs.keys.forall { case (a, b) => a >= 10 || b >= 10 })
    // new-vs-old: 10 pairs with 1 and its exact dup 4 (near-dup estimate high)
    assert(pairs.contains((1L, 10L)) && pairs.contains((4L, 10L)))
    assert(pairs((1L, 10L)) >= 0.5)
    // new-vs-new: the in-batch twins estimate 1.0
    assert(pairs((12L, 13L)) == 1.0)
    // the novel doc pairs with nothing
    assert(!pairs.keys.exists { case (a, b) => a == 11L || b == 11L })
  }

  test("removeNearDuplicatesBy keeps the best-quality doc per cluster, ties to min id") {
    import spark.implicits._
    // docs 1/2/4 are one near-dup cluster, 3 a singleton
    val withQ = docs.withColumn("score",
      when(col("doc_id") === 2, 9.0).otherwise(1.0))
    val best = TextDedup.removeNearDuplicatesBy(withQ, "doc_id", "text", col("score"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 3L), s"highest-quality rep must win: $best")
    // all-equal quality: deterministic tie-break to the smallest id —
    // the same selection the min-id policy makes
    val tied = TextDedup.removeNearDuplicatesBy(docs, "doc_id", "text", lit(1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val minId = TextDedup.removeNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tied == minId && tied == Set(1L, 3L))
  }

  test("splitLeakage reports only cross-split near-dup pairs; clean after dedup + resplit") {
    import spark.implicits._
    // docs {1,2,4} are one near-dup cluster; put 1,2 in train and 4 in
    // test: the straddling pairs are (1,4) and (2,4) — (1,2) is
    // same-split and must NOT be reported
    val splits = Seq((1L, "train"), (2L, "train"), (3L, "test"), (4L, "test"))
      .toDF("doc_id", "split")
    val leaks = TextDedup.splitLeakage(docs, "doc_id", "text", splits, "doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leaks == Set((1L, 4L), (2L, 4L)), s"leaks: $leaks")
    // the cleanliness direction: dedup first, then split — no
    // near-dup pair can straddle anything because no pair survives
    val deduped = TextDedup.removeNearDuplicates(docs, "doc_id", "text")
    assert(TextDedup.splitLeakage(
      deduped, "doc_id", "text", splits, "doc_id", "split").isEmpty)
  }

  test("leakageSafeSplits: clusters co-assign, so splitLeakage is empty by construction") {
    val ratios = Seq("train" -> 0.5, "test" -> 0.5)
    val assigned = TextDedup.leakageSafeSplits(docs, "doc_id", "text", ratios, seed = 7L)
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 4)
    // the near-dup cluster {1,2,4} shares cluster_id 1 and ONE split;
    // singleton 3 clusters alone
    val byCluster = rows.groupBy(_._2)
    assert(byCluster(1L).map(_._1).toSet == Set(1L, 2L, 4L))
    assert(byCluster(1L).map(_._3).distinct.length == 1, "cluster must land in one split")
    assert(byCluster(3L).map(_._1).toSet == Set(3L))
    // composition: the audit finds nothing to report, whatever the draw
    val splits = assigned.select(col("id").as("doc_id"), col("split"))
    assert(TextDedup.splitLeakage(
      docs, "doc_id", "text", splits, "doc_id", "split").isEmpty)
  }

  test("incrementalNearDups: a re-crawled id uses its NEW signature only") {
    import spark.implicits._
    val oldSigs = TextDedup.minhashSignatures(
      TextDedup.shingleSets(docs, "doc_id", "text", 3), k = 16)
      .localCheckpoint(true)
    // doc 1 is re-crawled with entirely new content; 10 is a near-dup of
    // the (unchanged) old doc 2. The stale signature of 1 — a near-dup of
    // 2 and 4 — must not resurface: no pair may involve 1, and no
    // (id_1, id_2) key may appear twice (the stale+new double-row bug).
    val batch = Seq(
      (1L, "entirely replaced content with no relation to anything previously ingested here"),
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
      .toDF("doc_id", "text")
    val rows = TextDedup.incrementalNearDups(batch, "doc_id", "text", oldSigs,
      n = 3, k = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.distinct.length == rows.length, s"duplicate pair rows: ${rows.mkString(", ")}")
    assert(!rows.exists { case (a, b) => a == 1L || b == 1L },
      s"stale signature of the re-crawled id leaked: ${rows.mkString(", ")}")
    assert(rows.contains((2L, 10L)))
  }

  test("simhashNearPairsIncremental: equals the batch-involving subset of full pairs at sf0.001") {
    val sigs = TextDedup.simhash64(
      TextDedup.tokenSets(Tables.documents(spark, sfDir), "doc_id", "text"))
      .localCheckpoint(true)
    val full = TextDedup.simhashNearPairs(sigs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = full.filter { case (a, b, _) => a % 10 == 0 || b % 10 == 0 }
    val got = TextDedup.simhashNearPairsIncremental(
      sigs.filter(col("id") % 10 === 0), sigs.filter(col("id") % 10 =!= 0), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.nonEmpty, "fixture should contain batch-involving near-dups")
    assert(got == expected,
      s"incremental != batch-subset of full: extra=${got -- expected} missing=${expected -- got}")
  }

  test("simhashNearPairsIncremental: new fingerprint wins, old×old pairs never emitted") {
    import spark.implicits._
    // store: 1 (stale, identical to 2), 2, 3; 2–3 are ONE bit apart —
    // an old×old near pair the asymmetric probe must never emit. The
    // batch re-signs 1 far from everything and adds 4 near 2 and 3.
    val oldSigs = Seq((1L, 0xFFL), (2L, 0xFFL), (3L, 0xFEL)).toDF("id", "simhash")
    val batch = Seq((1L, 0xAA00AA00AA00AA00L), (4L, 0xFDL)).toDF("id", "simhash")
    val got = TextDedup.simhashNearPairsIncremental(batch, oldSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((2L, 4L, 1), (3L, 4L, 2)),
      s"expected exactly the batch-vs-corpus pairs, got $got")
    // (1,2) d=0 and (1,4) d=1 under the STALE signature — both absent;
    // (2,3) d=1 is old×old — absent; and no duplicate (id_1,id_2) keys.
  }

  test("boilerplateLines: a doc with no non-empty lines appears with 0 lines, passes") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "shared footer line\nunique alpha content"),
      (2L, "shared footer line\nunique beta content"),
      (3L, ""),
      (4L, "\n  \n")) // whitespace-only lines trim to empty
      .toDF("doc_id", "text")
    val r = TextDedup.boilerplateLines(corpus, "doc_id", "text", minDocs = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L), "empty docs must not vanish")
    assert(r(1L) == ((2L, 1L, 0.5, false)))
    assert(r(3L) == ((0L, 0L, 0.0, true)))
    assert(r(4L) == ((0L, 0L, 0.0, true)))
  }

  test("boilerplateLines: hot/cold routing keeps the planted hot line off the merge join") {
    import spark.implicits._
    // The 100 TB risk in boilerplateLines is its count rejoin on the
    // line itself: a universal footer in half the corpus lands its
    // whole (id, line) group on one reducer. AQE's skew split is
    // structurally unavailable here — the aggregated side reuses its
    // groupBy exchange, so OptimizeSkewedJoin's both-children-are-
    // bare-shuffle-stages pattern never matches (the same data DOES
    // split a plain join). This plants the hot shape under cluster
    // conditions (auto-broadcast off: the line-frequency table scales
    // with the corpus) and asserts the structural fix: the hot slice
    // rides a forced broadcast join and is anti-joined off the
    // sort-merge path, whose groups are then < hotLineMinDocs each.
    val footer = ("all rights reserved " * 10).trim
    val corpus = (1 to 20000).map { i =>
      val hot = if (i % 2 == 0) footer + "\n" else ""
      (i.toLong, hot + s"u $i")
    }.toDF("doc_id", "text")
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = TextDedup.boilerplateLines(corpus, "doc_id", "text",
        minDocs = 2, hotLineMinDocs = 1000)
      val r = df.collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      // correctness under the skewed shape: footer docs see 1 of 2 lines
      // as boilerplate, odd docs 0 of 1
      assert(r.size == 20000)
      assert(r(2L) == ((2L, 1L)) && r(1L) == ((1L, 0L)))
      val plan = df.queryExecution.executedPlan.toString
      // the hot join and the hot anti-join are broadcasts even with
      // auto-broadcast disabled (the hint is load-bearing), and the
      // residual equi-join on line stays a shuffle join
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"hot slice must ride a broadcast join + anti-join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"cold path must remain a shuffle join:\n$plan")
    } finally saved.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("repeatedSpans: coverage merges abutting intervals, gaps split spans, short docs keep 0") {
    import spark.implicits._
    // k=3. A and B share the 3-grams "a b c" (both at start 1) and
    // "d e f" (A start 4, B start 5): in A the two covered intervals
    // [1,3] and [4,6] ABUT → one span of 6; in B [1,3] and [5,7] leave
    // position 4 uncovered → two spans. C is unique; D is < k tokens.
    val corpus = Seq(
      (1L, "a b c d e f x y"),
      (2L, "a b c q d e f z"),
      (3L, "completely different words entirely present"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val r = TextDedup.repeatedSpans(corpus, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(5)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L), "short/clean docs must not vanish")
    assert(r(1L) == ((8L, 6L, 1L, false)), "abutting intervals must merge to one span")
    assert(r(2L) == ((8L, 6L, 2L, false)), "a coverage gap must split spans")
    assert(r(3L) == ((5L, 0L, 0L, true)))
    assert(r(4L) == ((2L, 0L, 0L, true)))
  }

  test("trimRepeatedSpans cuts exactly the covered tokens and keeps the rest in order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f x y"),
      (2L, "a b c q d e f z"),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val r = TextDedup.trimRepeatedSpans(corpus, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == (("x y", 8L, 2L)))
    assert(r(2L) == (("q z", 8L, 2L)), "uncovered tokens must survive in document order")
    assert(r(3L) == (("tiny doc", 2L, 2L)), "a doc below k tokens is untouched")
  }

  test("incrementalRepeatedSpans: batch verdicts against the accumulated store, counts saturate") {
    import spark.implicits._
    val k = 3
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val b1 = Seq(
      (1L, "alpha beta gamma delta one"),
      (2L, "unrelated words entirely here")).toDF("doc_id", "text")
    val store0 = TextDedup.gramCountStore(empty, "doc_id", "text", k = k)
    val r1 = TextDedup.incrementalRepeatedSpans(b1, "doc_id", "text", store0, k = k)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 0L), "first batch: nothing seen before, no in-batch repeats")
    val store1 = TextDedup.mergeGramCountStores(
      store0, TextDedup.gramCountStore(b1, "doc_id", "text", k = k))
    // batch 2: doc 10 shares "alpha beta gamma delta" with BATCH-1 doc 1
    // (found only via the store); 11/12 are in-batch twins (found
    // without it); batch-1 docs are never revisited
    val b2 = Seq(
      (10L, "alpha beta gamma delta two"),
      (11L, "twin payload repeated verbatim"),
      (12L, "twin payload repeated verbatim")).toDF("doc_id", "text")
    val r2 = TextDedup.incrementalRepeatedSpans(b2, "doc_id", "text", store1, k = k)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r2.keySet == Set(10L, 11L, 12L), "old docs must not be revisited")
    assert(r2(10L) == 4L, "cross-batch shared span found via the store")
    assert(r2(11L) == 4L && r2(12L) == 4L, "in-batch twins flagged without the store")
    // saturation: re-merging shared grams stores the cap, not the sum
    val store2 = TextDedup.mergeGramCountStores(
      store1, TextDedup.gramCountStore(b2, "doc_id", "text", k = k))
    assert(store2.agg(max(col("cnt"))).head().getLong(0) == 2L)
  }

  test("trimContaminatedSpans: eval-colliding spans cut, clean docs byte-identical, full leaks empty") {
    import spark.implicits._
    val evalDocs = Seq((900L, "a b c d")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x1 x2 a b c d x3 x4"), // interior leak: grams (a b c)@3, (b c d)@4
      (2L, "clean doc words only here"),
      (3L, "a b c d")).toDF("doc_id", "text") // the whole doc is the leak
    val r = TextDedup.trimContaminatedSpans(train, evalDocs, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == (("x1 x2 x3 x4", 8L, 4L)))
    assert(r(2L) == (("clean doc words only here", 5L, 5L)))
    assert(r(3L) == (("", 4L, 0L)), "a fully-leaked doc trims to empty, not dropped")
  }

  test("repeatedSpans: the xxhash64 fast path is row-identical to the portable path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val corpus = (1L to 120L).map(id =>
      id -> List.fill(4 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      .toDF("doc_id", "text")
    def rows(portable: Boolean) =
      TextDedup.repeatedSpans(corpus, "doc_id", "text", k = 3, portable = portable)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    assert(rows(portable = false) == rows(portable = true))
  }

  test("repeatedSpans: hot grams ride the broadcast route under cluster conditions") {
    import spark.implicits._
    // Same 100 TB shape as boilerplateLines: the gram-count rejoin is
    // an attach-aggregate join AQE cannot split; a universal footer
    // gram must route through the forced broadcast + anti-join.
    val footer = "all rights reserved contact the operator for details"
    val corpus = (1 to 5000).map(i => (i.toLong, s"u$i v$i w$i $footer")).toDF("doc_id", "text")
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = TextDedup.repeatedSpans(corpus, "doc_id", "text",
        k = 8, hotGramMinCount = 1000)
      val r = df.collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
      // tokens 4..11 (the 8 footer tokens) are covered in every doc —
      // the universal grams have count 5000; the u/v/w prefix grams are
      // unique per doc
      assert(r.size == 5000 && r(1L) == 8L && r(4999L) == 8L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"hot grams must ride a broadcast join + anti-join:\n$plan")
    } finally saved.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("contamination: per-doc collision counts, clean docs keep 0, threshold gates") {
    import spark.implicits._
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"))
      .toDF("doc_id", "text") // exactly one 13-gram
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu padding words appended"),
      (2L, "completely different vocabulary sharing nothing with the benchmark suite at any position whatsoever"))
      .toDF("doc_id", "text")
    val r = TextDedup.contamination(train, evalDocs, "doc_id", "text", n = 13)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r(1L) == (1L, true)) // the eval 13-gram occurs once
    assert(r(2L) == (0L, false)) // clean doc present with 0, not dropped
    // a higher collision threshold un-flags the single-collision doc
    val strict = TextDedup.contamination(train, evalDocs, "doc_id", "text",
      n = 13, minCollisions = 2).collect()
      .map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(!strict(1L) && !strict(2L))
    intercept[IllegalArgumentException](
      TextDedup.contamination(train, evalDocs, "doc_id", "text", minCollisions = 0))
  }

  test("exactDedup keeps min id and counts copies") {
    val out = TextDedup.exactDedup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupParagraphs: first occurrence wins, order preserved, fully-duplicate docs vanish") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "alpha prose one\nshared footer text\nalpha prose two",
      2L -> "beta prose one\nshared footer text", // footer claimed by doc 1
      3L -> "shared footer text", // ALL paragraphs claimed → doc vanishes
      // within-doc duplicate: second copy drops, first stays in place
      4L -> "gamma prose\ngamma prose\ngamma tail")
      .toDF("doc_id", "text")
    val out = TextDedup.dedupParagraphs(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L)) // doc 3 vanished
    assert(out(1L) == (("alpha prose one\nshared footer text\nalpha prose two", 3L, 3L)))
    assert(out(2L) == (("beta prose one", 2L, 1L)))
    assert(out(4L) == (("gamma prose\ngamma tail", 3L, 2L)))
  }

  test("dedupParagraphsIncremental: store claims win, batch first-wins, claimed-everywhere docs vanish") {
    import spark.implicits._
    val history = Seq(0L -> "shared footer text\nold prose").toDF("doc_id", "text")
    val store = TextDedup.paragraphStore(history, "doc_id", "text")
    val batch = Seq(
      10L -> "alpha prose\nshared footer text\nbatch promo line",
      20L -> "beta prose\nbatch promo line", // promo claimed by doc 10
      30L -> "shared footer text") // everything claimed by the store → vanishes
      .toDF("doc_id", "text")
    val out = TextDedup.dedupParagraphsIncremental(batch, store, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(10L, 20L))
    assert(out(10L) == (("alpha prose\nbatch promo line", 3L, 2L)))
    assert(out(20L) == (("beta prose", 2L, 1L)))
  }

  test("dedupParagraphsIncremental: empty store reduces to the full-corpus rule on the batch") {
    import spark.implicits._
    val batch = Seq(
      1L -> "alpha prose\nshared footer",
      2L -> "beta prose\nshared footer").toDF("doc_id", "text")
    val store = TextDedup.paragraphStore(batch.limit(0), "doc_id", "text")
    val viaIncremental = TextDedup.dedupParagraphsIncremental(batch, store, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val viaFull = TextDedup.dedupParagraphs(batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaIncremental == viaFull)
    assert(viaIncremental.map(_._1) == Set(1L, 2L))
  }

  test("containmentPairs: excerpt recovered in its direction only; symmetric pair both ways") {
    import spark.implicits._
    // doc 1 = 12 distinct tokens; doc 2 = its first 10 (an excerpt);
    // doc 3 = unrelated. C(2→1) = 10/10 = 1; C(1→2) = 10/12 < 0.9.
    val docs = Seq(
      1L -> "a b c d e f g h i j k l",
      2L -> "a b c d e f g h i j",
      3L -> "q r s t u v w x y z").toDF("doc_id", "text")
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    val got = TextDedup.containmentPairs(sets, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((2L, 1L, 1.0)))
    // at t = 10/12 both directions qualify — asymmetry is threshold-real
    val both = TextDedup.containmentPairs(sets, 10.0 / 12.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(both == Set((2L, 1L), (1L, 2L)))
  }

  test("containmentPairs: threshold edge is inclusive; invalid thresholds rejected") {
    import spark.implicits._
    val docs = Seq(1L -> "a b c d", 2L -> "a b c x").toDF("doc_id", "text")
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    // overlap 3 of 4: containment exactly 0.75 each way
    val at = TextDedup.containmentPairs(sets, 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at == Set((1L, 2L), (2L, 1L)))
    assert(TextDedup.containmentPairs(sets, 0.76).collect().isEmpty)
    intercept[IllegalArgumentException] { TextDedup.containmentPairs(sets, 0.0) }
    intercept[IllegalArgumentException] { TextDedup.containmentPairs(sets, 1.1) }
  }

  test("minhashLshPairs: the signature-universe cut drops hot shingles from banding but never from the verify") {
    import spark.implicits._
    // boiler = a universal 3-shingle every doc carries (df = #docs); the
    // r16 scale fix signs only df <= maxShingleDf shingles so the band
    // minima cannot concentrate on boiler's carriers. maxShingleDf = 3
    // makes the cut BIND at fixture scale (defaults bind only at 1000+
    // docs). Planted near-dups ride their rare shingles; a doc whose
    // EVERY shingle is hot signs nothing and pairs with nothing.
    val boiler = "copy right all rights reserved"
    val docs = Seq(
      1L -> s"$boiler alpha beta gamma delta epsilon zeta eta theta",
      2L -> s"$boiler alpha beta gamma delta epsilon zeta eta iota", // near-dup of 1
      3L -> s"$boiler quebec romeo sierra tango uniform victor whiskey xray",
      4L -> boiler, // all-hot doc: no cold shingles, no signature
      5L -> boiler, // exact twin of 4 — invisible to LSH, q90's job
      6L -> s"$boiler november oscar papa kilo lima mike juliett golf"
    ).toDF("doc_id", "text")
    val got = TextDedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, k = 16, bands = 8, threshold = 0.5, maxShingleDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), got.mkString(", "))
    // the emitted jaccard is computed over the FULL sets, hot shingles
    // included — the cut gates candidates, never values
    val full = TextDedup.jaccardPairs(
      TextDedup.shingleSets(docs.filter(col("doc_id") <= 2), "doc_id", "text", 3), 0.5)
      .collect().map(r => r.getDouble(2)).head
    assert(math.abs(got.head._3 - full) < 1e-12)
  }

  test("containmentPairsBanded: probes are the RAREST cold items, so common-item-only overlap yields no candidate") {
    import spark.implicits._
    // A carries one very common token plus 4 rare ones; sketchSize = 4
    // keeps exactly the 4 rares (df-ascending selection — the r16 scale
    // fix). B ⊇ A is found (C = 1 hits on any probe subset); B' shares
    // ONLY the common token with A, so with the rares as probes it can
    // never become a candidate — under hash-random selection the common
    // token could enter the sketch and generate the (A, B') probe hit.
    val common = (10L until 30L).map(i => i -> s"shared r$i s$i t$i u$i")
    val docs = (Seq(
      1L -> "shared ra rb rc rd",                    // A
      2L -> "shared ra rb rc rd extra1 extra2",      // B ⊇ A
      3L -> "shared zz1 zz2 zz3 zz4 zz5"             // B': only 'shared' in common
    ) ++ common).toDF("doc_id", "text")
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    val cands = TextDedup.containmentPairsBanded(sets, 0.8, sketchSize = 4, slack = 0.3)
      .filter(col("id_a") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cands.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), cands.mkString(", "))
    // containment value exact over the FULL set: 5 of A's 5 tokens in B
    assert(cands.head._3 == 1.0)
  }

  test("hotOnlyProbeSets: sets with no cold item are enumerated — the universe cut's zero-candidate diagnosability hook") {
    import spark.implicits._
    // 12 docs all carry 'hot1 hot2' (df = 12 > the cut of 3); doc 1
    // carries ONLY those, so the banded paths generate zero candidates
    // for it BY CONSTRUCTION — hotOnlyProbeSets must name it (and only
    // it: every other doc keeps a rare token under the cut).
    val docs = ((2L until 13L).map(i => i -> s"hot1 hot2 rare$i")
      :+ (1L -> "hot1 hot2")).toDF("doc_id", "text")
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    val flagged = TextDedup.hotOnlyProbeSets(sets, maxItemDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flagged.toSeq == Seq((1L, 2L)), flagged.mkString(", "))
    // default-cut call path compiles against DefaultMaxItemDf
    assert(TextDedup.hotOnlyProbeSets(sets).collect().isEmpty)
  }

  test("removeContained: excerpts drop in favor of containers; identical sets keep the min id; chains resolve") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f g h i j k l",  // container — survives
      2L -> "a b c d e f g h i j",      // excerpt of 1 — drops
      3L -> "q r s t u v w x y z",      // unrelated — survives
      4L -> "m n o p",                  // identical twin, min id — survives
      5L -> "m n o p",                  // identical twin — drops
      6L -> "a b c d e f g h").toDF("doc_id", "text") // excerpt of 2 (and 1) — drops
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    val got = TextDedup.removeContained(sets, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 12L, 3L -> 10L, 4L -> 4L), got.toString)
    // the banded production path lands identically on this fixture
    val banded = TextDedup.removeContained(sets, 0.9, banded = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(banded == got)
  }

  test("containmentPairsBanded: exact-equal to containmentPairs when sketches cover the probe sets") {
    import spark.implicits._
    // the q163/q185 construction at fixture scale: snippet docs carry
    // ≤ 28 shingles ≤ the 32-item sketch, so candidate generation is
    // exact and banded == exact must hold SET-FOR-SET, values included
    val base = (0L until 40L).map(i =>
      (i, (0 until 60).map(j => s"w${(i * 131 + j * 17) % 700}").mkString(" ")))
    val snip = base.filter(_._1 % 4 == 0).map { case (i, t) =>
      (i + 1000L, t.split(" ").take(30).mkString(" ")) }
    val docs = (base ++ snip).toDF("doc_id", "text")
    val sets = TextDedup.shingleSets(docs, "doc_id", "text", 3)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = collect(TextDedup.containmentPairs(sets, 0.9))
    val banded = collect(TextDedup.containmentPairsBanded(sets, 0.9))
    assert(exact.nonEmpty, "fixture must plant containment pairs")
    assert(banded == exact)
  }

  test("containmentPairsBanded: estimation path (sketch < |A|) — recall gated, precision exact") {
    import spark.implicits._
    // probe sets of ~120 distinct tokens, sketch of 16: candidates are
    // hypergeometric estimates; emitted pairs must still carry EXACT
    // containment ≥ t (the verify is exact), and recall on the planted
    // full-containment pairs must clear the 0.95 family gate
    val vocab = (0 until 3000).map(i => s"t$i")
    val docs = (0L until 30L).flatMap { i =>
      val words = (0 until 120).map(j => vocab(((i * 577 + j * 13) % 3000).toInt)).distinct
      Seq(i -> words.mkString(" "),
        // planted: every doc's full token set re-appears inside a
        // bigger host doc → C(small → host) = 1.0
        (i + 500L) -> (words ++ (0 until 80).map(j => vocab(((i * 997 + j * 7) % 3000).toInt))).distinct.mkString(" "))
    }.toDF("doc_id", "text")
    val sets = TextDedup.tokenSets(docs, "doc_id", "text")
    val got = TextDedup.containmentPairsBanded(sets, 0.9, sketchSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision: every emitted value is exact and ≥ t
    assert(got.forall(_._3 >= 0.9))
    // recall: the 30 planted (i → i+500) pairs
    val planted = (0L until 30L).map(i => (i, i + 500L)).toSet
    val hit = got.map(p => (p._1, p._2)).toSet.intersect(planted)
    assert(hit.size >= 29, s"recall ${hit.size}/30 below the 0.95 gate")
    // degenerate parameters reject loudly
    intercept[IllegalArgumentException] {
      TextDedup.containmentPairsBanded(sets, 0.5, slack = 0.5) }
    intercept[IllegalArgumentException] {
      TextDedup.containmentPairsBanded(sets, 0.9, sketchSize = 0) }
  }

  test("dedupParagraphs: blank-line separators collapse and empty paragraphs never count") {
    import spark.implicits._
    val corpus = Seq(5L -> "\n\nlead para\n\n\ntail para\n\n").toDF("doc_id", "text")
    val out = TextDedup.dedupParagraphs(corpus, "doc_id", "text").collect().head
    assert(out.getString(1) == "lead para\ntail para")
    assert(out.getLong(2) == 2L && out.getLong(3) == 2L)
  }

  test("WordNgrams kernel equals the column-algebra shingling twin bit-for-bit (unicode included)") {
    import spark.implicits._
    // real corpus text + adversarial rows: null, empty, punctuation
    // only, diacritics/multibyte (every non-ASCII byte is a delimiter
    // byte exactly as the regex treats the character), uppercase that
    // lowers into ASCII (Kelvin sign), digits, and a 1-token row
    val extras = Seq(
      (9001L, null.asInstanceOf[String]), (9002L, ""), (9003L, "?!,.;  --"),
      (9004L, "caf\u00e9 \u00fcber stra\u00dfe a\u00f1o 北京 word"),
      (9005L, "\u212Aelvin MiXeD 42abc7 one"),
      (9006L, "solo")
    ).toDF("doc_id", "text")
    val frame = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .unionByName(extras)
    for (n <- Seq(1, 3)) {
      val kernel = frame.select(col("doc_id"),
        graft.functions.WordNgrams.ngrams(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = frame.select(col("doc_id"),
        TextDedup.shingleItemsHof(col("text"), n).as("g"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
      // null text: the kernel yields null; the twin yields null at
      // n = 1 (split(null)) but an EMPTY array at n >= 2 (size(null)
      // is null, so the when falls through to otherwise) — both
      // explode to zero rows at every call site, so parity is
      // null-or-empty there and bit-for-bit everywhere else
      assert(kernel.keySet == hof.keySet)
      kernel.foreach { case (id, ks) =>
        val hs = hof(id)
        def empty(x: Seq[String]) = x == null || x.isEmpty
        assert((empty(ks) && empty(hs)) || ks == hs, s"n=$n id=$id: $ks vs $hs")
      }
    }
  }
}
