package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.extraction.{Incremental, WatermarkManager}
import graft.services.Curator

/** Watermark store, CDC apply, split assignment semantics. */
class ExtractionSpec extends SparkSpec {

  test("WatermarkManager persists and reloads from file") {
    val path = Files.createTempFile("wm", ".json")
    val wm = new WatermarkManager(Some(path))
    import spark.implicits._
    val df = Seq(("a", 3), ("b", 7)).toDF("k", "v")
    assert(wm.updateFromDataFrame(df, "src1", "v").contains("7"))
    wm.set("src2", "ts", "2024-01-01 00:00:00")

    val reloaded = new WatermarkManager(Some(path))
    assert(reloaded.getValue("src1").contains("7"))
    assert(reloaded.get("src2").map(_.column).contains("ts"))
    assert(reloaded.listSources == Seq("src1", "src2"))
    assert(reloaded.delete("src2"))
    assert(!new WatermarkManager(Some(path)).get("src2").isDefined)
  }

  test("readNewSince filters strictly greater; None means full load") {
    import spark.implicits._
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v")
    assert(Incremental.readNewSince(df, "v", Some(lit(20))).count() == 1)
    assert(Incremental.readNewSince(df, "v", None).count() == 3)
  }

  test("extract pins the batch bound; watermark advances only on commit") {
    import spark.implicits._
    val wm = new WatermarkManager()
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v")
    // initial load: no watermark -> full scan
    val b1 = Incremental.extract(df, wm, "s", "v")
    assert(b1.slice.count() == 3)
    assert(b1.candidateWatermark.contains("30"))
    assert(wm.getValue("s").isEmpty, "watermark must not move before commit")
    // simulated load failure: no commit -> the batch replays identically
    assert(Incremental.extract(df, wm, "s", "v").slice.count() == 3)
    b1.commit()
    assert(wm.getValue("s").contains("30"))
    // second run: nothing new; commit of an empty batch is a no-op
    val b2 = Incremental.extract(df, wm, "s", "v")
    assert(b2.slice.count() == 0 && b2.candidateWatermark.isEmpty)
    b2.commit()
    assert(wm.getValue("s").contains("30"), "empty slice must not clear the watermark")
    // new data past the mark
    val df2 = df.union(Seq((4, 40)).toDF("id", "v"))
    val b3 = Incremental.extract(df2, wm, "s", "v")
    assert(b3.slice.collect().map(_.getInt(0)).toSeq == Seq(4))
    b3.commit()
    assert(wm.getValue("s").contains("40"))
    // rows landing AFTER extract but <= the pinned bound belong to the
    // next batch, not this one (no double delivery): bound here is 40,
    // a later row 35 would be missed by a naive max-advance — the
    // pinned-bound contract instead excludes it from b3's slice and the
    // next extract picks it up only because the store itself moved to 40
    // before 35 arrived; late data below a committed watermark is the
    // source's ordering contract, not the extractor's.
  }

  test("watermark escape round-trips adversarial values") {
    val path = Files.createTempFile("wm2", ".json")
    val wm = new WatermarkManager(Some(path))
    val nasty = Seq(
      "back\\nslash-n literal",   // literal backslash + 'n' two-char seq
      "quote\" and \\ mix",
      "new\nline", "tab\tandctl", "\\\\double", "\\u0041 not decoded")
    nasty.zipWithIndex.foreach { case (v, i) => wm.set(s"s$i", "c", v) }
    val reloaded = new WatermarkManager(Some(path))
    nasty.zipWithIndex.foreach { case (v, i) =>
      assert(reloaded.getValue(s"s$i").contains(v), s"round-trip failed for <$v>")
    }
  }

  test("applyChanges: latest-wins upsert and delete") {
    import spark.implicits._
    val target = Seq((1, "old1", 1), (2, "old2", 1), (3, "old3", 1)).toDF("id", "v", "seq")
    // id=1: two upserts, latest seq wins; id=2: upsert then delete ->
    // gone; id=4: brand new
    val changes = Seq(
      (1, "new1a", 2, "UPSERT"), (1, "new1b", 3, "UPSERT"),
      (2, "x", 2, "UPSERT"), (2, "x", 3, "DELETE"),
      (4, "new4", 2, "UPSERT")
    ).toDF("id", "v", "seq", "_change_type")
    val out = Incremental.applyChanges(target, changes, Seq("id"), latestBy = Some(col("seq")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "new1b", 3 -> "old3", 4 -> "new4"))
  }

  test("splits hold ratios within every stratum; manifest counts per split") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val ratios = Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1)
    val split = Curator.assignSplits(docs, col("doc_id"), ratios)
    // hash-based assignment is independent of any column, so ratios
    // hold inside each language stratum (the property a curator needs)
    val perLang = split.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = split.select("lang").distinct().collect().map(_.getString(0))
    langs.filter(l => perLang.keys.count(_._1 == l) > 0).foreach { l =>
      val total = perLang.collect { case ((`l`, _), n) => n }.sum.toDouble
      val train = perLang.getOrElse((l, "train"), 0L).toDouble
      if (total >= 50) // only strata large enough for the LLN to bite
        assert(math.abs(train / total - 0.8) < 0.15, s"lang=$l train=${train / total}")
    }
    val man = Curator.manifest(split).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(man.values.sum == docs.count())
    assert(man.keySet.subsetOf(Set("train", "test", "val")))
  }

  test("assignSplits is deterministic and roughly honors ratios") {
    import spark.implicits._
    val df = (1 to 10000).toDF("id")
    val ratios = Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1)
    val counts = Curator.assignSplits(df, col("id"), ratios)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 300)
    assert(math.abs(counts("test") - 1000L) < 150)
    assert(math.abs(counts("val") - 1000L) < 150)
    // determinism: same seed, same assignment
    val a = Curator.assignSplits(df, col("id"), ratios).collect().toSet
    val b = Curator.assignSplits(df, col("id"), ratios).collect().toSet
    assert(a == b)
  }

  test("shardCorpus: a true permutation — balanced shards, contiguous positions, seed-sensitive") {
    import spark.implicits._
    val df = (1L to 4000L).toDF("id")
    val sharded = Curator.shardCorpus(df, "id", nShards = 8, seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every row assigned exactly once; (shard, pos) is a bijection
    assert(sharded.length == 4000 && sharded.map(_._1).distinct.length == 4000)
    assert(sharded.map(t => (t._2, t._3)).distinct.length == 4000)
    val byShard = sharded.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // positions are contiguous 1..count within every shard
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $s positions")
    }
    // hash balance: no shard more than 25% off the mean
    assert(byShard.values.forall(r => math.abs(r.length - 500) < 125))
    // the order is NOT the input order (it is a shuffle)…
    val firstShardIds = byShard(0L).sortBy(_._3).map(_._1).toSeq
    assert(firstShardIds != firstShardIds.sorted, "shard order must not be id order")
    // …is deterministic…
    val again = Curator.shardCorpus(df, "id", nShards = 8, seed = 42L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sharded.toSet == again.toSet)
    // …and the seed changes it
    val reseeded = Curator.shardCorpus(df, "id", nShards = 8, seed = 43L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sharded.toSet != reseeded.toSet)
    // portable twin: same contracts under the md5 key (the oracle path)
    val portable = Curator.shardCorpus(df, "id", nShards = 8, seed = 42L, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(portable.length == 4000 && portable.map(t => (t._2, t._3)).distinct.length == 4000)
    assert(portable.toSet != sharded.toSet) // different key family, different permutation
  }

  test("rebalance keeps the scarcest stratum whole, hits the target mix, drops untargeted strata") {
    import spark.implicits._
    // brutal skew: 8000 en, 1900 de, 100 fr (+ 50 junk not in targets)
    val df = ((1 to 8000).map(i => (i, "en")) ++ (1 to 1900).map(i => (10000 + i, "de")) ++
      (1 to 100).map(i => (20000 + i, "fr")) ++ (1 to 50).map(i => (30000 + i, "junk")))
      .toDF("id", "lang")
    val r = Curator.rebalance(df, col("id"), "lang",
      Map("en" -> 1.0, "de" -> 1.0, "fr" -> 1.0)).cache()
    val counts = r.groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(!counts.contains("junk")) // untargeted → dropped
    assert(counts("fr") == 100L) // scarcest kept WHOLE (keep fraction 1.0)
    // en and de downsample to ~100 each (hash sampling is in-expectation)
    assert(math.abs(counts("en") - 100L) < 40, s"en=${counts("en")}")
    assert(math.abs(counts("de") - 100L) < 40, s"de=${counts("de")}")
    // deterministic under reordering
    val again = Curator.rebalance(df.orderBy(col("id").desc), col("id"), "lang",
      Map("en" -> 1.0, "de" -> 1.0, "fr" -> 1.0)).collect().map(_.getInt(0)).toSet
    assert(again == r.collect().map(_.getInt(0)).toSet)
    r.unpersist()
    // no targeted stratum present → empty, not a crash
    assert(Curator.rebalance(df, col("id"), "lang", Map("zz" -> 1.0)).count() == 0)
    intercept[IllegalArgumentException](
      Curator.rebalance(df, col("id"), "lang", Map.empty))
  }

  test("temperatureTargets: alpha=1 natural, alpha=0 uniform, between up-weights the tail") {
    import spark.implicits._
    val df = ((1 to 8000).map(i => (i, "en")) ++ (1 to 1900).map(i => (10000 + i, "de")) ++
      (1 to 100).map(i => (20000 + i, "fr"))).toDF("id", "lang")
    val strata = Seq("en", "de", "fr")
    val natural = Curator.temperatureTargets(df, "lang", strata, alpha = 1.0)
    assert(math.abs(natural("en") - 0.8) < 1e-9 && math.abs(natural("fr") - 0.01) < 1e-9)
    val uniform = Curator.temperatureTargets(df, "lang", strata, alpha = 0.0)
    assert(strata.forall(s => math.abs(uniform(s) - 1.0 / 3) < 1e-9))
    val temp = Curator.temperatureTargets(df, "lang", strata, alpha = 0.5)
    assert(temp("fr") > natural("fr") && temp("fr") < uniform("fr"),
      s"tail stratum must up-weight monotonically: $temp")
    assert(temp("en") < natural("en") && temp("en") > uniform("en"))
    assert(math.abs(temp.values.sum - 1.0) < 1e-9)
    // absent stratum contributes nothing; composes with rebalance
    val withGhost = Curator.temperatureTargets(df, "lang", strata :+ "zz", 0.5)
    assert(!withGhost.contains("zz"))
    // alpha = 0 is the trap: 0^0 == 1.0 would hand the absent stratum
    // a full uniform share and shrink every real target
    val ghostUniform = Curator.temperatureTargets(df, "lang", strata :+ "zz", 0.0)
    assert(!ghostUniform.contains("zz"))
    assert(strata.forall(s => math.abs(ghostUniform(s) - 1.0 / 3) < 1e-9),
      s"absent stratum must not dilute the uniform mixture: $ghostUniform")
    val mixed = Curator.rebalance(df, col("id"), "lang",
      Curator.temperatureTargets(df, "lang", strata, 0.5))
    val c = mixed.groupBy("lang").count().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // fr (scarcest after temperature) stays whole; en shrinks toward the mix
    assert(c("fr") == 100L && c("en") < 8000L && c("en") > c("fr"))
    intercept[IllegalArgumentException](Curator.temperatureTargets(df, "lang", Seq(), 0.5))
    intercept[IllegalArgumentException](Curator.temperatureTargets(df, "lang", strata, 1.5))
  }

  test("epochMix: full copies exact, partial epoch is the deterministic hash slice, budget honored") {
    import spark.implicits._
    // 3 sources x 40 docs x 10 tokens each -> tok_s = 400; weights
    // 50/30/20 against a 2100-token budget -> epochs 2.625/1.575/1.05
    val docs = (for (s <- 0 until 3; i <- 0 until 40)
      yield (s * 100L + i, s"s$s", 10L)).toDF("id", "src", "n_tokens")
    val weights = Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)
    val out = Curator.epochMix(docs, col("id"), "src", "n_tokens", weights,
      tokenBudget = 2100L, seed = 42L, portable = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    val expectedEpochs = Map("s0" -> 2.625, "s1" -> 1.575, "s2" -> 1.05)
    for ((s, e) <- expectedEpochs) {
      val nFull = math.floor(e).toInt
      val part = e - nFull
      // every full epoch carries EVERY doc of the source
      for (ep <- 0 until nFull)
        assert(out.count(r => r._2 == s && r._3 == ep) == 40, s"$s epoch $ep")
      // the partial epoch is exactly the Knuth-hash slice, replayed
      // with independent arithmetic here
      val expectSel = (0 until 40).map(i => s.drop(1).toInt * 100L + i)
        .filter(id => ((id + 42L) * 2654435761L % 4294967296L) / 4294967296.0 < part).toSet
      val gotSel = out.filter(r => r._2 == s && r._3 == nFull).map(_._1).toSet
      assert(gotSel == expectSel, s"$s partial slice")
      // no epochs beyond the partial
      assert(!out.exists(r => r._2 == s && r._3 > nFull))
      // delivered tokens land near budget * weight (uniform doc sizes)
      val delivered = out.count(_._2 == s) * 10.0
      assert(math.abs(delivered / (2100.0 * weights(s)) - 1.0) < 0.2,
        s"$s delivered $delivered")
    }
    // determinism
    val again = Curator.epochMix(docs, col("id"), "src", "n_tokens", weights,
      tokenBudget = 2100L, seed = 42L, portable = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    assert(out.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("sampleExact: exact per-stratum counts, hash-order selection, WindowGroupLimit pushdown") {
    import spark.implicits._
    val docs = (for (s <- 0 until 3; i <- 0 until 40)
      yield (s * 100L + i, s"s$s")).toDF("id", "src")
    val caps = Map("s0" -> 7L, "s1" -> 40L, "s2" -> 60L)
    val out = Curator.sampleExact(docs, col("id"), "src", caps, seed = 42L, portable = true)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1)))
    // exact counts: s0 capped at 7, s1 exactly its population, s2's
    // over-ask clamps to min(k, n)
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("s0" -> 7, "s1" -> 40, "s2" -> 40))
    // the chosen 7 are the hash-order head, replayed with independent
    // arithmetic
    def h(id: Long) = ((id + 42L) * 2654435761L % 4294967296L) / 4294967296.0
    val expect7 = (0L until 40L).sortBy(i => (h(i), i)).take(7).toSet
    assert(got.filter(_._2 == "s0").map(_._1).toSet == expect7)
    // deterministic and stable under repartitioning
    val again = Curator.sampleExact(docs.repartition(7), col("id"), "src", caps,
      seed = 42L, portable = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got.toSet)
    // untargeted strata never appear
    val sub = Curator.sampleExact(docs, col("id"), "src", Map("s1" -> 3L))
    assert(sub.count() == 3 &&
      sub.select("src").distinct().collect().map(_.getString(0)).toSeq == Seq("s1"))
    // the literal max-k conjunct must keep the rank-limit pushdown: a
    // map task contributes at most max(k) rows per stratum before the
    // exchange — the skew story depends on this node existing
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"WindowGroupLimit missing:\n$plan")
    intercept[IllegalArgumentException](Curator.sampleExact(docs, col("id"), "src", Map.empty))
    intercept[IllegalArgumentException](
      Curator.sampleExact(docs, col("id"), "src", Map("s0" -> 0L)))
  }

  test("epochMix: maxEpochs cap, untargeted strata dropped, absent strata empty, tiny budget") {
    import spark.implicits._
    val docs = (for (s <- 0 until 3; i <- 0 until 40)
      yield (s * 100L + i, s"s$s", 10L)).toDF("id", "src", "n_tokens")
    // an enormous budget caps every source at exactly maxEpochs full
    // copies (part == 0 -> the candidate partial epoch drops whole)
    val capped = Curator.epochMix(docs, col("id"), "src", "n_tokens",
      Map("s0" -> 0.5, "s1" -> 0.5), tokenBudget = 1000000L, maxEpochs = 4.0,
      seed = 42L, portable = true)
    assert(capped.count() == 2L * 40L * 4L)
    assert(capped.groupBy("src").agg(countDistinct(col("epoch")).as("n"))
      .collect().forall(_.getLong(1) == 4L))
    // untargeted source never appears
    assert(capped.filter(col("src") === "s2").count() == 0)
    // weights naming only absent strata -> structurally empty, schema intact
    val empty = Curator.epochMix(docs, col("id"), "src", "n_tokens",
      Map("zz" -> 1.0), tokenBudget = 1000L)
    assert(empty.count() == 0 && empty.columns.contains("epoch"))
    // a budget below one epoch yields ONLY the partial slice (epoch 0)
    val tiny = Curator.epochMix(docs, col("id"), "src", "n_tokens",
      Map("s0" -> 1.0), tokenBudget = 100L, seed = 42L, portable = true)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(tiny.nonEmpty && tiny.forall(_._2 == 0))
    assert(tiny.length < 40, "partial-only mix must be a strict subset")
    intercept[IllegalArgumentException](
      Curator.epochMix(docs, col("id"), "src", "n_tokens", Map.empty, 100L))
    intercept[IllegalArgumentException](
      Curator.epochMix(docs, col("id"), "src", "n_tokens", Map("s0" -> 1.0), 0L))
  }

  test("globalRank equals the single-partition window on a strict order") {
    import spark.implicits._
    // duplicate scores everywhere: the id tiebreaker must resolve them
    val df = (0L until 1000L).map(i => (i, (i * 7) % 50)).toDF("id", "score")
    val got = Curator.globalRank(df, "id", Seq(col("score").desc), numRanges = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
    // ranks are a permutation of 1..n
    assert(got.values.toSeq.sorted == (1L to 1000L))
  }

  test("globalRank: degenerate range counts and empty frames") {
    import spark.implicits._
    val df = (0L until 10L).map(i => (i, i)).toDF("id", "score")
    // one range = the naive shape, still correct
    val one = Curator.globalRank(df, "id", Seq(col("score")), numRanges = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == (0L until 10L).map(i => i -> (i + 1)).toMap)
    // more ranges than rows
    val many = Curator.globalRank(df, "id", Seq(col("score")), numRanges = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(many == one)
    val empty = Curator.globalRank(
      Seq.empty[(Long, Long)].toDF("id", "score"), "id", Seq(col("score")))
    assert(empty.count() == 0 && empty.columns.sameElements(Array("id", "rank")))
    intercept[IllegalArgumentException](Curator.globalRank(df, "id", Seq.empty))
  }

  test("weightedSample: equals a Scala A-Res replay; dominant weight always selected") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, if (i == 5L) 1000000000L else 1L + i % 3))
    val df = rows.toDF("id", "w")
    val got = Curator.weightedSample(df, "id", "w", k = 7, seed = 42L)
      .collect().map(_.getLong(0)).toSet
    // driver-side replay of the same md5 draw + quantized-log key
    val replay = rows.map { case (i, w) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1L) / 1152921504606846976.0
      val lnu = math.floor(math.log(u) * 1e6 + 0.5).toLong
      (i, lnu.toDouble / w)
    }.sortBy { case (i, key) => (-key, i) }.take(7).map(_._1).toSet
    assert(got == replay)
    assert(got.contains(5L)) // w = 1e9 → key ≈ 0, the certain winner
  }

  test("weightedSample: non-positive weights are excluded; same seed reproduces; k caps") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 0L), (3L, -2L), (4L, 1L)).toDF("id", "w")
    val got = Curator.weightedSample(df, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L)) // zero/negative mass never sampled
    val again = Curator.weightedSample(df, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == got)
    assert(Curator.weightedSample(df, "id", "w", k = 1).count() == 1)
    intercept[IllegalArgumentException](Curator.weightedSample(df, "id", "w", k = 0))
  }
}
