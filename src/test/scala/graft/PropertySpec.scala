package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.medallion.{Scd2, Silver}
import graft.services.Curator

/** Randomized invariant tests (seeded — deterministic across runs):
  * the laws an operator must hold under ANY data, not just the oracle
  * fixtures.
  */
class PropertySpec extends SparkSpec {

  test("dedup: idempotent, one row per key, keeps the max-orderKey row") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = List.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(6), rnd.nextInt(20), rnd.nextInt(200).toDouble - 100))
      val df = rows.toDF("k", "ts", "v")
      val once = Silver.dedup(df, Seq("k"), struct(col("ts"), col("v")))
      val twice = Silver.dedup(once, Seq("k"), struct(col("ts"), col("v")))
      val o = once.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
      assert(o.size == rows.map(_._1).distinct.size, s"seed=$seed")
      assert(o.subsetOf(rows.toSet), s"seed=$seed")
      assert(twice.collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet == o)
      val maxByKey = rows.groupBy(_._1).view.mapValues(g => g.map(t => (t._2, t._3)).max).toMap
      o.foreach { case (k, ts, v) => assert((ts, v) == maxByKey(k), s"seed=$seed key=$k") }
    }
  }

  test("SCD2 merge invariants: one current row per key, dense versions, latest values") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(100 + seed)
      def snap(): Seq[(Int, Int)] = (0 until 6).map(i => (i, rnd.nextInt(4)))
      val t = Seq("2024-01-01", "2024-02-01", "2024-03-01")
      val (s1, s2, s3) = (snap(), snap(), snap())
      var scd = Scd2.initialLoad(s1.toDF("id", "v"), Seq("id"), Seq("v"), lit(t.head))
      for ((s, when) <- Seq(s2 -> t(1), s3 -> t(2)))
        scd = Scd2.merge(scd, s.toDF("id", "v"), Seq("id"), Seq("v"), lit(when))
      val rows = scd.collect().map(r =>
        (r.getAs[Int]("id"), r.getAs[Int]("_scd_version"), r.getAs[Boolean]("_scd_is_current")))
      rows.groupBy(_._1).foreach { case (id, g) =>
        assert(g.count(_._3) == 1, s"seed=$seed id=$id must have exactly one current row")
        assert(g.map(_._2).sorted.toSeq == (1 to g.size).toSeq,
          s"seed=$seed id=$id versions must be dense from 1")
      }
      val current = scd.filter(col("_scd_is_current")).collect()
        .map(r => r.getAs[Int]("id") -> r.getAs[Int]("v")).toMap
      s3.foreach { case (id, v) => assert(current(id) == v, s"seed=$seed id=$id") }
    }
  }

  test("assignSplits: total, labels from the ratio set, deterministic") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(200 + seed)
      val ratios = (0 until 3).map(i => s"s$i" -> (1 + rnd.nextInt(10)).toDouble)
      val df = (1 to 500).toDF("id")
      val out = Curator.assignSplits(df, col("id"), ratios, seed = 7L)
      assert(out.count() == 500)
      val labels = out.select("split").distinct().collect().map(_.getString(0)).toSet
      assert(labels.subsetOf(ratios.map(_._1).toSet), s"seed=$seed")
      val again = Curator.assignSplits(df, col("id"), ratios, seed = 7L)
        .collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(again == out.collect().map(r => (r.getInt(0), r.getString(1))).toSet)
    }
  }

  test("repeatedSpans/trimRepeatedSpans agree with a naive reference on random corpora") {
    import spark.implicits._
    import graft.dedup.TextDedup
    val k = 3
    for (seed <- 1 to 4) {
      val rnd = new Random(300 + seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
      val docs = (1L to 40L).map(id =>
        id -> List.fill(rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      // independent third formulation (the DuckDB oracle is the second):
      // brute-force gram multiset + per-position cover marking
      val toks = docs.map { case (id, t) =>
        id -> t.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq }
      val gramCounts = scala.collection.mutable.Map.empty[Seq[String], Int]
      toks.foreach { case (_, ws) =>
        ws.sliding(k).filter(_.size == k).foreach(g =>
          gramCounts(g) = gramCounts.getOrElse(g, 0) + 1) }
      val expected = toks.map { case (id, ws) =>
        val n = ws.size
        val covered = Array.fill(n)(false)
        if (n >= k)
          for (i <- 0 to n - k; if gramCounts(ws.slice(i, i + k)) >= 2; j <- i until i + k)
            covered(j) = true
        val spans = covered.zipWithIndex.count { case (c, i) => c && (i == 0 || !covered(i - 1)) }
        id -> ((n.toLong, covered.count(identity).toLong, spans.toLong,
          ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }.mkString(" ")))
      }.toMap
      val df = docs.toDF("doc_id", "text")
      val spansOut = TextDedup.repeatedSpans(df, "doc_id", "text", k = k)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
      val trimOut = TextDedup.trimRepeatedSpans(df, "doc_id", "text", k = k)
        .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(3)))).toMap
      expected.foreach { case (id, (n, nDup, nSpans, kept)) =>
        assert(spansOut(id) == ((n, nDup, nSpans)), s"seed=$seed doc=$id")
        assert(trimOut(id) == ((kept, n - nDup)), s"seed=$seed doc=$id trim")
      }
    }
  }

  test("lmScore/dsirWeights agree with a naive driver-side reference on random corpora") {
    import spark.implicits._
    import graft.text.TextAnalysis
    for (seed <- 1 to 3) {
      val rnd = new Random(500 + seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
        "iota", "kappa", "rare1", "rare2")
      def doc(): String =
        List.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1L to 20L).map(i => i -> doc())
      val score = (101L to 120L).map(i => i -> doc())
      // independent third formulation (the DuckDB oracle is the second):
      // plain Scala maps + the same micro-nat constants
      val counts = train.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val d = counts.values.sum + counts.size + 1
      def q(n: Long): Long = TextAnalysis.qlogConst(n)
      val expected = score.map { case (id, t) =>
        val ws = t.split(" ").toSeq
        id -> ((ws.size.toLong, ws.count(w => !counts.contains(w)).toLong,
          ws.map(w => q(d) - q(counts.getOrElse(w, 0L) + 1)).sum))
      }.toMap
      val model = TextAnalysis.unigramLm(train.toDF("doc_id", "text"), "text")
      assert(TextAnalysis.lmDenominator(model) == d, s"seed=$seed denominator")
      val got = TextAnalysis.lmScore(score.toDF("doc_id", "text"), "doc_id", "text", model)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"), r.getAs[Long]("sum_nll_micro"))))
        .toMap
      assert(got == expected, s"seed=$seed lmScore")
      // DSIR: target = even-id train docs, raw = all train docs
      val tgtDocs = train.filter(_._1 % 2 == 0)
      val tcounts = tgtDocs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val dt = tcounts.values.sum + tcounts.size + 1
      val shift = q(d) - q(dt)
      val expW = score.map { case (id, t) =>
        id -> t.split(" ").toSeq
          .map(w => q(tcounts.getOrElse(w, 0L) + 1) - q(counts.getOrElse(w, 0L) + 1) + shift).sum
      }.toMap
      val gotW = TextAnalysis.dsirWeights(
        score.toDF("doc_id", "text"), "doc_id", "text",
        TextAnalysis.unigramLm(tgtDocs.toDF("doc_id", "text"), "text"), model)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("weight_micro")).toMap
      assert(gotW == expW, s"seed=$seed dsir")
    }
  }

  test("lmScoreBigram agrees with a naive driver-side reference on random corpora") {
    import spark.implicits._
    import graft.text.TextAnalysis
    for (seed <- 1 to 3) {
      val rnd = new Random(700 + seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
      def doc(): String =
        List.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val train = (1L to 15L).map(i => i -> doc())
      val score = (101L to 115L).map(i => i -> doc())
      val uCounts = train.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val d = uCounts.values.sum + uCounts.size + 1
      val bCounts = train.flatMap(_._2.split(" ").sliding(2).filter(_.size == 2).map(_.toList))
        .groupBy(identity).map { case (g, xs) => (g.head, g(1)) -> xs.size.toLong }
      val ctx = bCounts.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
      def q(n: Long): Long = TextAnalysis.qlogConst(n)
      val expected = score.map { case (id, t) =>
        val ws = t.split(" ").toSeq
        val nlls = ws.zipWithIndex.map { case (w, i) =>
          val cu1 = uCounts.getOrElse(w, 0L) + 1
          val prev = if (i == 0) None else Some(ws(i - 1))
          prev.flatMap(p => ctx.get(p).map(b =>
            q(2 * b * d) - q(bCounts.getOrElse((p, w), 0L) * d + cu1 * b)))
            .getOrElse(q(d) - q(cu1))
        }
        val hits = ws.zipWithIndex.count { case (_, i) => i > 0 && ctx.contains(ws(i - 1)) }
        id -> ((ws.size.toLong, hits.toLong, nlls.sum))
      }.toMap
      val got = TextAnalysis.lmScoreBigram(
        score.toDF("doc_id", "text"), "doc_id", "text",
        TextAnalysis.bigramLm(train.toDF("doc_id", "text"), "text"),
        TextAnalysis.unigramLm(train.toDF("doc_id", "text"), "text"))
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_ctx_hits"),
            r.getAs[Long]("sum_nll_micro")))).toMap
      assert(got == expected, s"seed=$seed bigram")
    }
  }

  test("chunkDocs: stitching chunks (dropping each overlap) reconstructs every document") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new Random(400 + seed)
      val maxT = 2 + rnd.nextInt(8)
      val overlap = rnd.nextInt(maxT)
      val docs = (1L to 30L).map(id =>
        id -> (0 until rnd.nextInt(60)).map(i => s"w${rnd.nextInt(9)}x$i").mkString(" "))
      val chunks = Curator.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text", maxT, overlap)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
      chunks.foreach { case (_, _, t, n) =>
        assert(n <= maxT && n >= 1 && t.split(" ").length == n.toInt,
          s"seed=$seed maxT=$maxT ov=$overlap chunk token count") }
      val byDoc = chunks.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3.split(" ").toSeq)).toMap
      docs.foreach { case (id, text) =>
        val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        val got = byDoc.get(id) match {
          case None => Seq.empty
          case Some(cs) => cs.head ++ cs.tail.flatMap(_.drop(overlap))
        }
        assert(got == ws, s"seed=$seed maxT=$maxT ov=$overlap doc=$id reconstruction")
      }
    }
  }

  test("packSequences invariants over random corpora: total, budget, determinism") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new Random(300 + seed)
      val max = 500L + rnd.nextInt(2000)
      val n = 200 + rnd.nextInt(800)
      // lengths spanning under- and over-size, including the max itself
      val docs = (1 to n).map { i =>
        val len = rnd.nextInt(3) match {
          case 0 => 1L + rnd.nextInt(100)
          case 1 => 1L + rnd.nextInt((max * 2).toInt) // may exceed budget
          case _ => max
        }
        (i.toLong, len)
      }.toDF("doc_id", "n_tokens")
      val packed = Curator.packSequences(docs, "doc_id", "n_tokens", max,
        groups = 1 + rnd.nextInt(64))
      assert(packed.select("doc_id").distinct().count() == n, s"seed=$seed")
      // a pack over budget must be a single oversize doc
      val over = packed.groupBy("pack_id")
        .agg(sum("n_tokens").as("tok"), count(lit(1)).as("k"), max_by(col("n_tokens"), col("n_tokens")).as("big"))
        .filter(col("tok") > max)
      assert(over.filter(col("k") =!= 1 || col("big") <= max).count() == 0,
        s"seed=$seed: over-budget pack that is not a lone oversize doc")
      // deterministic under adversarial partitioning
      val again = Curator.packSequences(docs.repartition(1 + rnd.nextInt(16)),
          "doc_id", "n_tokens", max, groups = 1)
      val once = Curator.packSequences(docs, "doc_id", "n_tokens", max, groups = 1)
      assert(again.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        once.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, s"seed=$seed")
    }
  }

  test("CDC applyChanges: target keys = (old \\ deleted) union upserted") {
    import spark.implicits._
    import graft.extraction.Incremental
    for (seed <- 1 to 5) {
      val rnd = new Random(300 + seed)
      val target = (0 until 20).map(i => (i, s"v$i")).toDF("id", "v")
      val changes = (0 until 15).map { seq =>
        val id = rnd.nextInt(30)
        (id, s"new${id}_$seq", if (rnd.nextBoolean()) "UPSERT" else "DELETE", seq)
      }
      val latest = changes.groupBy(_._1).map { case (_, g) => g.maxBy(_._4) }.toSeq
      val out = Incremental.applyChanges(
        target,
        changes.toDF("id", "v", "_change_type", "seq"),
        Seq("id"), latestBy = Some(col("seq")))
      val expect = (0 until 20).filterNot(i => latest.exists(c => c._1 == i)).map(i => i -> s"v$i") ++
        latest.filter(_._3 == "UPSERT").map(c => c._1 -> c._2)
      val got = out.collect().map(r => r.getInt(0) -> r.getString(1)).toSet
      assert(got == expect.toSet, s"seed=$seed")
    }
  }

  test("versioned table: random op sequences (incl. schema evolution) agree with a model") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.types.{LongType, StringType}
    for (seed <- 1 to 3) {
      val rnd = new Random(200 + seed)
      val t = java.nio.file.Files.createTempDirectory(s"graft_vt_prop$seed").toString + "/tbl"
      // model: committed snapshots as Maps id -> value, index = version-1.
      // Evolution ops add/rename/widen EXTRA columns or widen v — the
      // (id, v) value model is invariant under all of them, which is
      // itself the property: evolving a schema never disturbs data.
      var model = Vector.empty[Map[Long, Int]]
      var extraCols = 0
      def df(m: Map[Long, Int]) = m.toSeq.toDF("id", "v")
      // initial commit
      val init = (0L until 5L).map(_ -> rnd.nextInt(10)).toMap
      VersionedTable.commit(spark, t, df(init)); model :+= init
      for (_ <- 1 to 10) {
        rnd.nextInt(6) match {
          case 0 => // append fresh ids
            val add = (1 to 1 + rnd.nextInt(2)).map(_ => (100L + rnd.nextInt(50)).toLong -> rnd.nextInt(10))
              .toMap -- model.last.keySet
            VersionedTable.append(spark, t, df(add)); model :+= model.last ++ add
          case 1 => // upsert: overwrite some + add one
            val up = model.last.keys.take(2).map(_ -> rnd.nextInt(10)).toMap + ((200L + rnd.nextInt(20)) -> rnd.nextInt(10))
            VersionedTable.upsert(spark, t, df(up), Seq("id")); model :+= model.last ++ up
          case 2 => // delete ids below a threshold
            val cut = rnd.nextInt(5).toLong
            VersionedTable.delete(spark, t, col("id") < cut)
            model :+= model.last.filter(_._1 >= cut)
          case 3 => // restore a random earlier version (may revert schema too)
            val v = 1 + rnd.nextInt(model.size)
            VersionedTable.restore(spark, t, v); model :+= model(v - 1)
          case 4 => // evolve: add a fresh string column (values untouched)
            extraCols += 1
            VersionedTable.addColumn(spark, t, s"x$extraCols", StringType,
              lit(s"d$extraCols"))
            model :+= model.last
          case 5 => // evolve: widen v int→long when it is int, else rename an extra
            val cur = VersionedTable.read(spark, t)
            if (cur.schema("v").dataType != LongType) {
              VersionedTable.widenColumnType(spark, t, "v", LongType)
              model :+= model.last
            } else cur.columns.find(_.startsWith("x")) match {
              case Some(x) =>
                VersionedTable.renameColumn(spark, t, x, s"renamed_$x")
                model :+= model.last
              case None => // nothing to evolve this round; widen again is a no-op op-skip
                VersionedTable.addColumn(spark, t, s"x${extraCols + 1}", StringType)
                extraCols += 1
                model :+= model.last
            }
        }
      }
      // every committed version matches the model regardless of the
      // schema it was written under (per-version parquet self-describes)
      val versions = VersionedTable.versions(spark, t)
      assert(versions == (1 to model.size), s"seed=$seed")
      versions.foreach { v =>
        val got = VersionedTable.read(spark, t, Some(v)).select("id", "v").collect()
          .map(r => r.getLong(0) -> r.getAs[Number](1).intValue()).toMap
        assert(got == model(v - 1), s"seed=$seed version=$v")
      }
      // vacuum keeps the newest 2 and they still match
      VersionedTable.vacuum(spark, t, keep = 2)
      assert(VersionedTable.versions(spark, t) == Seq(model.size - 1, model.size), s"seed=$seed")
      assert(VersionedTable.read(spark, t).select("id", "v").collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).intValue()).toMap
        == model.last, s"seed=$seed post-vacuum")
    }
  }

  test("schema evolution: compat checks enforced, time travel spans evolutions") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.types._
    val t = java.nio.file.Files.createTempDirectory("graft_vt_evolve").toString + "/tbl"
    VersionedTable.commit(spark, t, Seq((1L, 10), (2L, 20)).toDF("id", "v")) // v1
    val v2 = VersionedTable.addColumn(spark, t, "tag", StringType)            // v2
    VersionedTable.append(spark, t, Seq((3L, 30, "c")).toDF("id", "v", "tag")) // v3
    val v4 = VersionedTable.widenColumnType(spark, t, "v", LongType)          // v4
    VersionedTable.renameColumn(spark, t, "tag", "label")                     // v5
    val v6 = VersionedTable.dropColumn(spark, t, "label")                     // v6
    assert((v2, v4, v6) == (2, 4, 6))

    // incompatible evolutions are refused up front
    intercept[IllegalArgumentException](
      VersionedTable.addColumn(spark, t, "v", StringType)) // exists
    intercept[IllegalArgumentException](
      VersionedTable.renameColumn(spark, t, "ghost", "x")) // missing
    intercept[IllegalArgumentException](
      VersionedTable.widenColumnType(spark, t, "v", IntegerType)) // narrowing
    intercept[IllegalArgumentException](
      VersionedTable.widenColumnType(spark, t, "v", StringType)) // cross-family
    assert(VersionedTable.canWiden(FloatType, DoubleType))
    assert(VersionedTable.canWiden(DecimalType(10, 2), DecimalType(18, 2)))
    assert(!VersionedTable.canWiden(DecimalType(10, 2), DecimalType(18, 4))) // scale change
    assert(!VersionedTable.canWiden(LongType, DoubleType)) // lossy beyond 2^53

    // time travel reads each version under its own schema
    val r1 = VersionedTable.read(spark, t, Some(1))
    assert(r1.columns.toSeq == Seq("id", "v") && r1.schema("v").dataType == IntegerType)
    val r3 = VersionedTable.read(spark, t, Some(3))
    assert(r3.columns.contains("tag") && r3.count() == 3)
    val r4 = VersionedTable.read(spark, t, Some(4))
    assert(r4.schema("v").dataType == LongType)
    val r5 = VersionedTable.read(spark, t, Some(5))
    assert(r5.columns.contains("label") && !r5.columns.contains("tag"))
    assert(VersionedTable.read(spark, t).columns.toSeq == Seq("id", "v"))
    // failed evolutions committed nothing: current is still v6
    assert(VersionedTable.currentVersion(spark, t).contains(6))
  }

  test("BPE train/encode laws on random corpora: matches the from-scratch reference, encode is lossless") {
    import spark.implicits._
    import graft.text.Bpe
    for (seed <- 1 to 4) {
      val rnd = new Random(700 + seed)
      val vocab = Vector("banana", "bandana", "cabana", "ban", "anna",
        "aa", "aaa", "aaaa", "abcabc", "xyz")
      val docs = (1L to 25L).map(id =>
        id -> List.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val df = docs.toDF("doc_id", "text")
      val n = 3 + rnd.nextInt(10)
      val merges = Bpe.train(df, "text", nMerges = n, minFreq = 2L)
      // 1) merge-for-merge agreement with the independent reference
      val freqs = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(merges == BpeSpec.refTrain(freqs, n, 2L), s"seed=$seed")
      // 2) encode laws for EVERY word (incl. unseen): lossless
      //    concatenation, count in [1, len], trained words reproduce
      //    the training-replay symbols
      val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
      for (w <- vocab :+ "unseenword") {
        val enc = Bpe.encodeWord(w, ranks)
        assert(enc.mkString == w, s"seed=$seed word=$w lossy")
        assert(enc.nonEmpty && enc.size <= w.length, s"seed=$seed word=$w count")
        if (freqs.contains(w))
          assert(enc == BpeSpec.refApplyAll(w, merges), s"seed=$seed word=$w replay")
      }
    }
  }

  test("epochMix/sampleExact arithmetic laws on random mixtures") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new Random(800 + seed)
      val nSrc = 2 + rnd.nextInt(3)
      val docs = (for (s <- 0 until nSrc; i <- 0 until 10 + rnd.nextInt(30))
        yield (s * 1000L + i, s"s$s", 5L + rnd.nextInt(20))).toDF("id", "src", "n_tokens")
      val pops = docs.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val toks = docs.groupBy("src").agg(sum("n_tokens").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val weights = (0 until nSrc).map(s => s"s$s" -> (0.1 + rnd.nextDouble())).toMap
      val budget = 200L + rnd.nextInt(5000)
      val out = Curator.epochMix(docs, col("id"), "src", "n_tokens", weights,
        tokenBudget = budget, maxEpochs = 6.0, seed = 42L, portable = true)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
      val total = weights.values.sum
      for ((s, w) <- weights) {
        val epochs = math.min(6.0, (budget * (w / total)) / toks(s))
        val nFull = math.floor(epochs).toInt
        // every full epoch is the whole stratum; nothing beyond nFull+1
        for (ep <- 0 until nFull)
          assert(out.count(r => r._2 == s && r._3 == ep) == pops(s), s"seed=$seed $s ep=$ep")
        assert(!out.exists(r => r._2 == s && r._3 > nFull), s"seed=$seed $s overflow")
      }
      // sampleExact: exact min(k, n) per stratum, disjoint strata
      val caps = (0 until nSrc).map(s => s"s$s" -> (1L + rnd.nextInt(50))).toMap
      val sampled = Curator.sampleExact(docs, col("id"), "src", caps,
        seed = 42L, portable = true)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(sampled.length == sampled.distinct.length, s"seed=$seed dup rows")
      val bySrc = sampled.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      for ((s, k) <- caps)
        assert(bySrc.getOrElse(s, 0L) == math.min(k, pops(s)), s"seed=$seed $s count")
    }
  }

  test("containmentPairs laws on random token sets: bounds, subset completeness, naive agreement") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(700 + seed)
      val vocab = (0 until 40).map(i => s"t$i")
      val docs = (1L to 15L).map(i =>
        i -> rnd.shuffle(vocab).take(5 + rnd.nextInt(15)).mkString(" "))
      val sets = graft.dedup.TextDedup.tokenSets(docs.toDF("doc_id", "text"), "doc_id", "text")
      val t = 0.6
      val got = graft.dedup.TextDedup.containmentPairs(sets, t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // naive reference over the same sets
      val ref = docs.map { case (i, s) => i -> s.split(" ").toSet }.toMap
      val naive = (for {
        (a, sa) <- ref; (b, sb) <- ref if a != b
        c = sa.intersect(sb).size.toDouble / sa.size if c >= t
      } yield (a, b) -> c).toMap
      assert(got.keySet == naive.keySet, s"seed=$seed")
      got.foreach { case (k, c) =>
        assert(math.abs(c - naive(k)) < 1e-12 && c >= t && c <= 1.0, s"seed=$seed $k")
      }
    }
  }

  test("resolveUrl laws on random references: output absolute, absolute refs are fixed points") {
    import spark.implicits._
    val rnd = new Random(800)
    val bases = (1 to 30).map { i =>
      s"https://h${rnd.nextInt(5)}.example/${Seq.fill(rnd.nextInt(3))(s"d${rnd.nextInt(9)}").mkString("/")}/p$i.html"
    }
    val refs = (1 to 30).map { i =>
      rnd.nextInt(6) match {
        case 0 => s"https://abs.example/a$i"
        case 1 => s"//cdn.example/c$i"
        case 2 => s"/r$i"
        case 3 => s"${Seq.fill(rnd.nextInt(3))("..").mkString("/")}/x$i"
        case 4 => s"rel$i/y"
        case 5 => s"#f$i"
      }
    }
    val out = bases.zip(refs).toDF("b", "r")
      .select(col("b"), col("r"), graft.crawl.Links.resolveUrl(col("b"), col("r")).as("o"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    out.foreach { case (ref, o) =>
      assert(o.startsWith("https://"), s"ref=$ref → $o not absolute")
      if (ref.startsWith("https://")) assert(o == ref, s"absolute ref must pass through")
    }
    // idempotence: resolving an already-resolved URL against itself with "" is itself
    val again = out.map(_._2).toSeq.toDF("u")
      .select(graft.crawl.Links.resolveUrl(col("u"), lit("")))
      .collect().map(_.getString(0))
    assert(again.toSeq == out.map(_._2).map(_.replaceAll("#.*$", "")).toSeq)
  }

  test("weightedSample laws on random weights: subset, size, seed determinism, weight monotonicity") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(900 + seed)
      val rows = (1L to 60L).map(i => (i, 1L + rnd.nextInt(100).toLong))
      val df = rows.toDF("id", "w")
      val k = 10 + rnd.nextInt(20)
      val s1 = Curator.weightedSample(df, "id", "w", k, seed = 7L)
        .collect().map(_.getLong(0)).toSet
      val s2 = Curator.weightedSample(df, "id", "w", k, seed = 7L)
        .collect().map(_.getLong(0)).toSet
      assert(s1 == s2 && s1.size == k && s1.subsetOf(rows.map(_._1).toSet), s"seed=$seed")
      // monotonicity: raising one excluded row's weight to overwhelming brings it in
      val out = rows.map(_._1).toSet -- s1
      if (out.nonEmpty) {
        val lucky = out.head
        val boosted = rows.map { case (i, w) => (i, if (i == lucky) 1000000000L else w) }
        val s3 = Curator.weightedSample(boosted.toDF("id", "w"), "id", "w", k, seed = 7L)
          .collect().map(_.getLong(0)).toSet
        assert(s3.contains(lucky), s"seed=$seed boosted row must be sampled")
      }
    }
  }

  test("corpusOverlap laws on random corpora: estimate within [0,1], exact when k covers the union") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(1000 + seed)
      val shared = (1 to 10).map(i => s"s$i")
      val frame = (for {
        g <- Seq("a", "b", "c")
        t <- rnd.shuffle(shared).take(3 + rnd.nextInt(7)) ++
          (1 to rnd.nextInt(8)).map(i => s"$g-own$i")
      } yield (g, t)).toDF("g", "text")
      val got = graft.text.TextAnalysis.corpusOverlap(frame, "g", "text", k = 64)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
      val sets = frame.collect().map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      got.foreach { case ((g1, g2), est) =>
        val exact = sets(g1).intersect(sets(g2)).size.toDouble / sets(g1).union(sets(g2)).size
        assert(math.abs(est - exact) < 1e-12, s"seed=$seed ($g1,$g2): $est vs $exact")
      }
    }
  }

  test("contractTo laws on random edge lists: weight mass = edge count, loops split off exactly") {
    import spark.implicits._
    import graft.graph.LinkGraph
    for (seed <- 1 to 3) {
      val rnd = new Random(700 + seed)
      val edges = List.fill(60 + rnd.nextInt(60))(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("src", "dst")
      val level = (c: org.apache.spark.sql.Column) => concat(lit("h"), c % 7)
      val kept = LinkGraph.contractTo(edges, "src", "dst", level)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val all = LinkGraph.contractTo(edges, "src", "dst", level, dropLoops = false)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val n = edges.count()
      assert(all.values.sum == n, s"seed=$seed: total weight must equal edge count")
      assert(kept == all.filter { case ((s, d), _) => s != d }, s"seed=$seed")
      assert(kept.keys.forall { case (s, d) => s != d }, s"seed=$seed")
    }
  }

  test("hits laws on random graphs: L1 mass within quantization of scale, 1-iter auth ranking = in-degree ranking") {
    import spark.implicits._
    import graft.graph.LinkGraph
    for (seed <- 1 to 3) {
      val rnd = new Random(800 + seed)
      val nNodes = 12 + rnd.nextInt(8)
      val nodes = (0L until nNodes.toLong).toDF("id")
      val edges = List.fill(30 + rnd.nextInt(30))(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
      val scale = 1000000L
      val got = LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 2, scale = scale)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // each normalized value truncates < 1 unit → Σ ∈ (scale - n, scale]
      val hubMass = got.values.map(_._1).sum
      val authMass = got.values.map(_._2).sum
      assert(hubMass <= scale && hubMass > scale - nNodes, s"seed=$seed hub mass $hubMass")
      assert(authMass <= scale && authMass > scale - nNodes, s"seed=$seed auth mass $authMass")
      // from the uniform start, one round's authority is indeg·h0
      // renormalized — a MONOTONE map of in-degree
      val one = LinkGraph.hits(nodes, "id", edges, "src", "dst", iters = 1, scale = scale)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val indeg = edges.collect().map(_.getLong(1))
        .groupBy(identity).view.mapValues(_.length).toMap.withDefaultValue(0)
      for (a <- 0L until nNodes.toLong; b <- 0L until nNodes.toLong) {
        if (indeg(a) < indeg(b))
          assert(one(a) <= one(b), s"seed=$seed: auth must be monotone in in-degree")
        if (indeg(a) == indeg(b))
          assert(one(a) == one(b), s"seed=$seed: equal in-degree, equal 1-iter auth")
      }
    }
  }

  test("frontier schedule laws on random frontiers: politeness grid, caps, budget, top-priority admission") {
    import spark.implicits._
    import graft.crawl.Frontier
    val (start, end, delay) = (1000L, 3000L, 250L)
    for (seed <- 1 to 3) {
      val rnd = new Random(900 + seed)
      val frontier = List.fill(50 + rnd.nextInt(50))(
        (s"https://h${rnd.nextInt(8)}/p${rnd.nextInt(1000)}", rnd.nextInt(100).toLong))
        .distinct.map { case (u, p) => (u, u.split("/")(2), p) }
      val last = (0 until 8).flatMap { h =>
        if (rnd.nextBoolean()) Some((s"h$h", start - 500 + rnd.nextInt(2000).toLong)) else None
      }
      val (maxPerHost, budget) = (1 + rnd.nextInt(4), 5 + rnd.nextInt(20))
      val got = Frontier.schedule(
        frontier.toDF("url", "host", "priority"), "url", "host", "priority",
        last.toDF("host", "ts"), "host", "ts",
        start, end, delay, maxPerHost, budget)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(got.length <= budget, s"seed=$seed budget")
      assert(got.map(_._1).toSet.subsetOf(frontier.map(_._1).toSet), s"seed=$seed subset")
      val lastBy = last.toMap
      got.groupBy(_._2).foreach { case (h, rows) =>
        assert(rows.length <= maxPerHost, s"seed=$seed host $h cap")
        val ts = rows.map(_._5).sorted.toSeq
        val open = math.max(start, lastBy.get(h).map(_ + delay).getOrElse(start))
        assert(ts.head >= open && ts.last < end + delay, s"seed=$seed host $h window")
        ts.sliding(2).foreach {
          case Seq(a, b) => assert(b - a >= delay, s"seed=$seed host $h gap")
          case _ =>
        }
        // admission is the host's TOP priorities: nothing skipped was
        // strictly better than something kept
        val keptMin = rows.map(_._3).min
        val skipped = frontier.filter(f => f._2 == h && !rows.exists(_._1 == f._1))
        skipped.foreach { case (u, _, p) =>
          assert(p < keptMin || (p == keptMin && rows.forall(_._1 < u)),
            s"seed=$seed host $h: skipped $u ($p) beats kept min $keptMin")
        }
      }
      // fetch_order is the (priority desc, url asc) rank of the output
      val ordered = got.sortBy(r => (-r._3, r._1)).map(_._1)
      assert(got.sortBy(_._6).map(_._1).toSeq == ordered.toSeq, s"seed=$seed order")
    }
  }

  test("unigram laws on random corpora: posterior char mass = word length, encode lossless, counts bounded") {
    import spark.implicits._
    import graft.text.Unigram
    for (seed <- 1 to 3) {
      val rnd = new Random(1000 + seed)
      def word() = (1 to (3 + rnd.nextInt(6))).map(_ => "ab" (rnd.nextInt(2))).mkString
      val docs = (1L to 20L).map(i =>
        (i, (1 to (4 + rnd.nextInt(6))).map(_ => word()).mkString(" "))).toDF("doc_id", "text")
      val model = Unigram.train(docs, "text", targetVocab = 12, maxPieceLen = 4, seedSize = 40)
      val logP = model.map(p => p.piece -> p.logProb).toMap
      // E-step invariant: every segmentation covers the word, so the
      // expected CHARACTER mass equals the word length exactly
      for (_ <- 1 to 10) {
        val w = word()
        val counts = Unigram.expectedCounts(w, logP, 4)
        if (counts.nonEmpty) {
          val mass = counts.map { case (s, c) => s.length * c }.sum
          assert(math.abs(mass - w.length) < 1e-9, s"seed=$seed $w: char mass $mass")
        }
        val enc = Unigram.encodeWord(w, logP, 4)
        assert(enc.mkString == w, s"seed=$seed $w: lossless")
      }
      val counted = Unigram.tokenCounts(docs, "doc_id", "text", model, 4)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      counted.foreach { case (words, toks) =>
        assert(toks >= words, s"seed=$seed: a word is >= one piece")
      }
    }
  }

  test("langid kernel parity on random unicode text and random models") {
    import spark.implicits._
    import graft.text.LangId
    val alphabet = "abcdeé üñà 北писzß01"
    for (seed <- 1 to 3) {
      val rnd = new Random(1100 + seed)
      val k = 2 + rnd.nextInt(4); val dim = 64 << rnd.nextInt(3)
      val model = LangId.Model(
        Array.tabulate(k)(i => s"l$i"),
        Array.fill(k, dim)(rnd.nextDouble() * 2 - 1),
        Array.fill(k)(rnd.nextDouble() - 0.5),
        dim, minN = 1, maxN = 1 + rnd.nextInt(3), maxChars = 50)
      val rows = (1 to 30).map { i =>
        (i.toLong, (1 to rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      }.toDF("id", "text")
      val both = rows.select(
        graft.functions.LangIdMargins.margins(coalesce(col("text"), lit("")), model).as("native"),
        LangId.marginsHof(col("text"), model).as("hof")).collect()
      both.foreach { r =>
        assert(r.getSeq[Double](0) == r.getSeq[Double](1), s"seed=$seed kernel/twin mismatch")
      }
    }
  }

  test("cdx parse round-trip on random index fields") {
    import spark.implicits._
    import graft.crawl.Cdx
    for (seed <- 1 to 3) {
      val rnd = new Random(1200 + seed)
      val recs = (1 to 25).map { i =>
        val host = s"site${rnd.nextInt(50)}.com"
        val url = s"https://$host/p/${rnd.nextInt(10000)}"
        val (off, len) = (math.abs(rnd.nextLong() % 100000000L), 1L + rnd.nextInt(100000))
        val status = Seq(200, 301, 404)(rnd.nextInt(3))
        val line = s"""com,${host.split("\\.")(0)})/p 2024010100${1000 + rnd.nextInt(9000)} {"url": "$url", "mime": "text/html", "status": "$status", "digest": "sha1:$i", "length": "$len", "offset": "$off", "filename": "/w/$i.warc.gz"}"""
        (line, url, status, off, len, s"/w/$i.warc.gz")
      }
      val got = Cdx.parse(recs.map(_._1).toDF("line"), "line")
        .collect().map(r => (r.getAs[String]("url"), r.getAs[Int]("status"),
          r.getAs[Long]("offset"), r.getAs[Long]("length"), r.getAs[String]("warc_path")))
      assert(got.toSet == recs.map(t => (t._2, t._3, t._4, t._5, t._6)).toSet, s"seed=$seed")
    }
  }
}
