package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r20 optimization-round probe: sub-stage timings + interleaved A/Bs
  * for this round's targets (q172/q135 trainer, q187/q192/q193 cold
  * phase, the profile family, the minhash family). Instrument only —
  * never part of the driver contract. Usage: graft.ProbeR20 <probe> [sfDir]. */
object ProbeR20 {

  private def time(name: String)(df: => DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $name%-44s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
  }

  private def timeUnit(name: String)(body: => Unit): Unit = {
    body // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $name%-44s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
  }

  /** Interleaved A/B of two dataflow shapes in ONE JVM (the ProbeR19
    * helper) — immune to the host's multi-minute noise phases. */
  private def ab(nameA: String)(mkA: => DataFrame)(nameB: String)(mkB: => DataFrame): Unit = {
    mkA.write.format("noop").mode("overwrite").save()
    mkB.write.format("noop").mode("overwrite").save()
    val (as, bs) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    for (_ <- 1 to 4) {
      val t0 = System.nanoTime()
      mkA.write.format("noop").mode("overwrite").save()
      as += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      mkB.write.format("noop").mode("overwrite").save()
      bs += (System.nanoTime() - t1) / 1e9
    }
    println(f"[ab] A=$nameA%-36s min=${as.result().min}%.3f  all=${as.result().map(t => f"$t%.3f").mkString(",")}")
    println(f"[ab] B=$nameB%-36s min=${bs.result().min}%.3f  all=${bs.result().map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    probe match {
      case "langid" => langid(spark, sfDir)
      case "profile" => profile(spark, sfDir)
      case "minhash" => minhash(spark, sfDir)
      case "graphwarm" => graphwarm(spark, sfDir)
      case "warmab" => warmab(spark, sfDir)
      case "hitsscalar" => hitsScalar(spark, sfDir)
      case "semdedup" => semdedup(spark, sfDir)
      case other => println(s"unknown probe: $other")
    }
    spark.stop()
  }

  /** q172/q135: training vs scoring split. */
  def langid(s: SparkSession, d: String): Unit = {
    import graft.text.{LangId, QualityFilter}
    timeUnit("LangId.train (360-row planted corpus)") {
      LangId.train(LangId.plantedCorpus(s, 360, seed = 42L), "text", "lang", dim = 1024)
      ()
    }
    val model = LangId.train(LangId.plantedCorpus(s, 360, seed = 42L), "text", "lang", dim = 1024)
    time("LangId.score (documents)")(
      LangId.score(Tables.documents(s, d), "doc_id", "text", model)
        .select(col("id").as("doc_id"), col("lang"), col("confidence")))
    val labeled = Tables.documents(s, d).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" excellent thorough educational well researched reference")))
        .otherwise(concat(col("text"), lit(" click buy cheap winner prize offer")))
        .as("text"),
      (col("doc_id") % 3 === 0).cast("double").as("label"))
    timeUnit("QualityFilter.train (half the docs)") {
      QualityFilter.train(labeled.filter(col("doc_id") % 2 === 0), "text", "label", dim = 256)
      ()
    }
    time("FULL q172")(SparkEntry.queries("q172_langid_learned")(s, d))
    time("FULL q135")(SparkEntry.queries("q135_quality_classifier")(s, d))
  }

  /** q40/q41/q42/q43 profile family sub-stages. */
  def profile(s: SparkSession, d: String): Unit = {
    time("FULL q40_profile")(SparkEntry.queries("q40_profile")(s, d))
    time("FULL q41_outliers")(SparkEntry.queries("q41_outliers")(s, d))
    time("FULL q42_dataset_quality")(SparkEntry.queries("q42_dataset_quality")(s, d))
    time("FULL q43_profile_drift")(SparkEntry.queries("q43_profile_drift")(s, d))
    // q41 split: the exact-percentile bounds pass vs the outlier count pass
    val li = Tables.lineitem(s, d)
    val iqrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val boundExprs = iqrCols.map(c =>
      percentile(col(c), array(lit(0.25), lit(0.75))).as(s"_qs_$c"))
    val bounds = li.agg(boundExprs.head, boundExprs.tail: _*)
      .select(iqrCols.flatMap(c => Seq(
        round(element_at(col(s"_qs_$c"), 1), 4).as(s"_q1_$c"),
        round(element_at(col(s"_qs_$c"), 2), 4).as(s"_q3_$c"))): _*)
    time("q41 bounds pass (exact percentile x4)")(bounds)
    // q40 split: the wide agg row vs the full report
    val dirty = {
      val o = Tables.orders(s, d)
      val dirty0 = o.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 13 === 0, lit(null))
          .when(col("o_orderkey") % 19 === 0, col("o_custkey") + 1000000)
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(col("o_orderkey") % 17 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"), col("o_orderdate"))
      dirty0.unionByName(dirty0.filter(col("o_orderkey") % 97 === 0))
    }
    time("q40 base scan (dirtyOrders noop)")(dirty)
    time("q40 distincts only (6x count_distinct)")(
      dirty.agg(
        count_distinct(col("o_orderkey")).as("u1"),
        count_distinct(col("o_custkey")).as("u2"),
        count_distinct(col("o_totalprice")).as("u3"),
        count_distinct(col("o_orderstatus")).as("u4"),
        count_distinct(col("o_orderpriority")).as("u5"),
        count_distinct(col("o_orderdate")).as("u6")))
    time("q40 moments only (no distincts)")(
      dirty.agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice")).as("s"),
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"),
        sum(length(col("o_orderstatus")).cast("long")).as("ls")))
  }

  /** minhashLshPairs sub-stages (q92; feeds q114/q138/q139). */
  def minhash(s: SparkSession, d: String): Unit = {
    import graft.dedup.TextDedup
    val docs = Tables.documents(s, d)
    def sets0 = TextDedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets+distinct")(sets0)
    val sets = sets0.localCheckpoint(true)
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    time("freq (groupBy item)")(freq)
    val cold = sets.join(freq.filter(col("_df") <= TextDedup.DefaultMaxItemDf), "item")
      .select(col("id"), col("item"))
    time("cold slice (join freq)")(cold)
    val sigs = TextDedup.minhashSignatures(cold, 16)
    time("signatures (16 min-aggs)")(sigs)
    val cand = TextDedup.lshCandidates(sigs, 16, 8)
    time("band join candidates")(cand)
    val cd = cand.localCheckpoint(true)
    time("verifyJaccard")(TextDedup.verifyJaccard(cd, sets, 0.5))
    time("FULL q92")(SparkEntry.queries("q92_dedup_minhash")(s, d))
    time("FULL q114")(SparkEntry.queries("q114_dedup_clusters")(s, d))
  }

  /** q136/q96a: how much of the wall is the MLlib k-means fit vs the
    * LSH pair generation vs the cluster resolve. */
  def semdedup(s: SparkSession, d: String): Unit = {
    import graft.similarity.Ann
    val emb = Tables.embeddings(s, d)
    timeUnit("ivfIndex fit (KMeans k=16)") {
      Ann.ivfIndex(emb, "vec_id", "embedding", 16)
      ()
    }
    val (indexed, _) = Ann.ivfIndex(emb, "vec_id", "embedding", 16)
    val ckpt = indexed.localCheckpoint(true)
    time("semanticDedupPairs (indexed ckpt)")(
      Ann.semanticDedupPairs(ckpt, "vec_id", "embedding", 0.35, 64))
    time("FULL q136")(SparkEntry.queries("q136_semantic_dedup")(s, d))
    time("FULL q96a")(SparkEntry.queries("q96a_knn_ivf")(s, d))
  }

  /** HITS loop shape A/B: current (crossJoin(broadcast(tot)) per
    * half-step, round-end checkpoints) vs scalar totals (checkpoint
    * the unnormalized sums once per half-step, read the total as one
    * driver scalar, normalize against a literal). Identical integer
    * math — (x * scale) div tot — so outputs are bit-identical. */
  def hitsScalar(s: SparkSession, d: String): Unit = {
    import graft.graph.LinkGraph
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    def all = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1L), col("doc_id") % 3 + 1)).as("j"))
      .select(col("src"), ((col("src") * 31 + col("j") * 7) % n).as("dst"))
    def old = all.filter(col("src") % 10 =!= 0)
    def scalarHits(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
      val scale = 1000000L
      val nn = nodes.select(col("doc_id")).distinct().count()
      val e = edges.select(col("src").as("_s"), col("dst").as("_d"))
      val vs = nodes.select(col("doc_id").as("_v"))
      val h0 = math.max(scale / nn, 1L)
      val eSrc = e.join(vs, col("_s") === col("_v"), "left_semi").localCheckpoint(true)
      val eDst = e.join(vs, col("_d") === col("_v"), "left_semi").localCheckpoint(true)
      var hub: DataFrame = null
      var auth: DataFrame = null
      var i = 1
      while (i <= iters) {
        val aU = (
          if (hub == null) eSrc.groupBy(col("_d")).agg((count(lit(1)) * h0).as("_au"))
          else eSrc.join(hub, col("_s") === col("_v"))
            .groupBy(col("_d")).agg(sum(col("_h")).as("_au"))
          ).localCheckpoint(true)
        val aTot = aU.agg(coalesce(sum(col("_au")), lit(0L))).head().getLong(0)
        auth = aU.select(col("_d").as("_v"),
          (if (aTot > 0) expr(s"(_au * ${scale}L) div ${aTot}L") else lit(0L)).as("_a"))
        val hU = eDst.join(auth, col("_d") === col("_v"))
          .groupBy(col("_s")).agg(sum(col("_a")).as("_hu"))
          .localCheckpoint(true)
        val hTot = hU.agg(coalesce(sum(col("_hu")), lit(0L))).head().getLong(0)
        hub = hU.select(col("_s").as("_v"),
          (if (hTot > 0) expr(s"(_hu * ${scale}L) div ${hTot}L") else lit(0L)).as("_h"))
        i += 1
      }
      vs.join(hub.withColumnRenamed("_v", "_hv"), col("_v") === col("_hv"), "left")
        .join(auth.withColumnRenamed("_v", "_av"), col("_v") === col("_av"), "left")
        .select(col("_v").as("doc_id"),
          coalesce(col("_h"), lit(0L)).as("hub_micro"),
          coalesce(col("_a"), lit(0L)).as("auth_micro"))
    }
    def scalarHitsNoEdgeCkpt(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
      val scale = 1000000L
      val nn = nodes.select(col("doc_id")).distinct().count()
      val e = edges.select(col("src").as("_s"), col("dst").as("_d"))
      val vs = nodes.select(col("doc_id").as("_v"))
      val h0 = math.max(scale / nn, 1L)
      val eSrc = e.join(vs, col("_s") === col("_v"), "left_semi")
      val eDst = e.join(vs, col("_d") === col("_v"), "left_semi")
      var hub: DataFrame = null
      var auth: DataFrame = null
      var i = 1
      while (i <= iters) {
        val aU = (
          if (hub == null) eSrc.groupBy(col("_d")).agg((count(lit(1)) * h0).as("_au"))
          else eSrc.join(hub, col("_s") === col("_v"))
            .groupBy(col("_d")).agg(sum(col("_h")).as("_au"))
          ).localCheckpoint(true)
        val aTot = aU.agg(coalesce(sum(col("_au")), lit(0L))).head().getLong(0)
        auth = aU.select(col("_d").as("_v"),
          (if (aTot > 0) expr(s"(_au * ${scale}L) div ${aTot}L") else lit(0L)).as("_a"))
        val hU = eDst.join(auth, col("_d") === col("_v"))
          .groupBy(col("_s")).agg(sum(col("_a")).as("_hu"))
          .localCheckpoint(true)
        val hTot = hU.agg(coalesce(sum(col("_hu")), lit(0L))).head().getLong(0)
        hub = hU.select(col("_s").as("_v"),
          (if (hTot > 0) expr(s"(_hu * ${scale}L) div ${hTot}L") else lit(0L)).as("_h"))
        i += 1
      }
      vs.join(hub.withColumnRenamed("_v", "_hv"), col("_v") === col("_hv"), "left")
        .join(auth.withColumnRenamed("_v", "_av"), col("_v") === col("_av"), "left")
        .select(col("_v").as("doc_id"),
          coalesce(col("_h"), lit(0L)).as("hub_micro"),
          coalesce(col("_a"), lit(0L)).as("auth_micro"))
    }
    ab("hits current (bcast totals)")(
      LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2))(
      "hits scalar totals")(scalarHits(docs, old, 2))
    ab("hits scalar NO edge ckpt")(scalarHitsNoEdgeCkpt(docs, old, 2))(
      "hits scalar + edge ckpt")(scalarHits(docs, old, 2))
    // sanity: identical rows
    val a = LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2)
      .orderBy("doc_id").collect()
    val b = scalarHits(docs, old, 2).orderBy("doc_id").collect()
    println(s"[check] rows equal: ${a.sameElements(b)} (${a.length} rows)")
  }

  /** Full q187/q192/q193 bodies, r19 shape (cold off raw edges,
    * separate store checkpoint) vs r20 shape (cold off the shared
    * checkpointed history store) — interleaved in one JVM. */
  def warmab(s: SparkSession, d: String): Unit = {
    import graft.graph.LinkGraph
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    def all = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1L), col("doc_id") % 3 + 1)).as("j"))
      .select(col("src"), ((col("src") * 31 + col("j") * 7) % n).as("dst"))
    def old = all.filter(col("src") % 10 =!= 0)
    def q192old = {
      val store = LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true),
        all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2)
        .localCheckpoint(true)
      LinkGraph.hitsFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    }
    def q192new = {
      val oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
      val store = LinkGraph.mergeAdjacency(
        oldStore, all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.hitsFromStore(docs, "doc_id", oldStore, iters = 2)
        .localCheckpoint(true)
      LinkGraph.hitsFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    }
    ab("q192 r19 (cold raw)")(q192old)("q192 r20 (cold store)")(q192new)
    def q187old = {
      val store = LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true),
        all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.pageRank(docs, "doc_id", old, "src", "dst", iters = 3)
        .localCheckpoint(true)
      LinkGraph.pageRankFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    }
    def q187new = {
      val oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
      val store = LinkGraph.mergeAdjacency(
        oldStore, all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.pageRankFromStore(docs, "doc_id", oldStore, iters = 3)
        .localCheckpoint(true)
      LinkGraph.pageRankFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    }
    ab("q187 r19 (cold raw)")(q187old)("q187 r20 (cold store)")(q187new)
    def q193old = {
      val store = LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true),
        all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.labelPropagation(docs, "doc_id", old, "src", "dst",
        iters = 3).localCheckpoint(true)
      LinkGraph.labelPropagationFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    }
    def q193new = {
      val oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
      val store = LinkGraph.mergeAdjacency(
        oldStore, all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.labelPropagationFromStore(docs, "doc_id", oldStore,
        iters = 3).localCheckpoint(true)
      LinkGraph.labelPropagationFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    }
    ab("q193 r19 (cold raw)")(q193old)("q193 r20 (cold store)")(q193new)
  }

  /** q187/q192/q193: cold phase off raw edges vs off the checkpointed
    * store (spec-pinned bit-identical), plus the full bodies. */
  def graphwarm(s: SparkSession, d: String): Unit = {
    import graft.graph.LinkGraph
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    val all = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1L), col("doc_id") % 3 + 1)).as("j"))
      .select(col("src"), ((col("src") * 31 + col("j") * 7) % n).as("dst"))
    val old = all.filter(col("src") % 10 =!= 0)
    def oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
    ab("hits cold RAW edges")(
      LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2))(
      "hits cold FROM STORE")(
      LinkGraph.hitsFromStore(docs, "doc_id", oldStore, iters = 2))
    ab("pagerank cold RAW edges")(
      LinkGraph.pageRank(docs, "doc_id", old, "src", "dst", iters = 3))(
      "pagerank cold FROM STORE")(
      LinkGraph.pageRankFromStore(docs, "doc_id", oldStore, iters = 3))
    time("FULL q187")(SparkEntry.queries("q187_pagerank_warm")(s, d))
    time("FULL q192")(SparkEntry.queries("q192_hits_warm")(s, d))
    time("FULL q193")(SparkEntry.queries("q193_lpa_warm")(s, d))
  }
}
