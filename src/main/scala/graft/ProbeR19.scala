package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 optimization-round probe: time SUB-STAGES of the expensive
  * queries in isolation (noop sink, 3 reps, min) so a query's wall
  * splits into attributable pieces. Instrument only — never part of
  * the driver contract. Usage: graft.ProbeR19 <probe> [sfDir]. */
object ProbeR19 {

  private def time(name: String)(df: => DataFrame): Unit = {
    // df is BY-NAME and re-evaluated per rep: checkpoint-bearing frames
    // must rebuild (and re-materialize) each rep, as the bench does.
    df.write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $name%-40s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
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
      case "containment" => containment(spark, sfDir)
      case "hits" => hitsProbe(spark, sfDir)
      case "prefixab" => prefixAb(spark, sfDir)
      case "coverage" => coverage(spark, sfDir)
      case other => println(s"unknown probe: $other")
    }
    spark.stop()
  }

  /** Interleaved A/B of two dataflow shapes in ONE JVM — immune to the
    * host's multi-minute noise phases in a way back-to-back runs of
    * two binaries are not. */
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
    println(f"[ab] A=$nameA%-32s min=${as.result().min}%.3f  meds=${as.result().sorted.mkString(",")}")
    println(f"[ab] B=$nameB%-32s min=${bs.result().min}%.3f  meds=${bs.result().sorted.mkString(",")}")
  }

  def prefixAb(s: SparkSession, d: String): Unit = {
    import graft.dedup.TextDedup
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val snip = base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 10000000).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
    val sets = TextDedup.shingleSets(base.unionByName(snip), "doc_id", "text", N)
      .localCheckpoint(true)
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    def attach = graft.ops.Skew.hotColdJoin(sets, freq, "item", "_df", 1000L)
    val t = 0.9
    def prefixOld = attach
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("_df"), col("item")))).as("_sorted"))
      .select(col("id"), size(col("_sorted")).as("sz"), col("_sorted"))
      .select(col("id"), col("sz"),
        explode(slice(col("_sorted"), lit(1),
          (col("sz") - ceil(lit(t) * col("sz")) + 1).cast("int"))("item")).as("item"))
    def prefixNew = {
      val w = Window.partitionBy("id").orderBy(col("_df"), col("item"))
      val wAll = Window.partitionBy("id")
      attach
        .select(col("id"), col("item"),
          row_number().over(w).as("_rn"),
          count(lit(1)).over(wAll).as("sz"))
        .filter(col("_rn") <= (col("sz") - ceil(lit(t) * col("sz")) + 1).cast("int"))
        .select(col("id"), col("sz"), col("item"))
    }
    ab("prefix sort_array")(prefixOld)("prefix window")(prefixNew)
    // and the two verify shapes over identical candidates
    val cand = prefixOld.toDF("id_a", "sza", "item")
      .join(sets.join(sets.groupBy("id").agg(count(lit(1)).as("_szb")), "id")
        .toDF("id_b", "item", "szb"), "item")
      .filter(col("id_a") =!= col("id_b") && col("szb") >= lit(t) * col("sza"))
      .select("id_a", "id_b").distinct().localCheckpoint(true)
    def verifyOld = TextDedup.verifyContainment(cand, sets, t)
    def verifyNew = {
      val sizesA = sets.groupBy("id").agg(count(lit(1)).as("_sza"))
      val aItems = cand.join(sets.toDF("id_a", "item"), "id_a")
      val inter = aItems
        .join(sets.toDF("id_b", "item"), Seq("id_b", "item"), "left_semi")
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("_i"))
      inter.join(sizesA.toDF("id_a", "_sza"), "id_a")
        .withColumn("containment", col("_i").cast("double") / col("_sza"))
        .filter(col("containment") >= t)
        .select("id_a", "id_b", "containment")
    }
    ab("verify members-groupBy")(verifyOld)("verify semi-join")(verifyNew)
  }

  private def N = 3

  def containment(s: SparkSession, d: String): Unit = {
    import graft.dedup.TextDedup
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val snip = base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 10000000).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
    def sets0 = TextDedup.shingleSets(base.unionByName(snip), "doc_id", "text", N)
    time("shingleSets+distinct")(sets0)
    val sets = sets0.localCheckpoint(true)
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    time("freq(groupBy item)")(freq)
    val attach = graft.ops.Skew.hotColdJoin(sets, freq, "item", "_df", 100000L)
    time("hotColdJoin attach")(attach)
    val prefixes = attach
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("_df"), col("item")))).as("_sorted"))
      .select(col("id"), size(col("_sorted")).as("sz"), col("_sorted"))
      .select(col("id"), col("sz"),
        explode(slice(col("_sorted"), lit(1),
          (col("sz") - ceil(lit(0.9) * col("sz")) + 1).cast("int"))("item")).as("item"))
    time("prefixes (sort_array groupBy)")(prefixes)
    val pfx = prefixes.localCheckpoint(true)
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("_szb"))
    val index = sets.join(sizes, "id")
    val cand = pfx.toDF("id_a", "sza", "item")
      .join(index.toDF("id_b", "item", "szb"), "item")
      .filter(col("id_a") =!= col("id_b") &&
        col("szb") >= lit(0.9) * col("sza"))
      .select("id_a", "id_b")
      .distinct()
    time("candidate join+distinct")(cand)
    val cd = cand.localCheckpoint(true)
    time("verifyContainment")(TextDedup.verifyContainment(cd, sets, 0.9))
    time("FULL containmentPairs")(TextDedup.containmentPairs(sets, 0.9))
  }

  def coverage(s: SparkSession, d: String): Unit = {
    import graft.text.TextAnalysis
    val docs = Tables.documents(s, d)
    def model = TextAnalysis.charNgramModel(
      docs.filter(col("doc_id") % 2 === 0), "text", n = 3)
    time("model build (explode+groupBy)")(model)
    val mckpt = model.localCheckpoint(true)
    time("scoring (explode+bjoin+groupBy)")(
      TextAnalysis.coverageScore(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", mckpt,
        n = 3, minCount = 64L))
    val t = lower(col("text"))
    time("scoring explode only")(
      docs.filter(col("doc_id") % 2 === 1).select(col("doc_id").as("id"),
        explode(when(length(t) >= 3, transform(
          sequence(lit(1), length(t) - 2),
          i => t.substr(i, lit(3))))).as("gram")))
    time("FULL q122")(SparkEntry.queries("q122_coverage")(s, d))
    def explodeCur = docs.filter(col("doc_id") % 2 === 1).select(col("doc_id").as("id"),
      explode(when(length(t) >= 3, transform(
        sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3))))).as("gram"))
    def explodeHoist = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("id"), lower(col("text")).as("_lt"))
      .select(col("id"),
        explode(when(length(col("_lt")) >= 3, transform(
          sequence(lit(1), length(col("_lt")) - 2),
          i => col("_lt").substr(i, lit(3))))).as("gram"))
    ab("explode lower-in-lambda")(explodeCur)("explode hoisted lower")(explodeHoist)
  }

  def hitsProbe(s: SparkSession, d: String): Unit = {
    import graft.graph.LinkGraph
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    // same construction as WebQueries.webgraph (private there)
    val all = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1L), col("doc_id") % 3 + 1)).as("j"))
      .select(col("src"), ((col("src") * 31 + col("j") * 7) % n).as("dst"))
    time("webgraph edges")(all)
    val old = all.filter(col("src") % 10 =!= 0)
    time("adjacencyStore(old)+merge")(
      LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst"),
        all.filter(col("src") % 10 === 0), "src", "dst"))
    time("hits cold 2 iters")(LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2))
    time("hits cold 2 iters + eager ckpt")(
      LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2).localCheckpoint(true))
    time("FULL q192 body")({
      val store = LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true),
        all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.hits(docs, "doc_id", old, "src", "dst", iters = 2)
        .localCheckpoint(true)
      LinkGraph.hitsFromStore(docs, "doc_id", store, iters = 2, seed = Some(seed))
    })
  }
}
