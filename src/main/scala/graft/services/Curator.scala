package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset curation: deterministic train/test/val splits
  * (ref services/dataset_curator.py:153 `_split_data`).
  *
  * The reference shuffles the whole frame with seed 42 and slices by
  * position — a driver-global operation that cannot scale. The
  * distributed-correct equivalent is hash-based assignment: each row's
  * split is a pure function of its key and the seed, so the split is
  * deterministic, stable under data reordering/repartitioning, and
  * shuffle-free (a narrow projection). Ratios are honored in
  * expectation (law of large numbers at any real scale) rather than by
  * exact floor-plus-remainder counts — the price of not sorting 100 TB.
  */
object Curator {

  /** Knuth multiplicative hash → [0, 1). Pure 64-bit integer
    * arithmetic, reproducible in any engine (the portable alternative
    * to xxhash64 for cross-engine checks). Keys must be integral.
    * pmod, not %: Spark's % preserves the dividend's sign, so a
    * negative key (or a product wrapped past 2⁶³ — keys ≥ ~3.47e9
    * with seed 42) would yield a NEGATIVE fraction that every
    * `frac < p` consumer silently over-accepts. The DuckDB oracle
    * replays the formula with plain % over non-negative fixture keys,
    * where pmod and % coincide — an oracle over signed keys must spell
    * it `((x % m) + m) % m`. */
  def portableFraction(key: Column, seed: Long): Column =
    pmod((key + seed) * lit(2654435761L), lit(4294967296L)) / lit(4294967296.0)

  /** xxhash64-based fraction — the Spark-native default (codegen'd,
    * works for any key type). */
  def hashFraction(key: Column, seed: Long): Column =
    (pmod(xxhash64(key, lit(seed)), lit(1000000000L))) / lit(1000000000.0)

  /** dataset_curator.py:40 DatasetMetadata, the data-derived part: one
    * aggregate pass over a split-labeled dataset → per-split row counts
    * plus totals, with the schema rendered driver-side (schema is
    * metadata, not data). */
  def manifest(
      split: DataFrame,
      splitCol: String = "split"): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    split.groupBy(col(splitCol))
      .agg(cnt(lit(1)).as("n_rows"))
      .withColumn("schema",
        lit(split.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")))
  }

  /** Token-window chunking with overlap — the retrieval/RAG and
    * long-context prep step (split every document into ≤ `maxTokens`
    * -token windows, consecutive windows sharing `overlap` tokens so
    * no span is cut mid-context). Stride is `maxTokens − overlap`;
    * a document of n tokens yields `1 + ⌈(n − maxTokens)/stride⌉`
    * chunks (one chunk when n ≤ maxTokens); the final chunk may be
    * short but is never empty. Tokenization is the corpus-standard
    * lowercased alphanumeric split; documents with zero tokens yield
    * zero chunks (chunking feeds an index — there is nothing to
    * index — unlike the analysis queries' never-dropped discipline).
    *
    * Scale shape: a pure narrow projection — explode is per-row over
    * that row's own token array, no shuffle, no join; chunk text is
    * rebuilt with slice/array_join inside codegen. Reference has no
    * counterpart (training-pipeline extension).
    * → (id, chunk_idx, chunk_text, n_chunk_tokens) */
  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap of $maxTokens")
    val stride = maxTokens - overlap
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    // exact integer ceil: floor of double division is safe here
    // (operands are exact in double well past any document length)
    val nChunks = when(col("_n") <= maxTokens, lit(1))
      .otherwise(floor((col("_n") - maxTokens + (stride - 1)) / stride).cast("int") + 1)
    df.select(col(idCol).as("id"), ws.as("_ws"))
      .select(col("id"), col("_ws"), size(col("_ws")).as("_n"))
      .filter(col("_n") > 0)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), nChunks - 1),
        i => struct(
          array_join(slice(col("_ws"), i * stride + 1, lit(maxTokens)), " ").as("t"),
          least(lit(maxTokens), col("_n") - i * stride).cast("long").as("n")))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col.t").as("chunk_text"), col("col.n").as("n_chunk_tokens"))
  }

  /** Class-balance downsampling to target proportions — the mixture
    * rebalance a pretraining pipeline applies per language/domain/
    * source before training (dataset_curator.py stops at split
    * ratios; this is the curation step its users script around it).
    *
    * Downsample-only: the feasible scale is K = min_i(n_i / t_i), so
    * the scarcest stratum is kept whole and every other stratum keeps
    * K·t_i rows — the largest dataset with EXACTLY the target mix
    * that needs no upsampling. ONE count pass computes the per-stratum
    * keep fractions; membership is the deterministic hash fraction
    * (`frac(key) < keep_i`), so the sample is stable under
    * reordering/repartitioning and — with `portable = true` — bit
    * -replayable in any engine (threshold arithmetic is ordered
    * identically to the SQL oracle's: K · t / n). Strata absent from
    * `targets` are dropped (target 0). */
  def rebalance(
      df: DataFrame,
      key: Column,
      stratumCol: String,
      targets: Map[String, Double],
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(targets.nonEmpty, "rebalance needs at least one target stratum")
    require(targets.values.forall(_ > 0), "target proportions must be positive")
    val total = targets.values.sum
    val norm = targets.view.mapValues(_ / total).toMap
    // count ONLY the targeted strata: the driver read is bounded by
    // |targets|, not by the stratum column's cardinality (an id-like
    // column passed by mistake would otherwise collect the table)
    val counts = df.filter(col(stratumCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val present = norm.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    if (present.isEmpty) return df.filter(lit(false))
    val k = present.map { case (s, t) => counts(s) / t }.min
    val frac = if (portable) portableFraction(key, seed) else hashFraction(key, seed)
    val keepExpr = present.toSeq.sortBy(_._1).foldLeft(when(lit(false), 0.0)) {
      case (acc, (s, t)) =>
        acc.when(col(stratumCol) === s, lit(math.min(1.0, k * t / counts(s))))
    }.otherwise(lit(0.0))
    df.filter(frac < keepExpr)
  }

  /** Temperature-scaled mixture targets — the published multilingual
    * mixing rule (mC4/PaLM-style: sample stratum i with probability
    * ∝ nᵢ^α): α = 1 reproduces the natural distribution, α = 0 is
    * uniform, in between up-weights tail languages/domains without
    * drowning the head. One count pass over the named strata (driver
    * read bounded by |strata|, the [[rebalance]] guard), targets feed
    * [[rebalance]] directly:
    * {{{ rebalance(df, key, c, temperatureTargets(df, c, strata, 0.7)) }}} */
  def temperatureTargets(
      df: DataFrame, stratumCol: String,
      strata: Seq[String], alpha: Double): Map[String, Double] = {
    require(strata.nonEmpty, "temperatureTargets needs at least one stratum")
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    val counts = df.filter(col(stratumCol).isin(strata: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exclude absent strata BEFORE the pow: 0^0 == 1.0 at alpha = 0
    // would hand a zero-count stratum a full uniform share
    val powered = strata.filter(s => counts.getOrElse(s, 0L) > 0)
      .map(s => s -> math.pow(counts(s).toDouble, alpha))
    val z = powered.map(_._2).sum
    powered.map { case (s, w) => s -> w / z }.toMap
  }

  /** Greedy sequence PACKING for training-batch assembly: assign each
    * document to a pack whose token budget is `maxTokensPerPack`, so a
    * trainer reads fixed-budget sequences with minimal padding — the
    * step between curation and the dataloader that the rest of the
    * pipeline (dedup → filter → split) feeds.
    *
    * Bin packing is inherently sequential, so the distributed shape is
    * SALTED INDEPENDENCE: docs hash into `groups` deterministic groups
    * (pure function of the id — stable under repartitioning), each
    * group is packed INDEPENDENTLY with first-fit-decreasing (the
    * classic ≤ 11/9·OPT + 1 guarantee per group), and pack ids are
    * (group, bin) pairs — so the result is reproducible at any
    * parallelism and the only movement is ONE shuffle on the group
    * key. Per-group state is O(bins of one group); this is the
    * sanctioned `mapPartitions` case (a running-capacity reset that
    * window functions cannot express). A document longer than the
    * budget gets a pack of its own (callers decide whether to chunk it
    * first). Requires an integral id and a token-count column
    * (see [[graft.text.TextAnalysis]] for counting).
    * → (idCol, pack_id, nTokensCol) */
  def packSequences(
      df: DataFrame, idCol: String, nTokensCol: String,
      maxTokensPerPack: Long, groups: Int = 4096): DataFrame = {
    require(maxTokensPerPack > 0, s"maxTokensPerPack must be positive, got $maxTokensPerPack")
    require(groups > 0 && groups <= (1 << 20), s"groups must be in [1, 2^20], got $groups")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(
        pmod(xxhash64(col(idCol)), lit(groups.toLong)).as("_grp"),
        col(idCol).cast("long").as("_id"),
        col(nTokensCol).cast("long").as("_n"))
      .repartition(col("_grp"))
      .sortWithinPartitions(col("_grp"), col("_n").desc, col("_id"))
      .as[(Long, Long, Long)]
    rows.mapPartitions { it =>
      // groups arrive contiguous (sorted by _grp) and length-descending
      // within each: first-fit-decreasing with per-group bin state
      var curGrp = -1L
      var bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { case (grp, id, n) =>
        if (grp != curGrp) {
          curGrp = grp
          bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        }
        var b = 0
        while (b < bins.length && bins(b) < n) b += 1
        if (b == bins.length) bins += maxTokensPerPack
        bins(b) -= n // an oversize doc drives its bin negative: closed
        (id, grp * (1L << 32) + b, n)
      }
    }.toDF(idCol, "pack_id", nTokensCol)
  }

  /** Assign a split label per row. `ratios` are normalized; assignment
    * walks the cumulative distribution. */
  def assignSplits(
      df: DataFrame,
      key: Column,
      ratios: Seq[(String, Double)],
      seed: Long = 42L,
      portable: Boolean = false,
      outputCol: String = "split"): DataFrame = {
    require(ratios.nonEmpty, "assignSplits needs at least one split")
    val total = ratios.map(_._2).sum
    val frac = if (portable) portableFraction(key, seed) else hashFraction(key, seed)
    // Round cumulative thresholds to 9 decimals so 0.8 + 0.1 is the
    // double literal 0.9, not 0.9000000000000001 — keeps thresholds
    // identical to what any other engine would parse from "0.9".
    val cumulative = ratios.init
      .scanLeft(0.0) { case (acc, (_, r)) => math.rint((acc + r / total) * 1e9) / 1e9 }
      .tail
    val expr = ratios.init.zip(cumulative).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cum)) => acc.when(frac < cum, name)
    }.otherwise(ratios.last._1)
    df.withColumn(outputCol, expr)
  }

  /** Multi-epoch oversampling to a TOKEN budget — the REPEAT half of
    * data mixing that [[rebalance]] (downsample-only: scale pins to
    * the scarcest stratum kept whole) cannot express. Published
    * pretraining mixtures hit target weights by giving small
    * high-quality sources MORE than one epoch (GPT-3's "epochs
    * elapsed when training" column — Wikipedia at 3.4 epochs;
    * Muennighoff et al. 2023 on repeat value in data-constrained
    * scaling): each targeted stratum s with token mass tokᵢ and
    * normalized weight wᵢ is replayed epochsᵢ = budget·wᵢ / tokᵢ
    * times, capped at `maxEpochs` — ⌊epochsᵢ⌋ full copies plus a
    * deterministic hash-selected partial copy for the fraction.
    *
    * Scale shape: one |targets|-bounded token-sum pass (the
    * [[rebalance]] driver-read guard), then a PURE NARROW projection —
    * per row, explode a ≤ ⌈epochs⌉-element epoch sequence and filter
    * the last epoch by the same hash-fraction family as
    * [[assignSplits]]; no join, no shuffle, output rows ∝ the token
    * budget. The partial-epoch slice is a pure function of (key,
    * seed), so every epoch of a document is the SAME document set
    * decision under re-runs and repartitioning, and `portable = true`
    * makes the whole plan replayable in any engine (the DuckDB oracle
    * does, double-for-double: epochs is computed as
    * (budget·(w/Σw)) / tok in both).
    * → input columns + (epoch int, 0-based). */
  def epochMix(
      df: DataFrame,
      key: Column,
      stratumCol: String,
      nTokensCol: String,
      weights: Map[String, Double],
      tokenBudget: Long,
      maxEpochs: Double = 16.0,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "epochMix needs at least one target stratum")
    require(weights.values.forall(_ > 0), "mixture weights must be positive")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(maxEpochs >= 1.0, s"maxEpochs must be at least 1, got $maxEpochs")
    val total = weights.values.sum
    val toks = df.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(sum(col(nTokensCol).cast("long")).as("tok"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => toks.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.filter(lit(false)).withColumn("epoch", lit(0))
    // per-stratum plan, arithmetic ordered exactly as documented so an
    // oracle replay is bit-identical: need = budget·(w/Σw), epochs =
    // min(maxEpochs, need / tok), nFull = ⌊epochs⌋, part = epochs − nFull
    val plan = present.toSeq.sortBy(_._1).map { case (s, w) =>
      val epochs = math.min(maxEpochs, (tokenBudget * (w / total)) / toks(s))
      EpochPlan(s, math.floor(epochs).toInt, epochs - math.floor(epochs))
    }
    applyEpochPlan(df, key, stratumCol, plan, seed, portable)
  }

  /** EXACT per-stratum downsampling — keep exactly min(kᵢ, nᵢ) rows
    * of stratum s, the eval-set/labeling-budget companion to
    * [[rebalance]] (which holds ratios only in expectation): "exactly
    * 5k docs per language for the benchmark" is a count contract, not
    * a ratio. Selection order is the deterministic hash of the key
    * (tie-broken by the key), so the chosen rows are a pure function
    * of (corpus, seed) — stable under repartitioning and replayable by
    * any engine under `portable = true`.
    *
    * Scale shape: one hash exchange on the stratum (the Window's
    * partitionBy) + per-partition sort — and the literal max(kᵢ)
    * bound is a SEPARATE conjunct so Spark's rank-limit pushdown
    * (WindowGroupLimit) keeps each map task's contribution to
    * max(kᵢ) rows BEFORE the exchange: the shuffle moves
    * O(partitions · max k), not the corpus. A hot stratum therefore
    * cannot flood its reducer. Per-stratum caps then trim to exact
    * counts. → input columns, exactly min(kᵢ, nᵢ) rows per stratum. */
  def sampleExact(
      df: DataFrame,
      key: Column,
      stratumCol: String,
      counts: Map[String, Long],
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(counts.nonEmpty, "sampleExact needs at least one stratum")
    require(counts.values.forall(_ > 0), "per-stratum counts must be positive")
    import org.apache.spark.sql.expressions.Window
    val frac = if (portable) portableFraction(key, seed) else hashFraction(key, seed)
    val kExpr = counts.toSeq.sortBy(_._1).foldLeft(when(lit(false), 0L)) {
      case (acc, (s, k)) => acc.when(col(stratumCol) === s, lit(k))
    }.otherwise(lit(0L))
    val maxK = counts.values.max
    val rank = row_number()
      .over(Window.partitionBy(col(stratumCol)).orderBy(frac, key))
      .cast("long")
    df.filter(col(stratumCol).isin(counts.keys.toSeq: _*))
      .withColumn("_rk", rank)
      // literal conjunct first: this is the WindowGroupLimit trigger
      .filter(col("_rk") <= lit(maxK) && col("_rk") <= kExpr)
      .drop("_rk")
  }

  /** One stratum's share of an epoch plan: `nFull` whole copies plus
    * the `partialFrac` hash-selected slice of one more. */
  final case class EpochPlan(stratum: String, nFull: Int, partialFrac: Double) {
    require(nFull >= 0 && partialFrac >= 0.0 && partialFrac < 1.0,
      s"invalid epoch plan for $stratum: $nFull full + $partialFrac partial")
  }

  /** The materialization half of [[epochMix]], usable standalone with
    * a precomputed plan — the q135 train/score division: the token
    * count pass is the bounded offline step, THIS is the 100 TB (and
    * streaming-composable, append-mode) path — plan literals only, a
    * per-row epoch explode and a hash filter; no join, no shuffle, no
    * state. */
  def applyEpochPlan(
      df: DataFrame,
      key: Column,
      stratumCol: String,
      plan: Seq[EpochPlan],
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(plan.nonEmpty, "applyEpochPlan needs at least one stratum")
    val nFullExpr = plan.foldLeft(when(lit(false), 0)) {
      case (acc, p) => acc.when(col(stratumCol) === p.stratum, lit(p.nFull))
    }.otherwise(lit(0))
    val partExpr = plan.foldLeft(when(lit(false), 0.0)) {
      case (acc, p) => acc.when(col(stratumCol) === p.stratum, lit(p.partialFrac))
    }.otherwise(lit(0.0))
    val frac = if (portable) portableFraction(key, seed) else hashFraction(key, seed)
    df.filter(col(stratumCol).isin(plan.map(_.stratum): _*))
      // sequence end is inclusive: epoch nFull is the candidate partial
      // copy, kept only for the hash-selected fraction (dropped whole
      // when partialFrac == 0 — frac is never negative)
      .withColumn("epoch", explode(sequence(lit(0), nFullExpr)))
      .filter(col("epoch") < nFullExpr || frac < partExpr)
  }

  /** Deterministic training-order sharding — the "global shuffle" a
    * pretraining pipeline runs before serving so consumption order is
    * (a) random with respect to source/crawl order, (b) reproducible
    * from (corpus, seed) alone, and (c) addressable: every row gets
    * (`shard`, `shard_pos`) and a trainer reads its shards in
    * shard_pos order. The reference curates frames but leaves ordering
    * to a driver-global `sample(frac=1)` shuffle (ref
    * services/dataset_curator.py:153 `_split_data`'s seeded shuffle) —
    * which cannot scale; this is the distributed-correct equivalent.
    *
    * Scale shape: a TOTAL-order sort of 100 TB (one range exchange +
    * global sort) is wasteful when shards are consumed independently,
    * so the permutation is hash-bucketing + per-shard rank: ONE hash
    * exchange on `shard` (the Window's partitionBy is the shuffle key)
    * and a per-partition sort. Each shard sorts within one task —
    * size `nShards` like output files, corpus_bytes / ~1 GB (100 TB →
    * ~100k shards), NOT trainer-rank count; a trainer rank then owns
    * nShards/world_size whole shards. Ordering is keyed hash with the
    * row key as tiebreak, so the permutation is total and
    * re-evaluation-stable. `portable = true` switches xxhash64 to the
    * md5-derived 60-bit key (the q93 fingerprint scheme) so any engine
    * can replay the exact order (the DuckDB oracle does).
    * → input columns + (shard long, shard_pos long). */
  /** Scale-safe GLOBAL ranking — curriculum ordering (score the
    * corpus, train easy-to-hard), leaderboard exports, reproducible
    * "take the global top fraction" cuts. The naive spelling,
    * `row_number().over(Window.orderBy(...))`, funnels 100 TB through
    * ONE partition; this is the two-pass range scheme instead (what
    * RDD.zipWithIndex does, kept in DataFrame land):
    *
    *   1. rank over a NARROW (id, order-key) frame — the lean-payload
    *      rule: pass a projection, not the full table, so document
    *      text never rides a ranking shuffle (`orderCols` may carry
    *      sort direction, e.g. `col("score").desc`);
    *   2. `repartitionByRange` on the order keys (+ id as the strict
    *      tiebreaker, so the total order — and therefore every rank —
    *      is unique and boundary-placement-independent);
    *   3. count rows per range partition (bounded driver read:
    *      ≤ numRanges longs), prefix-sum into offsets;
    *   4. broadcast-join the offsets and add the per-partition
    *      `row_number` — the window partitions by partition id, so
    *      its exchange moves narrow rows only and no partition sees
    *      more than its range.
    *
    * AQE may coalesce adjacent ranges; adjacency preserves the global
    * order, and ranks don't depend on where boundaries fall. Rank is
    * 1-based, dense, and deterministic. → (idCol, rank: long);
    * callers join the payload back by id. */
  def globalRank(
      df: DataFrame, idCol: String, orderCols: Seq[Column],
      numRanges: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    require(numRanges >= 0 && numRanges <= (1 << 20),
      s"numRanges must be in [0, 2^20], got $numRanges")
    val spark = df.sparkSession
    val n = if (numRanges > 0) numRanges
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = orderCols :+ col(idCol)
    val ranged = df
      .repartitionByRange(n, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // counted once, ranked once — not two lineage replays
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    import org.apache.spark.sql.expressions.Window
    ranged
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn("rank",
        (col("_off") +
          row_number().over(Window.partitionBy(col("_pid")).orderBy(keys: _*)))
          .cast("long"))
      .select(col(idCol), col("rank"))
  }

  def shardCorpus(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val id = col(idCol)
    val key = if (portable)
      conv(substring(md5(concat(id.cast("string"), lit(":"), lit(seed.toString))), 1, 15), 16, 10)
        .cast("long")
    else xxhash64(id, lit(seed))
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_ord", key)
      .withColumn("shard", pmod(col("_ord"), lit(nShards.toLong)))
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("_ord"), id))
          .cast("long"))
      .drop("_ord")
  }

  /** Deterministic weighted sampling without replacement — A-Res
    * (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    * reservoir"): every row draws u ∈ (0, 1] and competes with key
    * u^(1/w); the k largest keys are the sample, and each row's
    * inclusion probability tracks its weight. Here u comes from a
    * seeded md5 avalanche hash of the id (same draw in any engine,
    * any retry — the curation stance: sampling is a FUNCTION of the
    * data, not of the run; md5 rather than the Weyl-style
    * [[portableFraction]] because a single multiplicative step gives
    * consecutive ids draws a fixed ~0.618 stride apart — strongly
    * correlated, so the paper's per-row-independence assumption
    * behind "inclusion probability tracks weight" would hold only
    * marginally — and its (id+seed)·K product overflows long under
    * ANSI past id ≈ 3.4e9; avalanche mixing restores approximate
    * pairwise independence while keeping full determinism — the
    * residual trade is determinism vs TRUE independence, which no
    * data-derived draw can give). The key is compared in log space
    * on the micro-nat grid: ln(u) quantized to a BIGINT once (the
    * q129 discipline), then one exact-IEEE division by the weight —
    * monotone in u^(1/w), so the selected SET is the paper's.
    *
    * Scale shape: a narrow per-row projection, then top-k by
    * (key desc, id asc) — TakeOrdered for bounded k (per-partition
    * heaps, only k rows move; the [[graft.text.TextAnalysis.dsirSelect]]
    * plan note applies: huge k falls back to a range sort, prefer a
    * calibrated threshold there). Rows with weight ≤ 0 are excluded —
    * zero mass means zero chance. → df + (sample_key)
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // 60-bit md5 slice, (h + 1)/2^60 ∈ (0, 1]: u = 0 would put ln at
    // -inf; DuckDB replays it as CAST(concat('0x', substr(md5(..),
    // 1, 15)) AS BIGINT) — the repo's standard portable-hash pair
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":"), lit(seed.toString))), 1, 15), 16, 10).cast("long") + 1L) /
      lit(1152921504606846976.0)
    df.filter(col(weightCol) > 0)
      .withColumn("_lnu", floor(log(u) * 1e6 + 0.5).cast("long"))
      .withColumn("sample_key", col("_lnu").cast("double") / col(weightCol))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
      .drop("_lnu")
  }
}
