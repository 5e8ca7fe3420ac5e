package graft

import org.apache.spark.sql.functions._

import graft.services.Curator

/** Sequence packing for training-batch assembly: budget compliance,
  * FFD efficiency, determinism under repartitioning, oversize docs. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = (1L to 2000L)
    .map(i => (i, 1L + (i * 37) % 700)) // lengths 1..700, deterministic
    .toDF("doc_id", "n_tokens")

  test("chunkDocs: overlap windows, exact boundary, short docs one chunk, empty docs none") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks → 3 chunks
      (2L, "a b c"),                                  // ≤ maxTokens → 1 chunk
      (3L, ""),                                       // 0 toks → 0 chunks
      (4L, (1 to 7).map(i => s"s$i").mkString(" ")))  // (n−maxT) divisible by stride
      .toDF("doc_id", "text")
    val r = Curator.chunkDocs(docs, "doc_id", "text", maxTokens = 4, overlap = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> ((x.getString(2), x.getLong(3)))).toMap
    assert(r.keys.map(_._1).toSet == Set(1L, 2L, 4L), "empty docs yield no chunks")
    assert(r((1L, 0L)) == (("t1 t2 t3 t4", 4L)))
    assert(r((1L, 1L)) == (("t4 t5 t6 t7", 4L)), "consecutive chunks share `overlap` tokens")
    assert(r((1L, 2L)) == (("t7 t8 t9 t10", 4L)))
    assert(r((2L, 0L)) == (("a b c", 3L)))
    assert(r((4L, 0L)) == (("s1 s2 s3 s4", 4L)))
    assert(r((4L, 1L)) == (("s4 s5 s6 s7", 4L)), "exact boundary must not emit an empty tail chunk")
    assert(r.size == 6)
  }

  test("chunkDocs: every token position is covered by some chunk; args validated") {
    val docs = Seq((1L, (1 to 137).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val covered = Curator.chunkDocs(docs, "doc_id", "text", maxTokens = 32, overlap = 8)
      .select(explode(split(col("chunk_text"), " ")).as("t"))
      .distinct().count()
    assert(covered == 137, "no token may fall between chunks")
    intercept[IllegalArgumentException](
      Curator.chunkDocs(docs, "doc_id", "text", maxTokens = 4, overlap = 4))
    intercept[IllegalArgumentException](
      Curator.chunkDocs(docs, "doc_id", "text", maxTokens = 0))
  }

  test("every doc packed once; every pack within budget; FFD is tight") {
    val max = 2048L
    val packed = Curator.packSequences(docs, "doc_id", "n_tokens", max)
    assert(packed.count() == 2000)
    assert(packed.select("doc_id").distinct().count() == 2000)
    val packs = packed.groupBy("pack_id").agg(sum("n_tokens").as("tok"))
    assert(packs.filter(col("tok") > max).count() == 0, "no pack may exceed the budget")
    // efficiency: FFD per group ≤ 11/9·OPT + 1; with 4096 salt groups a
    // 2000-doc corpus is group-sparse, so just bound against the ideal
    // with the per-group +1 slack
    val nPacks = packs.count()
    val totalTokens = 2000L * 0 + docs.agg(sum("n_tokens")).head().getLong(0)
    val ideal = math.ceil(totalTokens.toDouble / max).toLong
    val groupsUsed = packed.select((col("pack_id") / (1L << 32)).cast("long")).distinct().count()
    assert(nPacks <= ideal * 2 + groupsUsed,
      s"$nPacks packs vs ideal $ideal over $groupsUsed groups")
    // fewer salt groups → denser packing approaches the ideal
    val dense = Curator.packSequences(docs, "doc_id", "n_tokens", max, groups = 8)
    val densePacks = dense.groupBy("pack_id").agg(sum("n_tokens").as("tok"))
    assert(densePacks.filter(col("tok") > max).count() == 0)
    assert(densePacks.count() <= math.ceil(ideal * 11.0 / 9.0).toLong + 8,
      s"FFD bound violated: ${densePacks.count()} vs ideal $ideal")
  }

  test("deterministic: assignments are a pure function of id, not partitioning") {
    val a = Curator.packSequences(docs, "doc_id", "n_tokens", 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Curator.packSequences(docs.repartition(13).sortWithinPartitions("n_tokens"),
        "doc_id", "n_tokens", 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("oversize docs get a pack of their own; budget holds for the rest") {
    val mixed = Seq((1L, 5000L), (2L, 400L), (3L, 400L), (4L, 5000L))
      .toDF("doc_id", "n_tokens")
    val packed = Curator.packSequences(mixed, "doc_id", "n_tokens", 1000, groups = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed(1L) != packed(2L) && packed(1L) != packed(4L),
      "an oversize doc must not share its pack")
    assert(packed(2L) == packed(3L), "two 400s fit one 1000-budget pack")
    intercept[IllegalArgumentException](
      Curator.packSequences(mixed, "doc_id", "n_tokens", 0))
  }
}
