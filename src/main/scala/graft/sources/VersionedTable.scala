package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Transactional table format over plain parquet (ref storage/delta.py:
  * 73-336 read/append/overwrite/merge/upsert/delete/restore/vacuum,
  * storage/iceberg/tables.py:349-446 read_at_snapshot/timestamp).
  *
  * Delta/Iceberg jars are absent here, so the ACID essentials are
  * rebuilt on the two primitives every Hadoop filesystem gives:
  * immutable version directories and ATOMIC single-file creation.
  * Layout:
  *
  * {{{
  * table/v=00001/part-*.parquet   ← immutable snapshot files
  * table/v=00001/_COMMITTED       ← marker; created LAST, atomically
  * table/v=00002/...              ← next snapshot (copy-on-write)
  * }}}
  *
  * A version is visible iff its `_COMMITTED` marker exists, so:
  * - **write-audit-publish**: data files land first, the audit gate
  *   runs against the STAGED files, and only then does the marker
  *   appear — a failed write/audit leaves a marker-less directory that
  *   every reader ignores (proven in SinksSpec by crashing mid-commit);
  * - **concurrent-reader safety**: readers resolve the newest committed
  *   version once and then scan immutable files — a concurrent writer
  *   can never mutate the snapshot under them (no partial-overwrite
  *   reads, the failure mode of plain `mode("overwrite")`);
  * - **time travel / restore / history**: old versions stay until
  *   [[vacuum]] expires them;
  * - **concurrent writers**: a version is claimed by `mkdirs` (atomic —
  *   exactly one writer wins a number; the loser retries on the next).
  *
  * Mutations (upsert/delete/update) are copy-on-write full-snapshot
  * rewrites — the Delta strategy minus file-level pruning of untouched
  * files. At 100 TB, pair them with partition-scoped tables (one
  * versioned table per coarse partition) or use
  * [[Sinks.writePartitionedIdempotent]] when the change set maps to
  * whole partitions; row-level merges that rewrite only matched files
  * need a real table format and are exactly why the production target
  * is Delta/Iceberg — this format keeps the SEMANTICS available and
  * testable without the jars.
  */
object VersionedTable {

  private val Marker = "_COMMITTED"
  private val VersionPrefix = "v="

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(table: String, v: Int): Path =
    new Path(table, f"$VersionPrefix$v%05d")

  /** Committed version numbers, ascending (history surface —
    * delta.py:293 get_history / :311 get_version). */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val f = fs(spark, table)
    val root = new Path(table)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(VersionPrefix))
      .map(_.getPath.getName.stripPrefix(VersionPrefix).toInt)
      .filter(v => f.exists(new Path(versionDir(table, v), Marker)))
      .sorted
  }

  /** Data-file stats of a committed version's snapshot: (bytes, files),
    * counting parquet data files only (markers, `_SUCCESS`, checksums
    * excluded). One directory listing — metadata-only, no scan; this is
    * the `bytes_written`/`files_processed` half of the reference's
    * pipeline metrics (ref core/pipeline.py:44 `PipelineMetrics`).
    * Gated on the `_COMMITTED` marker like every other read path — a
    * marker-less directory left by a crashed commit is not a version. */
  def snapshotStats(spark: SparkSession, table: String, version: Int): (Long, Long) = {
    val f = fs(spark, table)
    val dir = versionDir(table, version)
    require(f.exists(new Path(dir, Marker)),
      s"version $version not committed at $table (have ${versions(spark, table).mkString(", ")})")
    val data = f.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (data.map(_.getLen).sum, data.length.toLong)
  }

  def currentVersion(spark: SparkSession, table: String): Option[Int] =
    versions(spark, table).lastOption

  /** Snapshot read: newest committed version, or `asOf` for time
    * travel (iceberg tables.py:392 read_at_snapshot). Fails fast on an
    * empty/nonexistent table rather than returning an empty frame —
    * absence and emptiness are different states. */
  def read(spark: SparkSession, table: String, asOf: Option[Int] = None): DataFrame = {
    val committed = versions(spark, table)
    require(committed.nonEmpty, s"no committed versions at $table")
    val v = asOf.getOrElse(committed.last)
    require(committed.contains(v), s"version $v not committed at $table (have $committed)")
    spark.read.parquet(versionDir(table, v).toString)
  }

  /** Write-audit-publish commit: stage `df` as the next version, run
    * `audit` against the staged files (read back from disk — what the
    * audit sees is bit-for-bit what readers will), then publish with
    * one atomic marker creation. Any audit/write failure deletes the
    * staged directory and rethrows — the previous version stays
    * current. Returns the committed version number. */
  def commit(
      spark: SparkSession, table: String, df: DataFrame,
      audit: DataFrame => Unit = _ => ()): Int = {
    val f = fs(spark, table)
    var v = currentVersion(spark, table).getOrElse(0) + 1
    // atomic claim: exactly one writer can create a given version dir
    while (f.exists(versionDir(table, v)) || !f.mkdirs(versionDir(table, v))) v += 1
    val dir = versionDir(table, v)
    try {
      df.write.mode("overwrite").parquet(dir.toString)
      audit(spark.read.parquet(dir.toString))
      require(f.createNewFile(new Path(dir, Marker)), s"marker already exists in $dir")
      v
    } catch {
      case e: Throwable =>
        f.delete(dir, true)
        throw e
    }
  }

  /** Idempotent append keyed by a caller token (txn-app-id semantics —
    * the contract Delta's `txnAppId`/`txnVersion` gives streaming
    * writers): if ANY committed version already carries `token`, the
    * call is a no-op returning that version. The token lands as a
    * `_TXN_<token>` marker file inside the version directory BEFORE
    * the commit marker, so a retried micro-batch — the normal failure
    * mode of foreachBatch, which replays a batch id on recovery —
    * can never double-append. Token scan is one directory listing per
    * committed version (metadata-only).
    *
    * Contract: one writer per token namespace (a streaming query is a
    * single writer replaying its own batch ids — the foreachBatch
    * model). Two CONCURRENT writers racing the same fresh token could
    * both pass the scan and commit twice; cross-process same-token
    * fencing needs the catalog lock a real table format provides. */
  def appendIdempotent(
      spark: SparkSession, table: String, rows: DataFrame, token: String,
      audit: DataFrame => Unit = _ => ()): Int = {
    require(token.matches("[A-Za-z0-9._-]+"), s"token must be filename-safe, got '$token'")
    val f = fs(spark, table)
    val existing = versions(spark, table).find(v =>
      f.exists(new Path(versionDir(table, v), s"_TXN_$token")))
    existing.getOrElse {
      val base = currentVersion(spark, table).map(_ => read(spark, table))
      commitWithExtras(spark, table,
        base.map(_.unionByName(rows, allowMissingColumns = true)).getOrElse(rows),
        audit, extraMarkers = Seq(s"_TXN_$token"))
    }
  }

  /** Idempotent full-snapshot commit keyed by a caller token — the
    * [[appendIdempotent]] contract for REPLACE semantics: if any
    * committed version already carries `token`, the call is a no-op
    * returning that version; otherwise `rows` becomes the next
    * version's complete snapshot. This is the streaming
    * dimension-maintenance primitive (an SCD2 merge REPLACES the
    * dimension rather than appending to it), with the same
    * single-writer-per-token-namespace contract. */
  def replaceIdempotent(
      spark: SparkSession, table: String, rows: DataFrame, token: String,
      audit: DataFrame => Unit = _ => ()): Int = {
    require(token.matches("[A-Za-z0-9._-]+"), s"token must be filename-safe, got '$token'")
    val f = fs(spark, table)
    val existing = versions(spark, table).find(v =>
      f.exists(new Path(versionDir(table, v), s"_TXN_$token")))
    existing.getOrElse {
      commitWithExtras(spark, table, rows, audit, extraMarkers = Seq(s"_TXN_$token"))
    }
  }

  /** [[commit]] plus extra marker files created before `_COMMITTED`
    * (visible exactly when the version is). */
  private def commitWithExtras(
      spark: SparkSession, table: String, df: DataFrame,
      audit: DataFrame => Unit, extraMarkers: Seq[String]): Int = {
    val f = fs(spark, table)
    var v = currentVersion(spark, table).getOrElse(0) + 1
    while (f.exists(versionDir(table, v)) || !f.mkdirs(versionDir(table, v))) v += 1
    val dir = versionDir(table, v)
    try {
      df.write.mode("overwrite").parquet(dir.toString)
      audit(spark.read.parquet(dir.toString))
      extraMarkers.foreach(m => require(f.createNewFile(new Path(dir, m)), s"marker $m exists"))
      require(f.createNewFile(new Path(dir, Marker)), s"marker already exists in $dir")
      v
    } catch {
      case e: Throwable =>
        f.delete(dir, true)
        throw e
    }
  }

  /** delta.py:115 append: previous snapshot ∪ new rows, as one commit. */
  def append(
      spark: SparkSession, table: String, rows: DataFrame,
      audit: DataFrame => Unit = _ => ()): Int = {
    val base = currentVersion(spark, table).map(_ => read(spark, table))
    commit(spark, table, base.map(_.unionByName(rows, allowMissingColumns = true)).getOrElse(rows), audit)
  }

  /** delta.py:216 upsert (merge): source rows replace key-matched
    * target rows, unmatched source rows insert. Copy-on-write: the new
    * snapshot is `target ⟕ source` resolved per key in one join. */
  def upsert(
      spark: SparkSession, table: String, source: DataFrame, keys: Seq[String],
      audit: DataFrame => Unit = _ => ()): Int = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val target = read(spark, table)
    val kept = target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    commit(spark, table, kept.unionByName(source, allowMissingColumns = true), audit)
  }

  /** delta.py:243 delete: copy-on-write snapshot without matching rows. */
  def delete(
      spark: SparkSession, table: String, predicate: Column,
      audit: DataFrame => Unit = _ => ()): Int =
    commit(spark, table, read(spark, table).filter(!predicate || predicate.isNull), audit)

  /** delta.py:316 restore: re-commit an old snapshot as the newest
    * version (history stays intact — restore is itself versioned). */
  def restore(spark: SparkSession, table: String, toVersion: Int): Int =
    commit(spark, table, read(spark, table, Some(toVersion)))

  // ---- schema evolution (ref storage/iceberg/schemas.py:433
  // SchemaEvolution, catalog.py:263) — each evolve op is compatibility-
  // checked against the CURRENT snapshot schema and committed as a
  // normal table version, so time travel across an evolution reads each
  // version with the schema it was written under (parquet is
  // self-describing per version directory — no separate metadata log
  // needed in this format). ----

  /** Iceberg's lossless type-promotion rules (schemas.py `_is_compatible`
    * mirrors the same spec set): integral ladder up to long,
    * float→double, decimal precision growth at fixed scale. Everything
    * else — narrowing, cross-family, scale changes — is incompatible. */
  def canWiden(from: types.DataType, to: types.DataType): Boolean = {
    import types._
    (from, to) match {
      case (f, t) if f == t => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) => t.scale == f.scale && t.precision >= f.precision
      case _ => false
    }
  }

  /** schemas.py add_column: new nullable column with an optional
    * default backfill for existing rows, committed as a new version. */
  def addColumn(
      spark: SparkSession, table: String, name: String,
      dataType: types.DataType, default: Column = lit(null)): Int = {
    val cur = read(spark, table)
    require(!cur.columns.contains(name), s"column $name already exists at $table")
    commit(spark, table, cur.withColumn(name, default.cast(dataType)))
  }

  /** schemas.py rename_column: same data, new name. */
  def renameColumn(spark: SparkSession, table: String, from: String, to: String): Int = {
    val cur = read(spark, table)
    require(cur.columns.contains(from), s"column $from does not exist at $table")
    require(!cur.columns.contains(to), s"column $to already exists at $table")
    commit(spark, table, cur.withColumnRenamed(from, to))
  }

  /** schemas.py update_column (type promotion): rewrite the column at
    * the wider type — refused unless [[canWiden]] holds, so an evolve
    * can never silently lose data (the check is the point; the cast
    * itself would "succeed" lossily for plenty of illegal pairs). */
  def widenColumnType(
      spark: SparkSession, table: String, column: String, to: types.DataType): Int = {
    val cur = read(spark, table)
    val field = cur.schema.fields.find(_.name == column)
      .getOrElse(throw new IllegalArgumentException(s"column $column does not exist at $table"))
    require(canWiden(field.dataType, to),
      s"cannot widen $column: ${field.dataType.simpleString} → ${to.simpleString} is not a lossless promotion")
    commit(spark, table, cur.withColumn(column, col(column).cast(to)))
  }

  /** schemas.py delete_column. */
  def dropColumn(spark: SparkSession, table: String, name: String): Int = {
    val cur = read(spark, table)
    require(cur.columns.contains(name), s"column $name does not exist at $table")
    require(cur.columns.length > 1, s"cannot drop the last column of $table")
    commit(spark, table, cur.drop(name))
  }

  /** OPTIMIZE-style compaction (Delta's bin-packing rewrite; ref
    * storage/delta.py's maintenance surface): rewrite the current
    * snapshot into ~`targetFileBytes` files, optionally clustering
    * rows by `clusterBy` columns on the way (sorted parquet row groups
    * carry tighter min/max stats → better predicate pruning for every
    * later reader — the single cheapest read-amplification fix on a
    * streaming-ingested table full of small files). Committed as a
    * normal version: time travel still sees the un-compacted history,
    * readers never observe a half-rewritten table, and a failed
    * compaction leaves nothing behind (the WAP contract). Returns the
    * committed version. */
  def compact(
      spark: SparkSession, table: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Seq.empty): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val current = currentVersion(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed versions at $table"))
    val dir = versionDir(table, current)
    val f = fs(spark, table)
    // size the output file count from the CURRENT snapshot's real bytes
    // (not row counts — compression ratio is what matters)
    val bytes = f.listStatus(dir).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val snapshot = read(spark, table, Some(current))
    val packed =
      if (clusterBy.nonEmpty)
        // range-partition on the cluster key: each output file owns a
        // contiguous key range → min/max pruning works across files too
        snapshot.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else snapshot.coalesce(nFiles)
    commit(spark, table, packed)
  }

  /** delta.py:336 vacuum: expire all but the newest `keep` committed
    * versions (and any marker-less debris from failed writes). Readers
    * of expired versions lose time travel — same contract as Delta's
    * retention window. Returns deleted version numbers. */
  def vacuum(spark: SparkSession, table: String, keep: Int = 2): Seq[Int] = {
    require(keep >= 1, "vacuum must keep at least the current version")
    val f = fs(spark, table)
    val committed = versions(spark, table)
    val expire = committed.dropRight(keep)
    expire.foreach(v => f.delete(versionDir(table, v), true))
    // marker-less directories are failed/abandoned writes — only ones
    // BELOW the newest committed version are known-dead (a higher one
    // may be a commit in flight right now)
    val root = new Path(table)
    if (f.exists(root)) f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(VersionPrefix))
      .map(_.getPath)
      .filter { p =>
        val v = p.getName.stripPrefix(VersionPrefix).toInt
        !f.exists(new Path(p, Marker)) && committed.lastOption.exists(v < _)
      }
      .foreach(f.delete(_, true))
    expire
  }
}
