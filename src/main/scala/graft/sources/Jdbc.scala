package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** Generic JDBC connector (ref connectors/databases/postgresql.py:100-187,
  * mysql.py, snowflake.py:134-150, bigquery.py — every reference database
  * connector reduces to: extract(query|table, columns, filter),
  * extract_incremental(watermark column), plus a write path).
  *
  * The reference builds SQL strings because its engine cannot push
  * computation into the database. Spark's JDBC source can: column
  * pruning and filter pushdown reach the remote scan automatically
  * (`PushedFilters` in the plan), so the Spark-native surface is simply
  * a partition-aware reader returning a DataFrame — callers compose
  * `.select`/`.filter` and the database sees the reduced query. The
  * reference's `extract_incremental` becomes a pushed-down range filter
  * (pair with [[graft.extraction.Incremental]] for pinned-bound batch
  * semantics and watermark persistence).
  *
  * Scale notes: an unpartitioned JDBC read is ONE connection pulling the
  * whole table through a single task — never acceptable for a large
  * table, which is why [[JdbcPartitioning]] (stride on a numeric/temporal
  * column → numPartitions parallel range queries) or `predicates` (one
  * partition per caller-supplied WHERE clause, for skew or non-numeric
  * keys) are first-class here, mirroring
  * partitionColumn/lowerBound/upperBound/numPartitions in the Spark API.
  * `fetchSize` bounds per-round-trip row batches so executors stream
  * instead of buffering the partition.
  */
object Jdbc {

  final case class JdbcSource(
      url: String,
      driver: Option[String] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      fetchSize: Int = 10000,
      extraOptions: Map[String, String] = Map.empty)

  /** Range-stride partitioning: numPartitions parallel queries, each
    * scanning [lower + i·stride, lower + (i+1)·stride) on `column`.
    * Bounds only steer the split points — rows outside them are still
    * read (by the unbounded first/last partitions). */
  final case class JdbcPartitioning(
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int) {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    require(lowerBound < upperBound, s"need lowerBound < upperBound, got [$lowerBound, $upperBound]")
  }

  private def reader(spark: SparkSession, src: JdbcSource): DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", src.url)
      .option("fetchsize", src.fetchSize)
    val withAuth = Seq(
      src.driver.map("driver" -> _),
      src.user.map("user" -> _),
      src.password.map("password" -> _)).flatten
      .foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    src.extraOptions.foldLeft(withAuth) { case (r, (k, v)) => r.option(k, v) }
  }

  /** Read a table (or any `(subquery) alias`) with optional stride
    * partitioning. postgresql.py:100 `extract` — but columns/filter are
    * NOT parameters: apply `.select`/`.filter` on the result and Spark
    * pushes both into the database query. */
  def read(
      spark: SparkSession, src: JdbcSource, table: String,
      partitioning: Option[JdbcPartitioning] = None): DataFrame = {
    val r = reader(spark, src).option("dbtable", table)
    partitioning.map { p =>
      r.option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound)
        .option("upperBound", p.upperBound)
        .option("numPartitions", p.numPartitions)
    }.getOrElse(r).load()
  }

  /** Read with one partition per caller-supplied WHERE predicate —
    * the escape hatch when no numeric stride column exists or the key
    * is skewed (predicates can size partitions unevenly on purpose).
    * Predicates must be disjoint and cover the table or rows are
    * dropped/duplicated — that contract is the caller's. */
  def readPredicated(
      spark: SparkSession, src: JdbcSource, table: String,
      predicates: Seq[String]): DataFrame = {
    require(predicates.nonEmpty, "readPredicated needs at least one predicate")
    val props = new java.util.Properties()
    src.driver.foreach(props.setProperty("driver", _))
    src.user.foreach(props.setProperty("user", _))
    src.password.foreach(props.setProperty("password", _))
    props.setProperty("fetchsize", src.fetchSize.toString)
    src.extraOptions.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(src.url, table, predicates.toArray, props)
  }

  /** postgresql.py:153 `extract_incremental`: rows with
    * watermark column strictly above the last seen value. The filter is
    * pushed into the database (no full-table pull); feed the result to
    * [[graft.extraction.Incremental.extract]] for pinned upper bounds
    * and commit semantics. */
  def readIncremental(
      spark: SparkSession, src: JdbcSource, table: String,
      watermarkColumn: String, lastWatermark: Option[Any],
      partitioning: Option[JdbcPartitioning] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val base = read(spark, src, table, partitioning)
    lastWatermark.map(w => base.filter(col(watermarkColumn) > lit(w))).getOrElse(base)
  }

  /** JDBC write: `batchsize`-chunked inserts per partition. Overwrite
    * uses TRUNCATE where the dialect supports it (avoids re-deriving
    * DDL); for transactional multi-writer targets prefer staging +
    * [[graft.sources.Sinks]]-style publish on the warehouse side. */
  def write(
      df: DataFrame, src: JdbcSource, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      batchSize: Int = 10000): Unit = {
    val w = df.write.format("jdbc")
      .option("url", src.url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("truncate", mode == SaveMode.Overwrite)
    val withAuth = Seq(
      src.driver.map("driver" -> _),
      src.user.map("user" -> _),
      src.password.map("password" -> _)).flatten
      .foldLeft(w) { case (r, (k, v)) => r.option(k, v) }
    src.extraOptions.foldLeft(withAuth) { case (r, (k, v)) => r.option(k, v) }
      .mode(mode).save()
  }

  /** Distributed statement executor for rendered DML (the
    * [[Dialects]] upsert path — Spark's own jdbc writer can only
    * INSERT): each partition opens one connection and streams its rows
    * through ONE PreparedStatement in `batchSize` chunks, binding
    * `columns` positionally to the statement's placeholders. Work
    * scales with partitions — no driver funnel, no per-row statement
    * parse. Executors need the driver jar on their classpath (same
    * contract as the built-in jdbc source).
    *
    * Each partition runs as ONE transaction (autocommit off, commit at
    * partition end, rollback on failure): a task that dies mid-stream
    * or runs speculatively leaves nothing behind, so a Spark retry
    * re-executes from a clean slate even for non-idempotent statements
    * (plain INSERTs) — without this, earlier autocommitted chunks
    * would duplicate on retry. Targets that reject manual commit mode
    * fall back to autocommit, where the statement itself must be
    * idempotent (the upsert path) to survive retries. */
  def executeBatch(
      df: DataFrame, src: JdbcSource, sql: String,
      columns: Seq[String], batchSize: Int = 10000,
      poolConnections: Boolean = true, maxPoolSize: Int = 8): Unit = {
    require(columns.nonEmpty, "executeBatch needs the bind-column list")
    val idx = columns.map(c => df.columns.indexOf(c))
    require(!idx.contains(-1),
      s"bind columns missing from the frame: ${columns.zip(idx).collect { case (c, -1) => c }.mkString(", ")}")
    val (url, user, pass, driver) = (src.url, src.user, src.password, src.driver)
    df.select(columns.map(org.apache.spark.sql.functions.col): _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        driver.foreach(Class.forName(_))
        val props = new java.util.Properties()
        user.foreach(props.setProperty("user", _))
        pass.foreach(props.setProperty("password", _))
        // pooled: one executor JVM running thousands of partitions
        // against the same target reuses maxPoolSize connections
        // instead of opening a TCP + auth handshake per task (ref
        // core/resources.py:75 pooled_connection)
        val conn =
          if (poolConnections) connectionPool(url, props, maxPoolSize).acquire()
          else java.sql.DriverManager.getConnection(url, props)
        val txn =
          try { conn.setAutoCommit(false); true }
          catch { case _: java.sql.SQLException => false } // target has no manual-commit mode
        try {
          val st = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { r =>
            (0 until columns.length).foreach { i =>
              st.setObject(i + 1, r.get(i))
            }
            st.addBatch()
            pending += 1
            if (pending >= batchSize) { st.executeBatch(); pending = 0 }
          }
          if (pending > 0) st.executeBatch()
          st.close()
          if (txn) { conn.commit(); conn.setAutoCommit(true) }
          // clean completion → back to the pool for the next task
          if (poolConnections) connectionPool(url, props, maxPoolSize).release(conn)
          else conn.close()
        } catch {
          case e: Throwable =>
            if (txn) try conn.rollback() catch { case _: java.sql.SQLException => () }
            // a connection that saw a failure is NEVER re-pooled — it
            // may carry session state from the aborted transaction
            try conn.close() catch { case _: java.sql.SQLException => () }
            throw e
        }
    }
  }

  /** Executor-JVM-wide connection pools, one per effective
    * CONFIGURATION — url, pool size, and a digest of every connection
    * property (ref core/resources.py:136 ResourcePool). Keying on the
    * full config (not just url+user) means a later call with a
    * different `maxPoolSize` or rotated credentials gets its own pool
    * instead of silently inheriting the first caller's frozen cap and
    * captured password; the digest keeps secrets out of the key
    * string. Stale connections are
    * validated out on acquire (isValid(2) — the 2 s liveness probe);
    * the pool bounds IDLE retention, so a burst past `maxPoolSize`
    * creates short-lived extras rather than blocking tasks. */
  private val pools =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.ResourcePool[java.sql.Connection]]()

  private def poolKey(url: String, props: java.util.Properties, maxSize: Int): String = {
    import scala.jdk.CollectionConverters._
    val digest = java.security.MessageDigest.getInstance("MD5").digest(
      props.stringPropertyNames().asScala.toSeq.sorted
        .map(k => k + "=" + props.getProperty(k)).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"$url $maxSize $digest"
  }

  private[sources] def connectionPool(
      url: String, props: java.util.Properties,
      maxSize: Int): graft.ops.ResourcePool[java.sql.Connection] =
    pools.computeIfAbsent(poolKey(url, props, maxSize), _ =>
      new graft.ops.ResourcePool[java.sql.Connection](
        factory = () => java.sql.DriverManager.getConnection(url, props),
        maxSize = maxSize,
        closer = c => c.close(),
        validate = c => try !c.isClosed && c.isValid(2)
          catch { case _: java.sql.SQLException => false }))

  /** Close every idle pooled connection (test teardown / shutdown). */
  def drainConnectionPools(): Unit = {
    val it = pools.values().iterator()
    while (it.hasNext) it.next().drain()
    pools.clear()
  }
}
