package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka source/sink surface (ref connectors/streaming/kafka.py:17-55
  * KafkaConfig, :197 extract, :271-280 JSON deserialization).
  *
  * The reference polls a consumer in a Python loop; the Spark-native
  * form is `readStream.format("kafka")` — offsets, rebalancing, and
  * exactly-once bookkeeping belong to the engine, not the operator.
  * This object is the CONFIG + PAYLOAD contract: [[KafkaSourceConfig]]
  * maps the reference's connection/consumer vocabulary onto Spark
  * kafka-source options (a pure, unit-testable function), and
  * [[parseJsonPayload]] turns Kafka's fixed wire schema into typed rows
  * shared with every batch operator. The broker jar
  * (`spark-sql-kafka-0-10`) is not in this sandbox, so [[readStream]]
  * is exercised through the option map + payload parse (the DataFrame
  * logic also runs against MemoryStream in StreamingSpec) — against a
  * real cluster it is exactly `spark.readStream.format("kafka")
  * .options(cfg.options).load()`.
  */
object Kafka {

  /** Kafka's fixed source schema — what `format("kafka").load()` emits
    * and what [[parseJsonPayload]] consumes. */
  val WireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** kafka.py:17 KafkaConfig, reduced to the fields that are the
    * ENGINE's job in Spark (group management, poll tuning, and commit
    * settings from the reference fall away — Structured Streaming
    * manages offsets through its checkpoint, kafka.py's
    * enable_auto_commit/session_timeout have no Spark equivalent by
    * design). Exactly one of `subscribe`/`subscribePattern`/`assign`
    * must be set. */
  final case class KafkaSourceConfig(
      bootstrapServers: Seq[String],
      subscribe: Option[String] = None,
      subscribePattern: Option[String] = None,
      assign: Option[String] = None,
      startingOffsets: String = "latest", // auto_offset_reset analog
      maxOffsetsPerTrigger: Option[Long] = None, // max_poll_records analog (per micro-batch)
      failOnDataLoss: Boolean = true,
      // Authentication (kafka.py security_protocol/sasl_*): passed
      // through with Spark's `kafka.` prefix.
      securityProtocol: String = "PLAINTEXT",
      saslMechanism: Option[String] = None,
      saslJaasConfig: Option[String] = None,
      extraOptions: Map[String, String] = Map.empty) {

    require(Seq(subscribe, subscribePattern, assign).count(_.isDefined) == 1,
      "exactly one of subscribe / subscribePattern / assign must be set")
    require(Set("earliest", "latest").contains(startingOffsets) ||
      startingOffsets.startsWith("{"),
      s"startingOffsets must be earliest, latest, or a per-partition JSON map; got $startingOffsets")

    /** The full option map for `readStream.format("kafka")`. Pure —
      * unit-tested without a broker. */
    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers.mkString(","),
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString,
        "kafka.security.protocol" -> securityProtocol) ++
        subscribe.map("subscribe" -> _) ++
        subscribePattern.map("subscribePattern" -> _) ++
        assign.map("assign" -> _) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
        saslMechanism.map("kafka.sasl.mechanism" -> _) ++
        saslJaasConfig.map("kafka.sasl.jaas.config" -> _) ++
        extraOptions
  }

  /** The live source: only line that needs the kafka jar. */
  def readStream(spark: SparkSession, cfg: KafkaSourceConfig): DataFrame =
    spark.readStream.format("kafka").options(cfg.options).load()

  /** kafka.py:278 JSON value deserialization, declaratively: cast the
    * binary payload to string, parse with an EXPLICIT schema (never
    * inferred — a 100 TB/day topic cannot afford schema drift deciding
    * types), and keep the broker coordinates for lineage/replay.
    * Corrupt payloads keep their raw text in `row._corrupt_record`
    * (PERMISSIVE parse) rather than killing the stream;
    * [[corruptRecords]] isolates them for a dead-letter sink. */
  def parseJsonPayload(raw: DataFrame, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptField),
      s"payload schema must not declare $CorruptField — it is the parse-failure channel")
    raw.select(
      col("key").cast("string").as("_key"),
      col("topic").as("_topic"),
      col("partition").as("_partition"),
      col("offset").as("_offset"),
      col("timestamp").as("_kafka_ts"),
      from_json(col("value").cast("string"), schema.add(CorruptField, StringType),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptField)).as("row"))
  }

  private val CorruptField = "_corrupt_record"

  /** Rows whose payload failed to parse — route to a dead-letter table
    * (raw text preserved in `row._corrupt_record`), don't drop silently. */
  def corruptRecords(parsed: DataFrame): DataFrame =
    parsed.filter(col("row").isNull || col(s"row.$CorruptField").isNotNull)

  /** Flatten parsed rows into the payload schema's columns (dropping
    * corrupt rows — they are [[corruptRecords]]'s business). */
  def payloadRows(parsed: DataFrame): DataFrame =
    parsed.filter(col("row").isNotNull && col(s"row.$CorruptField").isNull)
      .select(col("row.*")).drop(CorruptField)

  /** The shared `events` payload contract (TESTDATA.md events table):
    * what a production topic carrying this pipeline's events serializes.
    * `ts` rides as epoch micros (a JSON long) — timestamp encoding is
    * pinned by the contract, not left to string formats. */
  val EventsPayloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Parse an events topic into the exact DataFrame shape
    * `Tables.events` produces, so every downstream operator (windowed
    * aggs, sessionization, gold metrics) is source-agnostic. */
  def eventsFromKafka(raw: DataFrame): DataFrame =
    payloadRows(parseJsonPayload(raw, EventsPayloadSchema))
      .select(col("event_id"), timestamp_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))

  /** kafka.py publish path: serialize rows to (key, value) JSON pairs —
    * feed to `writeStream.format("kafka")` (or batch `write`) with
    * `topic` in options. */
  def toKafkaPayload(df: DataFrame, keyCol: Column): DataFrame =
    df.select(
      keyCol.cast("string").as("key"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
}
