package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kinesis / Pub/Sub source surfaces (ref connectors/streaming/
  * kinesis.py:17-48 KinesisConfig, pubsub.py:18-42 PubSubConfig).
  *
  * Same division of labor as [[Kafka]]: shard iterators, checkpointing,
  * ack deadlines, and flow control — most of both reference configs —
  * are the ENGINE's job in Structured Streaming, so what remains here
  * is the option-map contract for the respective external source
  * connectors (neither ships in OSS Spark: Kinesis via the
  * spark-sql-kinesis package, Pub/Sub via the Pub/Sub Lite connector —
  * deployment supplies the jar; the option map and payload contract are
  * what this library owns and tests). Both sources emit a binary `data`
  * payload; [[Kafka.parseJsonPayload]]'s corrupt-record contract is
  * reused by adapting the wire columns, so every downstream operator
  * is broker-agnostic.
  */
object Brokers {

  /** kinesis.py:17, reduced to the fields the connector consumes.
    * shard_iterator_type maps onto starting position; EFO is
    * `consumerName`; credentials ride the AWS chain by default. */
  final case class KinesisSourceConfig(
      streamName: String,
      region: String = "us-east-1",
      endpointUrl: Option[String] = None,
      startingPosition: String = "LATEST", // TRIM_HORIZON | LATEST | AT_TIMESTAMP
      awsAccessKeyId: Option[String] = None,
      awsSecretKey: Option[String] = None,
      consumerName: Option[String] = None, // enhanced fan-out
      maxFetchRate: Option[Int] = None,
      extraOptions: Map[String, String] = Map.empty) {

    require(Set("TRIM_HORIZON", "LATEST", "AT_TIMESTAMP").contains(startingPosition) ||
      startingPosition.startsWith("{"),
      s"startingPosition must be TRIM_HORIZON, LATEST, AT_TIMESTAMP or a JSON map; got $startingPosition")

    def options: Map[String, String] =
      Map(
        "streamName" -> streamName,
        "region" -> region,
        "startingPosition" -> startingPosition) ++
        endpointUrl.map("endpointUrl" -> _) ++
        awsAccessKeyId.map("awsAccessKeyId" -> _) ++
        awsSecretKey.map("awsSecretKey" -> _) ++
        consumerName.map("consumerName" -> _) ++
        maxFetchRate.map("maxFetchRate" -> _.toString) ++
        extraOptions
  }

  def readKinesis(spark: SparkSession, cfg: KinesisSourceConfig): DataFrame =
    spark.readStream.format("kinesis").options(cfg.options).load()

  /** pubsub.py:18: subscription-scoped consumption (topic_id is the
    * publisher side; a Spark source always reads a subscription). */
  final case class PubSubSourceConfig(
      projectId: String,
      subscriptionId: String,
      credentialsPath: Option[String] = None,
      maxMessagesPerBatch: Option[Long] = None,
      extraOptions: Map[String, String] = Map.empty) {

    require(projectId.nonEmpty && subscriptionId.nonEmpty,
      "projectId and subscriptionId are required")

    def options: Map[String, String] =
      Map("pubsublite.subscription" ->
        s"projects/$projectId/locations/subscriptions/$subscriptionId") ++
        credentialsPath.map("gcp.credentials.key.file" -> _) ++
        maxMessagesPerBatch.map("pubsublite.flowcontrol.maxmessages" -> _.toString) ++
        extraOptions
  }

  def readPubSub(spark: SparkSession, cfg: PubSubSourceConfig): DataFrame =
    spark.readStream.format("pubsublite").options(cfg.options).load()

  /** Adapt a broker frame carrying (data: binary, plus source-specific
    * coordinates) onto [[Kafka.WireSchema]] column names so
    * [[Kafka.parseJsonPayload]] / [[Kafka.eventsFromKafka]] apply
    * verbatim: Kinesis (partitionKey, data, streamName, sequenceNumber,
    * approximateArrivalTimestamp) and Pub/Sub (message_id, data,
    * subscription, publish_timestamp) both map cleanly. */
  def adaptWire(
      df: DataFrame,
      dataCol: String, keyCol: String, topicCol: String,
      offsetCol: String, timestampCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(
      col(keyCol).cast("binary").as("key"),
      col(dataCol).as("value"),
      col(topicCol).cast("string").as("topic"),
      lit(0).as("partition"),
      col(offsetCol).cast("long").as("offset"),
      col(timestampCol).cast("timestamp").as("timestamp"),
      lit(0).as("timestampType"))
  }
}
