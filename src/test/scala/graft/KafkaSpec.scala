package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.medallion.Gold
import graft.streaming.{Kafka, Streaming}
import graft.streaming.Kafka.KafkaSourceConfig

/** Kafka surface without a broker: the option-map contract, the wire →
  * typed-payload parse, and the parse running under real streaming
  * execution (MemoryStream standing in for the kafka source, which
  * emits the same wire schema).
  */
class KafkaSpec extends SparkSpec {

  test("option map covers connection, offsets, throttling, and SASL auth") {
    val cfg = KafkaSourceConfig(
      bootstrapServers = Seq("broker1:9092", "broker2:9092"),
      subscribe = Some("events"),
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L),
      securityProtocol = "SASL_SSL",
      saslMechanism = Some("SCRAM-SHA-512"),
      saslJaasConfig = Some("org.apache.kafka.common.security.scram.ScramLoginModule required;"),
      extraOptions = Map("kafka.client.id" -> "graft"))
    val o = cfg.options
    assert(o("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(o("subscribe") == "events")
    assert(o("startingOffsets") == "earliest")
    assert(o("maxOffsetsPerTrigger") == "50000")
    assert(o("kafka.security.protocol") == "SASL_SSL")
    assert(o("kafka.sasl.mechanism") == "SCRAM-SHA-512")
    assert(o("kafka.client.id") == "graft")
    assert(o("failOnDataLoss") == "true")
  }

  test("config rejects ambiguous topic selection and bad offsets") {
    intercept[IllegalArgumentException](
      KafkaSourceConfig(Seq("b:9092"), subscribe = Some("a"), assign = Some("""{"a":[0]}""")))
    intercept[IllegalArgumentException](KafkaSourceConfig(Seq("b:9092")))
    intercept[IllegalArgumentException](
      KafkaSourceConfig(Seq("b:9092"), subscribe = Some("a"), startingOffsets = "sometimes"))
  }

  private def wireRow(id: Long, json: String): Row =
    Row(s"k$id".getBytes("UTF-8"), json.getBytes("UTF-8"), "events", 0,
      id, new Timestamp(1700000000000L + id), 0)

  private lazy val wire = {
    val rows = Seq(
      wireRow(1, """{"event_id":1,"ts":1700000001000000,"user_id":7,"event_type":"click","value":1.5,"props":"{}"}"""),
      wireRow(2, """{"event_id":2,"ts":1700000002000000,"user_id":7,"event_type":"view","value":2.5,"props":"{}"}"""),
      wireRow(3, """not json at all"""))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Kafka.WireSchema)
  }

  test("eventsFromKafka parses the wire payload into the shared events shape") {
    val events = Kafka.eventsFromKafka(wire)
    assert(events.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val got = events.orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1700000001000L, "click", 1.5),
      (2L, 1700000002000L, "view", 2.5)))
  }

  test("corrupt payloads isolate to the dead-letter set, with coordinates") {
    val parsed = Kafka.parseJsonPayload(wire, Kafka.EventsPayloadSchema)
    val bad = Kafka.corruptRecords(parsed).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[Long]("_offset") == 3L)
    assert(bad.head.getAs[String]("_topic") == "events")
  }

  test("kinesis/pubsub option maps and wire adaptation into the shared parse") {
    import graft.streaming.Brokers
    import graft.streaming.Brokers.{KinesisSourceConfig, PubSubSourceConfig}
    val k = KinesisSourceConfig("clicks", region = "eu-west-1",
      startingPosition = "TRIM_HORIZON", consumerName = Some("graft-efo")).options
    assert(k("streamName") == "clicks" && k("region") == "eu-west-1")
    assert(k("startingPosition") == "TRIM_HORIZON" && k("consumerName") == "graft-efo")
    intercept[IllegalArgumentException](
      KinesisSourceConfig("s", startingPosition = "YESTERDAY"))
    val p = PubSubSourceConfig("proj1", "sub1", maxMessagesPerBatch = Some(500L)).options
    assert(p("pubsublite.subscription") == "projects/proj1/locations/subscriptions/sub1")
    assert(p("pubsublite.flowcontrol.maxmessages") == "500")
    intercept[IllegalArgumentException](PubSubSourceConfig("", "sub"))

    // a kinesis-shaped frame adapts onto the kafka wire names and flows
    // through the SAME payload parse
    import spark.implicits._
    val kin = Seq((
      "pk1",
      """{"event_id":9,"ts":1700000009000000,"user_id":3,"event_type":"click","value":0.5,"props":"{}"}""".getBytes("UTF-8"),
      "clicks", "49590338271490256608559692538361571095921575989136588898",
      new Timestamp(1700000009000L)))
      .toDF("partitionKey", "data", "streamName", "sequenceNumber", "approximateArrivalTimestamp")
      // kinesis sequence numbers overflow long — surrogate ordinal stands in
      .withColumn("seq_ord", monotonically_increasing_id())
    val adapted = Brokers.adaptWire(kin, "data", "partitionKey", "streamName",
      "seq_ord", "approximateArrivalTimestamp")
    assert(adapted.columns.toSeq == Kafka.WireSchema.fieldNames.toSeq)
    val events = Kafka.eventsFromKafka(adapted).collect()
    assert(events.length == 1 && events.head.getAs[Long]("event_id") == 9L)
  }

  test("payload parse + windowed agg run under streaming execution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // MemoryStream emitting the kafka wire columns (binary key/value)
    val in = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)]
    val raw = in.toDF().toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val out = Streaming.windowedAgg(
      Kafka.eventsFromKafka(raw),
      tsCol = "ts", watermarkDelay = "5 minutes", windowDuration = "10 minutes",
      dimensions = Seq("event_type"), aggs = Seq(Gold.CountAll("n")))
    val q = out.writeStream.format("memory").queryName("kafka_agg").outputMode("append").start()
    try {
      def payload(id: Long, minute: Int, et: String): (Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int) = {
        val micros = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00").getTime * 1000L
        (s"$id".getBytes, s"""{"event_id":$id,"ts":$micros,"user_id":1,"event_type":"$et","value":1.0,"props":"{}"}""".getBytes,
          "events", 0, id, new Timestamp(0), 0)
      }
      in.addData(payload(1, 1, "click"), payload(2, 4, "click"))
      q.processAllAvailable()
      in.addData(payload(3, 26, "view")) // advances watermark past the first window
      q.processAllAvailable()
      val rows = spark.table("kafka_agg").select("event_type", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("click", 2L)))
    } finally q.stop()
  }
}
