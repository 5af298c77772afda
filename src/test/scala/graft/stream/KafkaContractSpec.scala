package graft.stream

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.SparkSpec
import graft.etl.RefPipeline

/**
 * The Kafka deploy contract, exercised as far as an offline sandbox
 * allows (VERDICT r11 ask #7): no broker and no connector jar exist
 * here, so S1/K4 cannot move a byte — but every piece of OUR side of
 * the contract is assertable in-process:
 *
 *  - the reader options [[StreamPipeline.read]] sets (an option-name
 *    typo otherwise surfaces only on a real cluster);
 *  - the connector's post-load schema ([[StreamPipeline.kafkaSourceSchema]],
 *    `value` BINARY) flowing through the REAL parse path — the
 *    binary→string cast is the reference's P1 and must not silently
 *    start assuming a string column because the file/memory twins
 *    happen to provide one;
 *  - the K4 payload projection: any row shape → one JSON `value`
 *    column, lossless under from_json round-trip.
 *
 * StreamPipelineSpec's deploy-gate test pins the complementary half:
 * source RESOLUTION fails naming `kafka` while the jar is absent.
 */
class KafkaContractSpec extends SparkSpec {

  test("kafka source options carry exactly the reference's reader config") {
    val opts = StreamPipeline.kafkaSourceOptions(
      StreamPipeline.Kafka("broker1:9092,broker2:9092", "events", "latest"))
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events",
      "startingOffsets" -> "latest"))
    // the default mirrors the reference pipeline (earliest, app.py:56)
    assert(StreamPipeline.Kafka("b:9092", "t").startingOffsets == "earliest")
  }

  test("kafka sink options carry servers, topic, and a per-query checkpoint") {
    val opts = StreamPipeline.kafkaSinkOptions(
      StreamPipeline.KafkaSink("b:9092", "out-topic", "/chk/out"))
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "out-topic",
      "checkpointLocation" -> "/chk/out"))
  }

  test("binary kafka value parses through the real P1-P3 path") {
    val schema = StreamPipeline.kafkaSourceSchema
    assert(schema("value").dataType == BinaryType,
      "connector contract: value is BINARY — parse's cast exists for this")
    val payload =
      """{"event_id":"e1","user_id":7,"product_id":3,"amount":19.5,
        |"event_time":"2024-01-01T00:00:10Z","country":"in","device":" Mobile "}"""
        .stripMargin.replace("\n", "")
    val rows = java.util.Arrays.asList(
      Row("k1".getBytes("UTF-8"), payload.getBytes("UTF-8"), "events",
        0, 0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:11"), 0),
      // a malformed value must null out, not fail the batch (PERMISSIVE)
      Row(null, "not json".getBytes("UTF-8"), "events",
        0, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:12"), 0))
    val kafkaShaped = spark.createDataFrame(rows, schema)
    val parsed = RefPipeline.parse(kafkaShaped)
    assert(parsed.columns.toSeq ==
      Seq("event_id", "user_id", "product_id", "amount", "event_time",
        "country", "device"))
    val good = parsed.filter(col("event_id").isNotNull).collect()
    assert(good.length == 1)
    val r = good.head
    assert(r.getAs[String]("event_id") == "e1")
    assert(r.getAs[Int]("user_id") == 7)
    assert(r.getAs[String]("country") == "in")
    // the malformed record survives as an all-null row for the
    // null-event_time filter downstream, exactly like the file twin
    assert(parsed.count() == 2)
  }

  test("K4 payload: any row shape folds to one JSON value column and round-trips") {
    import spark.implicits._
    val agg = Seq(("premium", 12.5, 3L), ("starter", 1.0, 1L))
      .toDF("segment", "total_amount", "unique_events")
    val payload = StreamPipeline.kafkaPayload(agg)
    assert(payload.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("value", "string")), "kafka sink requires exactly a value column")
    val back = payload
      .select(from_json(col("value"),
        StructType(agg.schema.fields)).as("d"))
      .select("d.*")
    assert(back.orderBy("segment").collect().toSeq ==
      agg.orderBy("segment").collect().toSeq)
  }
}
