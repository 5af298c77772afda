package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference pipeline's data-quality contract (SURVEY §1.4): nulls
  * filled, device normalized, event_ids unique — verified against
  * producer-style dirty data (reference producer.py:30–42). */
class RefPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, user_id, product_id, amount, event_time, country, device) —
  // dirty in the exact ways the reference producer injects.
  private lazy val dirty = Seq(
    ("evt_1", 1, 1, Some(10.0), "2024-01-01T00:00:01Z", "in", "MOBILE"),
    ("evt_1", 1, 1, Some(10.0), "2024-01-01T00:00:02Z", "in", "MOBILE"),   // dup id
    ("evt_2", 2, 2, None,       "2024-01-01T00:00:03Z", null, "mobile "),  // null amount+country
    ("evt_3", 3, 3, Some(5.5),  "2024-01-01T00:00:04Z", "US", null),      // null device
    ("evt_4", 9, 9, Some(1.0),  "2024-01-01T00:00:05Z", "de", "DESKTOP")  // unknown user/product
  ).toDF("event_id", "user_id", "product_id", "amount", "event_time", "country", "device")

  private lazy val cleaned = RefPipeline.clean(dirty)

  test("clean fills nulls per contract: amount→0.0, country→UNKNOWN, device→unknown") {
    val rows = cleaned.collect()
    assert(rows.forall(!_.anyNull) || cleaned.filter(
      col("amount").isNull || col("country").isNull || col("device_norm").isNull).isEmpty)
    val e2 = cleaned.filter($"event_id" === "evt_2").head()
    assert(e2.getAs[Double]("amount") == 0.0)
    assert(e2.getAs[String]("country") == "UNKNOWN")
    assert(e2.getAs[String]("device_norm") == "mobile")
    val e3 = cleaned.filter($"event_id" === "evt_3").head()
    assert(e3.getAs[String]("device_norm") == "unknown")
  }

  test("clean dedups event_id and uppercases country") {
    assert(cleaned.count() == 4)
    assert(cleaned.select("event_id").distinct().count() == 4)
    assert(cleaned.filter($"event_id" === "evt_1").head().getAs[String]("country") == "IN")
  }

  test("normalize_device UDF ≡ builtin expression (SURVEY §2.9)") {
    val df = Seq("MOBILE", "mobile ", " DeskTop", null, "", "  ").toDF("device")
    val both = df.select(
      RefPipeline.normalizeDeviceUdf(col("device")).as("viaUdf"),
      RefPipeline.normalizeDevice(col("device")).as("viaExpr"))
    assert(both.filter($"viaUdf" =!= $"viaExpr").isEmpty)
  }

  test("enrich joins dims without clobbering event country (J3)") {
    val users = RefPipeline.usersDim(spark)
    val products = RefPipeline.productsDim(spark)
    val enriched = RefPipeline.enrich(cleaned, users, products)
    // event country survives the users join (users.country dropped pre-join)
    assert(enriched.filter($"event_id" === "evt_1").head().getAs[String]("country") == "IN")
    // unmatched keys left-join to null
    val e4 = enriched.filter($"event_id" === "evt_4").head()
    assert(e4.getAs[String]("segment") == null)
    assert(e4.getAs[String]("category") == null)
  }

  test("parse handles malformed JSON as null struct fields (P2 PERMISSIVE)") {
    val raw = Seq("""{"event_id":"e1","user_id":1,"amount":2.5}""", "not json")
      .toDF("value").select($"value".cast("binary").as("value"))
    val parsed = RefPipeline.parse(raw)
    assert(parsed.count() == 2)
    assert(parsed.filter($"event_id" === "e1").head().getAs[Double]("amount") == 2.5)
    assert(parsed.filter($"event_id".isNull).count() == 1)
  }

  test("full pipeline aggregates into sliding windows (batch twin)") {
    val raw = Seq(
      """{"event_id":"a","user_id":1,"product_id":1,"amount":10.0,"event_time":"2024-01-01T00:00:10Z","country":"in","device":"MOBILE"}""",
      """{"event_id":"b","user_id":1,"product_id":1,"amount":20.0,"event_time":"2024-01-01T00:00:20Z","country":"in","device":"MOBILE"}""")
      .toDF("value").select($"value".cast("binary").as("value"))
    val out = RefPipeline.full(spark, raw)
    // each event lands in exactly 2 sliding windows → 2 windows with both events
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.filter($"total_amount" === 30.0).count() >= 1)
    assert(out.columns.toSet ==
      Set("country", "segment", "total_amount", "unique_events", "max_event_time", "event_date"))
  }
}
