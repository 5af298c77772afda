package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.batch.SketchQueries
import graft.plans.GraftExtensions

/** The native bottom-k aggregate: window-idiom equivalence across partial
  * aggregation, SET semantics, null handling, the serialize/merge path,
  * the SQL registry route, and the KMV estimator + merge semilattice built
  * on it. */
class BottomKPairsSpec extends SparkSpec {

  import spark.implicits._

  test("agrees with the row_number window idiom under partial aggregation") {
    // 4 shuffle partitions + groups spread over many input partitions ⇒
    // the partial/merge path genuinely exercises serialize+mergeFrom
    val rows = (1L to 2000L).map(i => (s"g${i % 7}", i * 2654435761L % 100003L, i))
    val df = rows.toDF("g", "h", "id").repartition(13)
    val agg = df.groupBy($"g")
      .agg(VectorFunctions.bottomKPairs($"h", $"id", 5).as("s"))
      .select($"g", posexplode($"s").as(Seq("pos", "p")))
      .select($"g", ($"pos" + 1).cast("long").as("rk"),
        $"p.key".as("h"), $"p.value".as("id"))
    import org.apache.spark.sql.expressions.Window
    val win = df.withColumn("rk",
        row_number().over(Window.partitionBy($"g").orderBy($"h", $"id")).cast("long"))
      .filter($"rk" <= 5).select($"g", $"rk", $"h", $"id")
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
    assert(agg.count() == 35)
  }

  test("set semantics: duplicate pairs count once; groups smaller than k") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 10L, 1L), ("a", 10L, 1L), ("a", 20L, 2L),
      ("b", 5L, 9L)).toDF("g", "h", "id")
    val out = df.groupBy($"g")
      .agg(VectorFunctions.bottomKPairs($"h", $"id", 3).as("s"))
      .select($"g", size($"s").as("n"))
      .as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 2, "b" -> 1))
  }

  test("null key or value rows are skipped, not inserted") {
    val df = Seq(
      (Some(1L), Some(10L)), (None, Some(11L)), (Some(2L), None),
      (Some(3L), Some(12L))).toDF("h", "id")
    val s = df.groupBy()
      .agg(VectorFunctions.bottomKPairs($"h", $"id", 10).as("s"))
      .select(size($"s")).head().getInt(0)
    assert(s == 2)
  }

  test("callable from SQL as bottom_k_pairs after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT bottom_k_pairs(h, id, 2) AS s FROM VALUES
        |  (3L, 30L), (1L, 10L), (2L, 20L), (1L, 10L) AS t(h, id)""".stripMargin)
      .select(expr("s[0].key"), expr("s[0].value"), expr("s[1].key"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 10L, 2L)))
  }

  test("KMV estimator lands within the k=64 error envelope at sf0.001") {
    val card = SketchQueries.qKmvDistinct(spark, sf)
      .select($"event_type", $"n_exact", $"est_distinct", $"err_milli")
      .collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val exact = r.getLong(1)
      val err = r.getLong(3)
      // 1/sqrt(62) ≈ 13% RSE; 4 sigma ⇒ 52% — a loose determinism-safe
      // bound (the estimate is a fixed number per dataset, this guards
      // against an off-by-one in the estimator, not sampling luck)
      assert(err <= 520, s"type=${r.getString(0)} exact=$exact err=$err")
    }
  }

  test("AMS F2 estimate equals a driver-side sign-sum replay; error bounded") {
    val r = SketchQueries.qF2Sketch(spark, sf).head()
    val rows = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull).select($"user_id").as[Long].collect()
    assert(r.getLong(0) == rows.length)
    // exact F2 = sum of squared per-user counts
    val exact = rows.groupBy(identity).values.map(v => v.size.toLong * v.size).sum
    assert(r.getLong(1) == exact)
    // replay the 8 sign sums with the same md5 rule
    def sign(j: Int, u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ams$j|$u".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(7)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    val ests = (0 until SketchQueries.F2Rows)
      .map(j => { val s = rows.map(sign(j, _)).sum; s * s }).sorted
    assert(r.getLong(2) == ests(SketchQueries.F2Rows / 2 - 1),
      s"median mismatch: got ${r.getLong(2)}, replay ${ests.toList}")
  }

  test("KMV merge equals the sketch built directly on the union") {
    val merged = SketchQueries.qKmvMerge(spark, sf)
      .select($"est_distinct", $"n_exact").head()
    // direct global sketch over the same hash stream
    val h = Exact.md5Long48(concat(lit("kmv|"), col("user_id")))
    val direct = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull).select(h.as("h"))
      .groupBy()
      .agg(VectorFunctions.bottomKPairs(col("h"), col("h"), SketchQueries.KmvK).as("sk"))
      .select(size(col("sk")).as("n"),
        when(size(col("sk")) === SketchQueries.KmvK,
          element_at(col("sk"), SketchQueries.KmvK).getField("key")).as("hk"))
      .head()
    val est =
      if (direct.getInt(0) < SketchQueries.KmvK) direct.getInt(0).toLong
      else (SketchQueries.KmvK - 1L) * SketchQueries.HashRange / direct.getLong(1)
    assert(merged.getLong(0) == est,
      s"merge path ${merged.getLong(0)} != direct sketch $est")
  }
}
