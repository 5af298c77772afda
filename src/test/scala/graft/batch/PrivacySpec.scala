package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Release-gate invariants of the privacy pair: the census matches a
  * driver count, the ladder picks the MINIMAL sufficient level, and every
  * released tuple blends into ≥ K corpus rows. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def qi(): Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        expr(s"n_chars DIV ${PrivacyQueries.BandChars}"))
      .as[(Long, String, String, Long)].collect().toSeq

  test("q_k_anonymity: census equals driver counts; risky groups exist on this corpus") {
    val rows = qi()
    val expected = rows.groupBy(r => (r._2, r._3, r._4))
      .map { case (k, g) => (k._1, k._2, k._3, g.size.toLong,
        g.size < PrivacyQueries.AnonK) }.toSet
    val got = PrivacyQueries.qKAnonymity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == expected)
    // the corpus genuinely exercises the gate: both verdicts present
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("q_anon_generalize: minimal sufficient level; released tuples blend into >= K rows") {
    val rows = qi()
    val n0 = rows.groupBy(r => (r._2, r._3, r._4)).view.mapValues(_.size.toLong).toMap
    val n1 = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong).toMap
    val n2 = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val k = PrivacyQueries.AnonK
    val byDoc = rows.map(r => r._1 -> r).toMap
    val got = PrivacyQueries.qAnonGeneralize(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got.length == rows.length)
    got.foreach { case (id, lvl, rl, rs, rb) =>
      val (_, lang, source, band) = byDoc(id)
      val expectedLvl =
        if (n0((lang, source, band)) >= k) 0L
        else if (n1((lang, source)) >= k) 1L
        else if (n2(lang) >= k) 2L else 3L
      assert(lvl == expectedLvl, s"doc $id level $lvl != $expectedLvl")
      // released tuple nulls exactly the generalized columns
      assert(rl == (if (lvl <= 2) Some(lang) else None), s"doc $id lang")
      assert(rs == (if (lvl <= 1) Some(source) else None), s"doc $id source")
      assert(rb == (if (lvl <= 0) Some(band) else None), s"doc $id band")
      // the population guarantee: the released grain holds >= K corpus rows
      val pop = lvl match {
        case 0L => n0((lang, source, band))
        case 1L => n1((lang, source))
        case 2L => n2(lang)
        case _  => Long.MaxValue
      }
      assert(pop >= k, s"doc $id released at level $lvl with population $pop")
    }
    // the ladder is actually used: multiple levels occur on this corpus
    assert(got.map(_._2).distinct.length >= 2)
  }

  test("q_l_diversity: widens the k-census with distinct-content counts; l <= n always") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"),
        expr(s"n_chars DIV ${PrivacyQueries.BandChars}").as("band"),
        col("text"))
      .collect().map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getString(3)))
    val expected = docs.groupBy(_._1).map { case (k, g) =>
      val l = g.map(_._2).distinct.length.toLong
      (k._1, k._2, k._3, g.length.toLong, l,
        g.length >= PrivacyQueries.AnonK && l >= PrivacyQueries.AnonL)
    }.toSet
    val got = PrivacyQueries.qLDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got == expected)
    // the gate discriminates beyond group size alone on this corpus is not
    // guaranteed (synthetic texts are near-unique), but the invariants are:
    got.foreach { case (_, _, _, n, l, _) => assert(l >= 1L && l <= n) }
    // k-census and l-census agree on the group populations (same grain)
    val kc = PrivacyQueries.qKAnonymity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    got.foreach { case (la, so, b, n, _, _) => assert(kc((la, so, b)) == n) }
  }

  test("q_forget: cascade counts equal a driver-side FK walk; every table reported") {
    val del = Tables.customer(spark, sf)
      .select(col("c_custkey"),
        pmod(graft.functions.Exact.md5Long(concat(lit("del|"), col("c_custkey"))),
          lit(100L)).as("h"))
      .collect().filter(_.getLong(1) < PrivacyQueries.DeletePct)
      .map(_.getLong(0)).toSet
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val affOrders = orders.filter(o => del.contains(o._2)).map(_._1).toSet
    val li = Tables.lineitem(spark, sf).select("l_orderkey").collect().map(_.getLong(0))
    val ev = Tables.events(spark, sf).select("user_id").collect().map(_.getLong(0))
    val nCust = Tables.customer(spark, sf).count()
    val expected = Map(
      "customer" -> (nCust, del.size.toLong),
      "orders" -> (orders.length.toLong, affOrders.size.toLong),
      "lineitem" -> (li.length.toLong, li.count(affOrders.contains).toLong),
      "events" -> (ev.length.toLong, ev.count(del.contains).toLong))
    val got = PrivacyQueries.qForget(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (n, aff)) =>
      val (gn, ga, gm) = got(t)
      assert(gn == n && ga == aff, s"$t: got ($gn,$ga) want ($n,$aff)")
      assert(gm == 1000L * aff / n, s"$t milli")
    }
    // the list genuinely cascades: affected rows exist beyond the root table
    assert(got("lineitem")._2 > 0L && got("events")._2 > 0L)
  }
}
