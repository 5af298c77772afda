package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Market-basket invariants: pair counts match a driver replay, rule
  * scores obey the Apriori identities (symmetric co-count and lift,
  * asymmetric confidence), and the min-support gate actually prunes. */
class BasketSpec extends SparkSpec {

  private def driverBaskets(): Map[Long, Set[String]] = {
    val brandOf = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), brandOf(r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("q_basket_pairs: counts equal a driver replay; support is exact integer") {
    val baskets = driverBaskets()
    val n = baskets.size.toLong
    val expected = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= BasketQueries.MinPairSupport)
      .map { case ((a, b), c) => (a, b, c, n, 1000L * c / n) }.toSet
    val got = BasketQueries.qBasketPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("q_basket_rules: directional identities and the independence reading of lift") {
    val got = BasketQueries.qBasketRules(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty)
    val byPair = got.map(t => (t._1, t._2) -> t).toMap
    got.foreach { case (a, b, nBoth, nA, nB, conf, _) =>
      // confidence definition and bounds
      assert(conf == 1000L * nBoth / nA && conf >= 0L && conf <= 1000L)
      // the reverse rule exists with mirrored counts and IDENTICAL lift
      val rev = byPair((b, a))
      assert(rev._3 == nBoth && rev._4 == nB && rev._5 == nA)
      assert(rev._7 == byPair((a, b))._7, s"lift must be symmetric for $a/$b")
    }
    // 25 brands co-occurring heavily: lift must straddle independence on
    // real data only if association exists; at minimum the scores vary
    assert(got.map(_._7).distinct.length > 1)
  }
}
