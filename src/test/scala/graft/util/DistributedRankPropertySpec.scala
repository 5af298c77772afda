package graft.util

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based contract for the two-phase global-rank kernel
 * (CleanPropertySpec's raw-Gen pattern — the scalatestplus bridge isn't
 * on the offline classpath). Four registered queries ride this kernel
 * (q_global_rank, q_pareto, q_ntile_custs, stats_histogram_depth), so
 * its equivalence to the naive single-task window must hold for
 * ARBITRARY frames, not just the generated corpus: adversarial
 * generators cover heavy ties in the leading key (the total order then
 * hinges on the tiebreak column), skew (most mass on one key), tiny
 * frames (1–3 rows, fewer rows than partitions), and negative values.
 * ntileSql is additionally checked against Spark's own NTILE bucket by
 * bucket, where the q/q+1 split arithmetic has its off-by-one risk.
 */
class DistributedRankPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1200L + i)))

  // (id, v): id unique per row (the tiebreak), v deliberately collides
  private def genFrame(maxN: Int): Gen[Seq[(Long, Long)]] = for {
    n    <- Gen.chooseNum(1, maxN)
    skew <- Gen.oneOf(true, false)
    vs   <- Gen.listOfN(n,
              if (skew) Gen.frequency(8 -> Gen.const(7L), 2 -> Gen.chooseNum(-5L, 5L))
              else Gen.chooseNum(-50L, 50L))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("withGlobalIndex equals the naive global window on arbitrary frames") {
    samples(genFrame(120), 12).foreach { rows =>
      val df = rows.toDF("id", "v").repartition(7) // more partitions than some frames have rows
      val order = Seq(col("v").desc, col("id"))
      val kernel = DistributedRank.withGlobalIndex(df, order, "gidx")
        .select($"id", $"gidx").as[(Long, Long)].collect().toMap
      val naive = df.withColumn("gidx", row_number().over(
          Window.orderBy(col("v").desc, col("id"))).cast("long"))
        .select($"id", $"gidx").as[(Long, Long)].collect().toMap
      assert(kernel == naive, s"kernel != window on n=${rows.size}")
    }
  }

  test("ntileSql equals Spark's NTILE for every bucket count on arbitrary frames") {
    samples(genFrame(90), 6).foreach { rows =>
      val df = rows.toDF("id", "v")
      val n = rows.size.toLong
      val w = Window.orderBy(col("v"), col("id"))
      val ranked = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("n", lit(n))
      for (b <- Seq(1, 2, 3, 4, 10)) {
        val got = ranked
          .withColumn("bucket", expr(DistributedRank.ntileSql("rank", "n", b)).cast("int"))
          .withColumn("want", ntile(b).over(w))
          .filter($"bucket" =!= $"want")
        assert(got.isEmpty,
          s"ntileSql($b) diverges from NTILE on n=$n: ${got.collect().take(3).mkString}")
      }
    }
  }
}
