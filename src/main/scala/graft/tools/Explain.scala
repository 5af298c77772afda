package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of a registered query (dev tool):
  * runMain graft.tools.Explain <queryName> [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
