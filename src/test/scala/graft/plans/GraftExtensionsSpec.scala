package graft.plans

import graft.SparkSpec

/** SQL-registry path for the native expressions. The extensions-class route
  * (`withExtensions(new GraftExtensions)`) only applies at session build
  * time, so the shared test session uses the runtime `register` path — both
  * feed the identical function builder. */
class GraftExtensionsSpec extends SparkSpec {

  test("array_dot_long is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r == 32L)
    val withNull = spark.sql(
      "SELECT array_dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d").head()
    assert(withNull.isNullAt(0))
    // mismatched lengths: dot over the common prefix (zip_with semantics)
    val prefix = spark.sql(
      "SELECT array_dot_long(array(2L, 3L), array(10L)) AS d").head().getLong(0)
    assert(prefix == 20L)
  }

  test("array_dot_long propagates null ELEMENTS like the HOF form") {
    GraftExtensions.register(spark)
    // aggregate(zip_with(a,b,*),0,+) yields NULL when any element is null;
    // the native expression must agree, not read the null slot as 0
    val both = spark.sql(
      """SELECT array_dot_long(a, b) AS native,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS hof
        |FROM VALUES
        |  (array(1L, CAST(NULL AS BIGINT), 3L), array(4L, 5L, 6L)),
        |  (array(1L, 2L), array(CAST(NULL AS BIGINT), 5L)),
        |  (array(1L, 2L), array(3L, 4L)) AS t(a, b)""".stripMargin).collect()
    both.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"native/HOF null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    assert(both.count(_.isNullAt(0)) == 2)
  }

  test("extensions class constructs and exposes the same builder") {
    assert(new GraftExtensions() != null)
    assert(GraftExtensions.arrayDotLongFn._1.funcName == "array_dot_long")
  }
}
