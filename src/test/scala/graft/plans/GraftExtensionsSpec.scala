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

  test("extensions class constructs and exposes the same builder") {
    assert(new GraftExtensions() != null)
    assert(GraftExtensions.arrayDotLongFn._1.funcName == "array_dot_long")
  }
}
