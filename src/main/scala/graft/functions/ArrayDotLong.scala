package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst expression: exact integer dot product of two
 * `array<bigint>` columns.
 *
 * The vector-similarity kernels (dedup_embedding, knn_brute, knn_ivf) are
 * O(pairs × dim); the higher-order-function formulation
 * `aggregate(zip_with(a, b, _*_), 0, _+_)` materializes a zipped
 * intermediate array and evaluates two lambdas per element — an allocation
 * and megamorphic-call tax on the hottest loop in the engine. This
 * expression generates a primitive `long` loop over the two ArrayData
 * buffers inside whole-stage codegen: no allocation, no boxing, SIMD-able.
 *
 * Semantics are identical to the HOF form (exact BIGINT sums over
 * quantized vectors — see [[Exact.fixed]]), so the DuckDB oracles are
 * unaffected. Sum length = min(len(a), len(b)), like zip_with on equal-rank
 * inputs; nulls propagate (null array → null result, and — like
 * `aggregate(zip_with(a, b, _*_), 0, _+_)` — a null ELEMENT in either
 * array makes the whole result null rather than silently reading 0).
 */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  /** Nullable not just when an input column is, but when either array type
    * admits null ELEMENTS — those propagate to a null result. */
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  /** Registered publicly for SQL (GraftExtensions), so malformed input must
    * fail analysis, not produce garbage: getLong over an int-array's 4-byte
    * slots would silently misread. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = ArrayType(LongType)
    if (Seq(left, right).forall(e => DataType.equalsIgnoreNullability(e.dataType, ok)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot_long requires (array<bigint>, array<bigint>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // Emit the per-element null check only when an input's type admits
      // null elements — containsNull=false inputs keep the tight
      // branch-free loop. (elemNullable ⇒ nullable, so ev.isNull exists
      // whenever the check is emitted.)
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val assign =
        if (elemNullable(left) || elemNullable(right))
          s"if (!${ev.isNull}) { ${ev.value} = $s; }"
        else s"${ev.value} = $s;"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}
