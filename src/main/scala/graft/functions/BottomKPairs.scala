package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded buffer for [[BottomKPairs]]: the k smallest DISTINCT
 * `(key, value)` pairs seen so far, ordered by `(key, value)` ascending.
 *
 * Backed by a `java.util.TreeSet` so membership (SET semantics — a pair
 * inserted twice counts once, the property the KMV estimator and
 * distinct-sampling both need) and the max element (the eviction
 * candidate) are both O(log k). State is ≤ k pairs regardless of input
 * size — the bound that makes the aggregate map-side combinable at any
 * scale.
 */
final class BottomKBuffer(val k: Int) {
  val set: java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](new Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      }
    })

  def insert(key: Long, value: Long): Unit = {
    val pair = Array(key, value)
    if (set.size < k) { set.add(pair); () }
    else if (set.comparator.compare(pair, set.last) < 0) {
      if (set.add(pair)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: BottomKBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) { val p = it.next(); insert(p(0), p(1)) }
  }
}

/**
 * Native Catalyst aggregate: the k smallest distinct `(key, value)` pairs
 * per group, as a sorted `array<struct<key bigint, value bigint>>`.
 *
 * This is the engine's bounded-state order-statistic primitive — ONE
 * aggregate replaces the `row_number() OVER (PARTITION BY g ORDER BY …)
 * ≤ k` idiom, and the difference is the scale story: the window form
 * shuffles and SORTS every row of every group to keep k of them; this
 * aggregate carries at most k pairs per group through partial
 * aggregation (map-side combine), so the exchange moves O(groups × k)
 * bytes no matter how large the fact is. Two operators build on it:
 *
 *   - deterministic per-group sampling (`q_group_sample`): key = md5
 *     hash, value = row id → a uniform k-sample with no RNG state;
 *   - the KMV distinct sketch (`q_kmv_distinct` / `q_kmv_merge`): the k
 *     minimum distinct hash values estimate cardinality as
 *     (k−1)·RANGE/h_k, and two sketches merge by union+re-cut — the
 *     mergeability that lets per-partition artifacts roll up without
 *     re-scanning raw data.
 *
 * Distinctness is part of the contract (a pair inserted twice counts
 * once): KMV is only correct over the SET of hashes, and sampling wants
 * each entity once. Null key or value rows are skipped, the standard
 * aggregate convention. Ties are impossible by construction (pairs are
 * distinct and compared by both fields), so the result is a pure
 * function of the input SET — order-independent, hence safe under any
 * partial-aggregation schedule, and bit-identical to the DuckDB window
 * twin the oracle replays.
 *
 * Deeper Catalyst tier than the repo's typed `Aggregator`
 * ([[SimhashAggregator]]): the buffer serializes to a raw byte array
 * (no encoder round-trip), and the function registers into the SQL
 * registry ([[graft.plans.GraftExtensions]]) as `bottom_k_pairs`.
 */
case class BottomKPairs(
    key: Expression,
    value: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with TernaryLike[Expression] {

  /** k is plan-time: a foldable positive int, like percentile's accuracy. */
  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"bottom_k_pairs k: $other")
  }

  override def first: Expression = key
  override def second: Expression = value
  override def third: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!DataType.equalsIgnoreNullability(key.dataType, LongType) ||
        !DataType.equalsIgnoreNullability(value.dataType, LongType))
      TypeCheckResult.TypeCheckFailure(
        s"bottom_k_pairs requires (bigint, bigint, int), got " +
          s"(${key.dataType.simpleString}, ${value.dataType.simpleString})")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("bottom_k_pairs k must be a literal")
    else if (kExpr.eval() == null ||
        (kExpr.eval() match {
          case i: Int => i <= 0; case l: Long => l <= 0L; case _ => true
        }))
      TypeCheckResult.TypeCheckFailure("bottom_k_pairs k must be a positive int")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("value", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      buf.insert(kv.asInstanceOf[Long], vv.asInstanceOf[Long])
    buf
  }

  override def merge(a: BottomKBuffer, b: BottomKBuffer): BottomKBuffer = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: BottomKBuffer): Any = {
    val rows = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      rows(i) = InternalRow(p(0), p(1))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BottomKPairs =
    copy(key = newFirst, value = newSecond, kExpr = newThird)

  override def prettyName: String = "bottom_k_pairs"
}
