package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * DISTINCT 64-bit hashes of the values seen; estimate cardinality from how
  * tightly they crowd the bottom of the hash space.
  *
  * Why this over `approx_count_distinct` (HLL++): the KMV state is an
  * explicit sorted set, which makes two properties easy to guarantee and
  * test — (1) below k distinct values the answer is EXACT (the sketch still
  * holds every distinct hash: the estimator is bypassed, the set size IS
  * the count), and (2) merge is plain set-union-then-truncate, trivially
  * commutative/associative, so partial aggregation at any partitioning
  * yields bit-identical results. Property (1) is the oracle story: at the
  * correctness scales every group sits far below k=65536, so the DuckDB
  * `count(DISTINCT ...)` twin matches hash-exactly; past k (the 100-TB
  * path) the estimator degrades gracefully with ~1/√k relative error
  * (~0.4% at k=65536) and the sketch stays 512 KiB per group regardless of
  * input size — the reason any of this beats an exact count at scale.
  *
  * Hashing: Catalyst's own [[XxHash64]] (codegen'd upstream of the
  * aggregate), so any input type Spark can hash is supported; this
  * aggregate only ever sees longs.
  */
case class KmvDistinctAgg(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvDistinctAgg.Buf] {

  require(k >= 16, s"KMV needs a sane sketch size, got k=$k")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint hash input, got ${hashExpr.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvDistinctAgg.Buf =
    new KmvDistinctAgg.Buf(k)

  override def update(b: KmvDistinctAgg.Buf, input: InternalRow): KmvDistinctAgg.Buf = {
    val h = hashExpr.eval(input)
    if (h != null) b.add(h.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvDistinctAgg.Buf, o: KmvDistinctAgg.Buf): KmvDistinctAgg.Buf = {
    val it = o.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  /** Exact size below k; the KMV estimator `(k-1) / kthMin` (hashes mapped
    * to the unit interval as unsigned 64-bit fractions) at or past k.
    */
  override def eval(b: KmvDistinctAgg.Buf): Any = {
    if (b.set.size() < k) b.set.size().toLong
    else {
      // kth smallest hash as its unsigned position in the 64-bit space:
      // the stored form is already (raw + Long.MinValue), so position =
      // stored − MinValue, computed in double space
      val frac =
        (b.set.last().toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / math.max(frac, java.lang.Double.MIN_VALUE))
    }
  }

  override def serialize(b: KmvDistinctAgg.Buf): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + 8 * b.set.size())
    out.putInt(b.set.size())
    val it = b.set.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvDistinctAgg.Buf = {
    val b = new KmvDistinctAgg.Buf(k)
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt()
    var i = 0
    while (i < n) { b.add(in.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(hashExpr = c(0))
}

object KmvDistinctAgg {
  /** Sorted distinct hashes, SIGNED order over (hash XOR sign bit) — i.e.
    * unsigned order over the raw hash — truncated to the k smallest.
    * Storing the flipped form lets TreeSet's natural Long order do the
    * unsigned compare with zero custom-comparator overhead.
    */
  final class Buf(k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()

    def add(rawHash: Long): Unit = {
      val flipped = rawHash + Long.MinValue // unsigned -> signed order
      if (set.size() < k) { set.add(flipped); () }
      else if (flipped < set.last()) {
        if (set.add(flipped)) { set.pollLast(); () }
      }
    }
  }

  /** Distinct-count sketch of `value` with sketch size `k`. Nulls are
    * excluded, matching `count(DISTINCT ...)` — XxHash64 alone would hash a
    * null row to the seed and count it as one phantom value.
    */
  def kmvDistinct(value: Column, k: Int = 65536): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    val hash = bridge.toColumn(XxHash64(Seq(bridge.toExpression(value)), 42L))
    val guarded = when(value.isNull, lit(null)).otherwise(hash)
    bridge.toColumn(
      KmvDistinctAgg(bridge.toExpression(guarded), k).toAggregateExpression())
  }
}
