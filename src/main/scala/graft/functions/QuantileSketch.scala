package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Mergeable multi-level quantile sketch (Manku-Rajagopalan-Lindsay 1998 /
  * the uniform-capacity ancestor of KLL): level i holds values of weight
  * 2^i in a buffer of at most `k`; a full level sorts and promotes every
  * other element to level i+1 (two weight-w items → one weight-2w item, so
  * the total weight stays EXACTLY the input count). Space is O(k·log(n/k))
  * per group regardless of input size — the bounded-state path for
  * percentile telemetry over groups too big to sort.
  *
  * Exactness contract (the [[KmvDistinctAgg]]/[[SpaceSavingAgg]] stance):
  * below k values nothing ever compacts — the sketch IS the sorted sample,
  * and `eval` replays percentile/quantile_cont interpolation bit-for-bit
  * (the same `(ceil(pos)−pos)·lo + (pos−floor(pos))·hi` expression the
  * exact rel_quantiles plan uses), so the DuckDB oracle hash-matches. Past
  * k the estimate carries the paper's rank error and — like SpaceSaving
  * past capacity — compaction choices depend on merge order, so results
  * are run-dependent; bounded, documented, and spec-tested, not hidden.
  */
case class QuantileSketchAgg(
    value: Expression,
    k: Int,
    probes: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchAgg.Buf] {

  require(k >= 8 && k % 2 == 0, s"quantile sketch needs an even k >= 8, got $k")
  require(probes.nonEmpty && probes.forall(p => p >= 0.0 && p <= 1.0),
    s"probes must sit in [0, 1], got $probes")

  override def children: Seq[Expression] = Seq(value)
  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint value, got ${value.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): QuantileSketchAgg.Buf =
    new QuantileSketchAgg.Buf(k)

  override def update(b: QuantileSketchAgg.Buf, input: InternalRow): QuantileSketchAgg.Buf = {
    val v = value.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long], 0)
    b
  }

  override def merge(b: QuantileSketchAgg.Buf, o: QuantileSketchAgg.Buf): QuantileSketchAgg.Buf = {
    b.absorb(o)
    b
  }

  override def eval(b: QuantileSketchAgg.Buf): Any = {
    val est = b.quantiles(probes)
    if (est == null) null else new GenericArrayData(est.toArray[Any])
  }

  override def serialize(b: QuantileSketchAgg.Buf): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): QuantileSketchAgg.Buf =
    QuantileSketchAgg.Buf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(value = c(0))
}

object QuantileSketchAgg {

  import scala.collection.mutable.ArrayBuffer

  final class Buf(k: Int) {
    /** levels(i): unsorted values of weight 2^i, size < k between carries. */
    val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer.empty[Long])
    /** Per-level compaction offset flip — deterministic for a sequential
      * stream; merge order perturbs it, which is exactly the documented
      * run-dependence past k. Companion-visible for deserialization.
      */
    private[QuantileSketchAgg] val flips = ArrayBuffer[Boolean](false)

    def add(v: Long, level: Int): Unit = {
      while (levels.size <= level) { levels += ArrayBuffer.empty[Long]; flips += false }
      levels(level) += v
      var i = level
      while (i < levels.size && levels(i).size >= k) { compact(i); i += 1 }
    }

    /** Sort the full level, promote every other element (offset alternates
      * per compaction), keep an odd leftover in place — total weight is
      * preserved exactly.
      */
    private def compact(i: Int): Unit = {
      val lv = levels(i)
      val sorted = lv.sorted
      val off = if (flips(i)) 1 else 0
      flips(i) = !flips(i)
      val pairs = sorted.size - (sorted.size % 2)
      if (levels.size <= i + 1) { levels += ArrayBuffer.empty[Long]; flips += false }
      var j = 0
      while (j < pairs) { levels(i + 1) += sorted(j + off); j += 2 }
      lv.clear()
      if (pairs < sorted.size) lv += sorted(sorted.size - 1)
    }

    def absorb(o: Buf): Unit = {
      var i = 0
      while (i < o.levels.size) {
        o.levels(i).foreach(v => add(v, i))
        i += 1
      }
    }

    /** Weighted percentile interpolation over the retained points — the
      * exact expression shape of percentile()/quantile_cont, replayed over
      * expanded ranks. Null on an empty sketch.
      */
    def quantiles(probes: Seq[Double]): Seq[Double] = {
      val pts = ArrayBuffer.empty[(Long, Long)] // (value, weight)
      var i = 0
      while (i < levels.size) {
        val w = 1L << i
        levels(i).foreach(v => pts += ((v, w)))
        i += 1
      }
      if (pts.isEmpty) return null
      val sorted = pts.sortBy(_._1)
      // One cumulative-weight pass, then binary search per probe: valAt is
      // called up to twice per probe, and retained size is ~k·log(n/k) —
      // rescanning the list per call was O(probes × retained).
      val cumW = new Array[Long](sorted.size)
      var acc = 0L
      var j = 0
      while (j < sorted.size) { acc += sorted(j)._2; cumW(j) = acc; j += 1 }
      val n = acc
      // value at expanded sorted index r: the point whose cumulative weight
      // range (cum-w, cum] covers r+1, i.e. the first index with cumW > r
      def valAt(r: Long): Double = {
        var lo = 0
        var hi = sorted.size - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cumW(mid) > r) hi = mid else lo = mid + 1
        }
        sorted(lo)._1.toDouble
      }
      probes.map { p =>
        val pos = p * (n - 1).toDouble
        val lo = math.floor(pos)
        val hi = math.ceil(pos)
        val loV = valAt(lo.toLong)
        if (lo == hi) loV
        else {
          val hiV = valAt(hi.toLong)
          (hi - pos) * loV + (pos - lo) * hiV
        }
      }.toSeq
    }

    def toBytes: Array[Byte] = {
      var bytes = 4
      levels.foreach(lv => bytes += 4 + 1 + 8 * lv.size)
      val out = ByteBuffer.allocate(bytes)
      out.putInt(levels.size)
      var i = 0
      while (i < levels.size) {
        out.put(if (flips(i)) 1.toByte else 0.toByte)
        out.putInt(levels(i).size)
        levels(i).foreach(out.putLong)
        i += 1
      }
      out.array()
    }
  }

  object Buf {
    def fromBytes(k: Int, bytes: Array[Byte]): Buf = {
      val b = new Buf(k)
      val in = ByteBuffer.wrap(bytes)
      val nLevels = in.getInt()
      var i = 0
      while (i < nLevels) {
        val flip = in.get() == 1.toByte
        val n = in.getInt()
        while (b.levels.size <= i) { b.levels += ArrayBuffer.empty[Long]; b.flips += false }
        var j = 0
        while (j < n) { b.levels(i) += in.getLong(); j += 1 }
        b.flips(i) = flip
        i += 1
      }
      b
    }
  }

  /** Interpolated quantiles of `value` at `probes`, as array<double> in
    * probe order. Exact (= percentile()/quantile_cont) while the group
    * holds fewer than k values.
    */
  def quantileSketch(value: Column, probes: Seq[Double], k: Int = 65536): Column =
    bridge.toColumn(
      QuantileSketchAgg(bridge.toExpression(value), k, probes).toAggregateExpression())
}
