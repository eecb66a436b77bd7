package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT 2005): at most
  * `capacity` counters; when a new term arrives at a full sketch it REPLACES
  * the minimum counter, inheriting its count as overestimation error. The
  * classic guarantees: every true count is ≤ stored count ≤ true + err, and
  * any term with frequency > N/capacity is present.
  *
  * Why this beats the exact explode→groupBy(term) top-k at 100 TB: the
  * exact plan shuffles EVERY distinct (group, term) row; the sketch reduces
  * each map partition to `capacity` counters per group before the exchange
  * (TypedImperativeAggregate = partial aggregation), so shuffle volume is
  * O(groups × capacity × partitions) regardless of vocabulary size.
  *
  * Exactness contract (the oracle story, same shape as [[KmvDistinctAgg]]):
  * while a group's distinct-term count stays ≤ capacity, no counter is ever
  * evicted anywhere — every count is exact (err 0), and merge is plain
  * count addition (commutative/associative ⇒ partition-order independent ⇒
  * deterministic). Past capacity the sketch degrades per the paper's bound
  * and eviction order makes counts run-dependent — the price of bounded
  * state, documented not hidden.
  *
  * Counters live in a HashMap plus a TreeSet ordered by (count, term), so
  * update/merge/evict are all O(log capacity) — no linear min-scans.
  */
case class SpaceSavingAgg(
    term: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingAgg.Buf] {

  require(capacity >= 16, s"SpaceSaving needs a sane capacity, got $capacity")
  require(k >= 1 && k <= capacity, s"top-k size $k outside [1, $capacity]")

  override def children: Seq[Expression] = Seq(term)
  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string term, got ${term.dataType.simpleString}")

  override def dataType: DataType = ArrayType(SpaceSavingAgg.EntryType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingAgg.Buf =
    new SpaceSavingAgg.Buf(capacity)

  override def update(b: SpaceSavingAgg.Buf, input: InternalRow): SpaceSavingAgg.Buf = {
    val t = term.eval(input)
    if (t != null) b.add(t.asInstanceOf[UTF8String].toString, 1L, 0L)
    b
  }

  override def merge(b: SpaceSavingAgg.Buf, o: SpaceSavingAgg.Buf): SpaceSavingAgg.Buf = {
    b.mergeWith(o)
    b
  }

  /** Top-k counters by (count DESC, term ASC) — the deterministic tie-break
    * every exact top-k in this library uses.
    */
  override def eval(b: SpaceSavingAgg.Buf): Any = {
    val out = b.top(k).map { case (t, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), cnt))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(b: SpaceSavingAgg.Buf): Array[Byte] = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long, Long)]
    var bytes = 4
    b.foreach { (t, cnt, err) =>
      val tb = t.getBytes(StandardCharsets.UTF_8)
      entries += ((tb, cnt, err))
      bytes += 4 + tb.length + 16
    }
    val out = java.nio.ByteBuffer.allocate(bytes)
    out.putInt(entries.size)
    entries.foreach { case (tb, cnt, err) =>
      out.putInt(tb.length); out.put(tb); out.putLong(cnt); out.putLong(err)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingAgg.Buf = {
    val b = new SpaceSavingAgg.Buf(capacity)
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt()
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](in.getInt()); in.get(tb)
      b.load(new String(tb, StandardCharsets.UTF_8), in.getLong(), in.getLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(term = c(0))
}

object SpaceSavingAgg {

  val EntryType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  private final case class Entry(term: String, var cnt: Long, var err: Long)

  private val byCountThenTerm: java.util.Comparator[Entry] =
    (a: Entry, b: Entry) => {
      val c = java.lang.Long.compare(a.cnt, b.cnt)
      if (c != 0) c else a.term.compareTo(b.term)
    }

  final class Buf(capacity: Int) {
    private val byTerm = new java.util.HashMap[String, Entry]()
    private val ordered = new java.util.TreeSet[Entry](byCountThenTerm)

    /** Stream update: add `cnt` observations of `term` carrying `err`
      * overestimation. A new term at a full sketch evicts the min counter
      * and inherits its count as error — the classic SpaceSaving step,
      * correct for SINGLE observations.
      */
    def add(term: String, cnt: Long, err: Long): Unit = {
      val e = byTerm.get(term)
      if (e != null) {
        ordered.remove(e)
        e.cnt += cnt; e.err += err
        ordered.add(e); ()
      } else if (byTerm.size() < capacity) {
        val n = Entry(term, cnt, err)
        byTerm.put(term, n); ordered.add(n); ()
      } else {
        val min = ordered.pollFirst()
        byTerm.remove(min.term)
        val n = Entry(term, cnt + min.cnt, err + min.cnt)
        byTerm.put(term, n); ordered.add(n); ()
      }
    }

    /** Insert a counter verbatim, no eviction — deserialization and the
      * pre-truncation phase of [[mergeWith]].
      */
    def load(term: String, cnt: Long, err: Long): Unit = {
      val n = Entry(term, cnt, err)
      byTerm.put(term, n); ordered.add(n); ()
    }

    /** Sketch merge, mergeable-summaries style (Agarwal et al., PODS'12):
      * sum counters term-wise over the union, then truncate back to the
      * `capacity` largest. NOT the per-observation eviction step — applying
      * that to whole counters lets a long tail of single-count misses
      * ratchet min-count inheritance (each miss inherits the current min,
      * re-raising it) until tail counters crowd out true heavy hitters.
      * Summed counts keep the ≥-true invariant for every retained term;
      * truncation only drops the smallest counters; below capacity nothing
      * truncates, preserving the exactness contract.
      */
    def mergeWith(o: Buf): Unit = {
      o.foreach { (t, cnt, err) =>
        val e = byTerm.get(t)
        if (e != null) {
          ordered.remove(e)
          e.cnt += cnt; e.err += err
          ordered.add(e); ()
        } else load(t, cnt, err)
      }
      while (byTerm.size() > capacity) {
        val min = ordered.pollFirst()
        byTerm.remove(min.term); ()
      }
    }

    def foreach(f: (String, Long, Long) => Unit): Unit = {
      val it = ordered.iterator()
      while (it.hasNext) { val e = it.next(); f(e.term, e.cnt, e.err) }
    }

    /** k largest by (cnt DESC, term ASC). A one-shot sort at final eval —
      * O(capacity log capacity) once per group, not per row.
      */
    def top(k: Int): Seq[(String, Long)] = {
      val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      foreach((t, cnt, _) => all += ((t, cnt)))
      all.sortBy { case (t, cnt) => (-cnt, t) }.take(k).toSeq
    }
  }

  /** Top-k heavy hitters of `term` as `array<struct<term, cnt>>`, sorted by
    * (cnt DESC, term ASC). Exact while distinct terms per group ≤ capacity.
    */
  def heavyHitters(term: Column, capacity: Int = 8192, k: Int = 5): Column =
    bridge.toColumn(
      SpaceSavingAgg(bridge.toExpression(term), capacity, k).toAggregateExpression())
}
