package graft

/** Per-query LEG timings for the bench (r19, verdict #6): the export
  * round-trips are pivot (CPU) + write (IO) + read-back (IO) fused into
  * one number, which made every IO-window flap on `export_*` a
  * re-measure argument. When [[enabled]] (set only by [[Bench]]), the
  * export queries stage their pivot through a cache so the write leg
  * times IO alone, and record each leg here; Bench emits per-leg medians
  * as `"legs"` sub-keys next to the per-query totals, so a flap
  * adjudicates from the JSON: pivot normalizes by the CPU canary,
  * write/read by `canary_io`. Disabled (the default — Verify, tests,
  * library users), the export plans stay fused and nothing records.
  */
object Legs {
  @volatile var enabled = false

  private val buf =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.ConcurrentLinkedQueue[Double]]]()

  def record(query: String, leg: String, sec: Double): Unit = if (enabled) {
    buf.computeIfAbsent(query,
        _ => new java.util.concurrent.ConcurrentHashMap())
      .computeIfAbsent(leg,
        _ => new java.util.concurrent.ConcurrentLinkedQueue())
      .add(sec): Unit
  }

  def timed[T](query: String, leg: String)(f: => T): T = {
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      record(query, leg, (System.nanoTime() - t0) / 1e9)
      r
    }
  }

  /** Whether any leg has been recorded for `query` (Bench uses this to
    * attach the read-back leg only to leg-recording queries).
    */
  def has(query: String): Boolean = buf.containsKey(query)

  /** Clear all recorded legs. Bench calls this at the top of a run:
    * `buf` is process-global, so without the reset a second run in the
    * same JVM would merge the previous run's samples into its leg
    * medians and see stale `has()` hits that flip its first-pass
    * timing rule (ADVICE r19).
    */
  def reset(): Unit = buf.clear()

  /** All samples per (query, leg), in recording order. */
  def snapshot(): Map[String, Map[String, Seq[Double]]] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.map { case (q, legs) =>
      q -> legs.asScala.map { case (l, xs) => l -> xs.asScala.toSeq }.toMap
    }.toMap
  }
}
