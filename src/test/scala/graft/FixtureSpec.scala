package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kv.KvTable

/** Fixture-drift guard (round-9 lesson): the harness regenerates
  * `/root/testdata` between rounds and can silently change PHYSICAL
  * encodings — round 8→9 switched `events.ts` from raw epoch-nanos int64 to
  * parquet timestamp[us], which a forced-long read then misdecoded 1000×
  * small, silently breaking every event-time query while types and row
  * shapes still looked plausible. These assertions pin the SEMANTIC
  * invariants of the decoded tables, so any future encoding change that the
  * readers don't normalize fails loudly here instead of in the oracle gate.
  */
class FixtureSpec extends SparkSpec {

  // Epoch-nanos bounds a correctly-decoded 2024 event stream must fall in.
  // A micros-as-nanos misread lands ~1.7e15 (year 1970), 1000× below lo; a
  // millis misread 1e6 lower still — any unit slip exits the window.
  private val lo = 1703980800000000000L // 2023-12-31T00:00:00Z
  private val hi = 1735689600000000000L // 2025-01-01T00:00:00Z

  test("events decodes to epoch-nanos within the generated 2024 span") {
    val ev = KvTable.events(spark, sfDir)
    ev.schema("tsNanos").dataType shouldBe LongType
    val r = ev.agg(count(lit(1)), min("tsNanos"), max("tsNanos")).collect()(0)
    r.getLong(0) should be > 0L
    val (mn, mx) = (r.getLong(1), r.getLong(2))
    withClue(s"min tsNanos $mn outside [$lo,$hi] — ts unit misdecoded? ") {
      mn should (be >= lo and be <= hi)
    }
    withClue(s"max tsNanos $mx outside [$lo,$hi] — ts unit misdecoded? ") {
      mx should (be >= lo and be <= hi)
    }
    // The stream spans real wall-clock time (weeks, not microseconds):
    // catches a truncating decode that collapses the span even if the
    // endpoints sneak into the window.
    (mx - mn) should be > 24L * 3600 * 1000000000L
  }

  test("streaming events source decodes identically to the batch loader") {
    // Batch/stream parity on the SAME fixture file: the streaming reader
    // carries its own schema (file streams can't infer), so a drift fix
    // applied only batch-side would pass the test above and still ship
    // wrong stream results. min/max/count over one AvailableNow replay.
    import org.apache.spark.sql.streaming.Trigger
    val ev = graft.streaming.StreamingPivot.eventsStream(spark, sfDir)
      .groupBy().agg(count(lit(1)).as("n"), min("ts").as("mn"), max("ts").as("mx"))
    val out = "fixture_stream_parity"
    val q = ev.writeStream.format("memory").queryName(out)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val s = spark.table(out).collect()(0)
    val b = KvTable.events(spark, sfDir)
      .agg(count(lit(1)), min("tsNanos"), max("tsNanos")).collect()(0)
    s.getLong(0) shouldBe b.getLong(0)
    s.getLong(1) shouldBe b.getLong(1)
    s.getLong(2) shouldBe b.getLong(2)
  }

  test("eventsRaw normalizes BOTH fixture encodings to the same nanos") {
    // The two encodings the harness has actually shipped: raw int64 nanos
    // (rounds 1-8) and parquet timestamp[us] (round 9+). eventsRaw must
    // decode them to IDENTICAL tsNanos — this is the synthetic pin of the
    // round-10 fix, independent of whichever encoding the live fixture
    // carries today.
    import spark.implicits._
    val base = sys.props("java.io.tmpdir") + "/graft_test/fixture_encodings"
    graft.sinks.Sinks.deleteRecursive(spark, base)
    val nanos = Seq(
      (1L, 1704067200000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1706745600123456000L, 11L, "view", 2.5, "{}"))
    val df = nanos.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$base/legacy.parquet") // raw long nanos
    df.withColumn("ts", timestamp_micros(col("ts") / 1000 cast "long"))
      .write.parquet(s"$base/modern.parquet") // timestamp[us]
    def decoded(p: String) = KvTable.eventsRaw(spark, p)
      .select("event_id", "ts").as[(Long, Long)].collect().toMap
    val legacy = decoded(s"$base/legacy.parquet")
    val modern = decoded(s"$base/modern.parquet")
    val expect = nanos.map(r => r._1 -> r._2).toMap
    legacy shouldBe expect
    // micros-precision fixture: nanos truncated to the stored micros
    modern shouldBe expect.map { case (k, v) => k -> (v / 1000 * 1000) }
    // and both land in engine shape: a LongType ts column
    KvTable.eventsRaw(spark, s"$base/modern.parquet")
      .schema("ts").dataType shouldBe LongType
  }

  test("core tables load with expected shapes") {
    val expected = Map(
      "region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "documents" -> 500L, "embeddings" -> 500L)
    expected.foreach { case (name, n) =>
      withClue(s"$name: ") {
        KvTable.table(spark, sfDir, name).count() shouldBe n
      }
    }
    val li = KvTable.table(spark, sfDir, "lineitem")
    li.count() should be > 1000L
    Seq("l_orderkey", "l_partkey", "l_suppkey")
      .foreach(c => li.schema(c).dataType shouldBe LongType)
    li.schema("l_linenumber").dataType shouldBe IntegerType
    val docs = KvTable.table(spark, sfDir, "documents")
    docs.schema("text").dataType shouldBe StringType
    val emb = KvTable.table(spark, sfDir, "embeddings")
    emb.schema("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => // ok
      case other => fail(s"embeddings.embedding unexpected type $other")
    }
  }
}
