package graft

import org.apache.spark.sql.SparkSession

import graft.functions.PolyHash

/** The SQL function surface registered by [[GraftExtensions]]. Uses its own
  * session (extensions bind at session build), same JVM/context.
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sql: SparkSession = {
    // getOrCreate() returns the suite-shared session and would skip the
    // extensions; clear, build against the same SparkContext, restore.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prev.foreach(SparkSession.setDefaultSession)
    prev.foreach(SparkSession.setActiveSession)
    s
  }

  test("config-path loading contract: reflectively instantiable and applicable") {
    // What `spark.sql.extensions=graft.GraftExtensions` requires of the
    // class: resolvable by name, a public no-arg constructor, and
    // assignable to SparkSessionExtensions => Unit, whose apply registers
    // without throwing. Tested at that level deliberately — a builder
    // `.config` probe is order-dependent (spark.sql.extensions is a STATIC
    // conf: once any suite has created the shared SparkContext, a later
    // builder setting is silently ignored and the probe tests nothing).
    // The registered functions' behavior is covered by the programmatic
    // `withExtensions` session below, which shares the same registration
    // list.
    val inst = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    noException should be thrownBy inst(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("wrong arity raises an analysis-time WRONG_NUM_ARGS error, not a raw require") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      sql.sql("SELECT poly_hash('a', 'b')").collect()
    }
    e.getCondition shouldBe "WRONG_NUM_ARGS.WITHOUT_SUGGESTION"
    e.getMessage should include("poly_hash")
  }

  test("sim_hash64 from SQL agrees with the reference implementation") {
    val row = sql.sql("SELECT sim_hash64(split('a b a c', ' ')) AS h")
      .collect().head
    row.getLong(0) shouldBe graft.functions.SimHash64.of(Seq("a", "b", "a", "c"))
  }

  test("scalar functions are callable from SQL and agree with the Scala API") {
    val row = sql.sql(
      """SELECT poly_hash('spark') AS h,
        |  bin_to_long(long_to_bin(1234567890123)) AS l,
        |  bin_to_int(int_to_bin(-42)) AS i,
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  sample_draw('bern|7') AS dr""".stripMargin)
      .collect().head
    row.getLong(0) shouldBe PolyHash.of("spark")
    row.getLong(1) shouldBe 1234567890123L
    row.getInt(2) shouldBe -42
    row.getDouble(3) shouldBe 11.0
    val h = PolyHash.of("bern|7")
    row.getLong(4) shouldBe (h * h % PolyHash.Mod * 48271L + h) % PolyHash.Mod
  }

  test("sketch aggregates and int8/repetition functions are callable from SQL") {
    val row = sql.sql(
      """SELECT repetition_stats('a b a').n_distinct AS nd,
        |  int8_dot(pack_int8(array(1, 2)), pack_int8(array(3, 4))) AS d,
        |  int8_dot(quantize_int8(array(3.0d, 4.0d), 5.0d),
        |           quantize_int8(array(3.0d, 4.0d), 5.0d)) AS q,
        |  z_order(3L, 3L) AS z""".stripMargin)
      .collect().head
    row.getLong(0) shouldBe 2L
    row.getLong(1) shouldBe 11L
    // (3,4)/5 quantizes to (76, 102): 76^2 + 102^2
    row.getLong(2) shouldBe (76L * 76 + 102L * 102)
    row.getLong(3) shouldBe 15L
    sql.sql("SELECT * FROM VALUES ('x', 5L), ('x', 5L), ('y', 9L) AS t(t, v)")
      .createOrReplaceTempView("sk_v")
    val agg = sql.sql(
      """SELECT kmv_distinct(xxhash64(t), 64) AS kd,
        |  space_saving_topk(t, 16, 1)[0].term AS hot,
        |  quantile_sketch(v, array(0.5d), 64)[0] AS med
        |FROM sk_v""".stripMargin).collect().head
    agg.getLong(0) shouldBe 2L
    agg.getString(1) shouldBe "x"
    agg.getDouble(2) shouldBe 5.0
  }

  test("sketch parameters must be literals (analysis-time error)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      sql.sql("SELECT space_saving_topk(t, CAST(v AS INT), 1) FROM VALUES ('x', 5L) AS t(t, v)")
        .collect()
    }
    e.getMessage should include("capacity")
    // NULL and out-of-int bigint literals are analysis errors too, not a
    // silently unboxed 0 / truncated sketch size
    intercept[org.apache.spark.sql.AnalysisException] {
      sql.sql("SELECT kmv_distinct(xxhash64(t), CAST(NULL AS INT)) FROM VALUES ('x') AS t(t)")
        .collect()
    }.getMessage should include("k")
    intercept[org.apache.spark.sql.AnalysisException] {
      sql.sql("SELECT space_saving_topk(t, 8589934608, 1) FROM VALUES ('x') AS t(t)")
        .collect()
    }.getMessage should include("capacity")
    intercept[org.apache.spark.sql.AnalysisException] {
      sql.sql("SELECT quantile_sketch(5L, array(0.5d, CAST(NULL AS DOUBLE)), 64) FROM VALUES ('x') AS t(t)")
        .collect()
    }.getMessage should include("probes")
  }

  test("max_by_ts aggregates from SQL (LWW per key)") {
    sql.sql(
      """SELECT * FROM VALUES
        |  ('a', CAST('old' AS BINARY), 1L), ('a', CAST('new' AS BINARY), 2L),
        |  ('b', CAST('x' AS BINARY), 5L)
        |AS cells(k, v, ts)""".stripMargin).createOrReplaceTempView("cells_v")
    val got = sql.sql(
      "SELECT k, CAST(max_by_ts(v, ts) AS STRING) AS win FROM cells_v GROUP BY k ORDER BY k")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    got shouldBe Seq("a" -> "new", "b" -> "x")
  }
}
