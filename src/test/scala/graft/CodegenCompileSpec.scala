package graft

/** Every registered custom expression executed with
  * `spark.sql.codegen.fallback=false`, so a janino COMPILE failure in any
  * `doGenCode` fails the build instead of silently dropping the stage to
  * interpreted mode (which result-comparison tests cannot see — the
  * fallback computes the same values, just slower; the r7 `z_order`
  * multi-line-statement regression shipped exactly that way).
  *
  * The snippet map is COVERAGE-CHECKED against the extension registry: a
  * new registered function without a snippet here fails the first test.
  */
class CodegenCompileSpec extends SparkSpec {

  /** Own session: the SQL surface binds at session build (same pattern as
    * GraftExtensionsSpec).
    */
  private lazy val sql: org.apache.spark.sql.SparkSession = {
    val prev = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-codegen-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prev.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
    prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    s
  }

  // One executable SQL snippet per registered function, each shaped so the
  // expression lands inside a codegen'd projection/aggregation stage.
  private val snippets: Map[String, String] = Map(
    "poly_hash" -> "SELECT poly_hash(CAST(id AS STRING)) FROM range(64)",
    "sim_hash64" -> "SELECT sim_hash64(array(CAST(id AS STRING), 'x')) FROM range(64)",
    "sample_draw" -> "SELECT sample_draw(CAST(id AS STRING)) FROM range(64)",
    "text_stats" -> "SELECT text_stats(concat('a b c ', CAST(id AS STRING))).ws_tokens FROM range(64)",
    "bin_to_int" -> "SELECT bin_to_int(int_to_bin(CAST(id AS INT))) FROM range(64)",
    "bin_to_long" -> "SELECT bin_to_long(long_to_bin(id)) FROM range(64)",
    "int_to_bin" -> "SELECT int_to_bin(CAST(id AS INT)) FROM range(64)",
    "long_to_bin" -> "SELECT long_to_bin(id) FROM range(64)",
    "vec_dot" -> ("SELECT vec_dot(array(CAST(id AS DOUBLE), 1.0d), " +
      "array(2.0d, 3.0d)) FROM range(64)"),
    "vec_dot_matrix" -> ("SELECT vec_dot_matrix(array(CAST(id AS DOUBLE), 1.0d), " +
      "array(array(2.0d, 3.0d))) FROM range(64)"),
    "max_by_ts" -> ("SELECT max_by_ts(long_to_bin(id), id) FROM range(64) " +
      "GROUP BY id % 4"),
    "repetition_stats" -> ("SELECT repetition_stats(concat('a a b ', " +
      "CAST(id AS STRING))).top_cnt FROM range(64)"),
    "pack_int8" -> "SELECT pack_int8(array(CAST(id % 100 AS INT), -5)) FROM range(64)",
    "int8_dot" -> ("SELECT int8_dot(pack_int8(array(CAST(id % 100 AS INT), 2)), " +
      "pack_int8(array(3, 4))) FROM range(64)"),
    "quantize_int8" -> ("SELECT int8_dot(quantize_int8(array(CAST(id % 5 AS DOUBLE), " +
      "1.0d), 10.0d), quantize_int8(array(2.0d, 3.0d), 10.0d)) FROM range(64)"),
    "z_order" -> "SELECT z_order(id, id + 1) FROM range(64)",
    "kmv_distinct" -> ("SELECT kmv_distinct(poly_hash(CAST(id AS STRING)), 256) " +
      "FROM range(64) GROUP BY id % 4"),
    "space_saving_topk" -> ("SELECT space_saving_topk(CAST(id % 7 AS STRING), " +
      "64, 3) FROM range(64) GROUP BY id % 4"),
    "quantile_sketch" -> ("SELECT quantile_sketch(id, array(0.5d, 0.9d), 256) " +
      "FROM range(64) GROUP BY id % 4"))

  test("every registered function has a compile-check snippet") {
    val registered = GraftExtensions.registrations.map(_._1).toSet
    val missing = registered -- snippets.keySet
    assert(missing.isEmpty, s"no codegen snippet for: ${missing.mkString(", ")}")
  }

  test("all custom expressions compile under codegen (no interpreter fallback)") {
    val key = "spark.sql.codegen.fallback"
    val before = sql.conf.get(key)
    sql.conf.set(key, "false")
    try {
      snippets.toSeq.sortBy(_._1).foreach { case (name, q) =>
        withClue(s"$name: ") { noException should be thrownBy sql.sql(q).collect() }
      }
    } finally sql.conf.set(key, before)
  }
}
