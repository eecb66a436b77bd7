package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property sweep over the top-n routing space ([[KvIndexRouting]]
  * ORDER-BY arm + [[KvIndex.topNCovered]]): every combination of
  * direction × k × bound shape × index freshness must return EXACTLY the
  * unrouted plan's rows (the (value, rowKey) tie-break makes the full
  * sequence deterministic, so the comparison is order-sensitive). The
  * sweep is the adversarial guard for the r18 strict bounds extractor —
  * an extraction bug (wrong inclusivity, mishandled open end, consumed
  * residual) shows up as a row diff somewhere in the grid.
  */
class KvTopNPropSpec extends graft.SparkSpec {

  private val base = s"${sys.props("java.io.tmpdir")}/graft_test/kv_topn_prop"

  /** 300 keys, value = (id * 137) % 5000 (collisions exercise the
    * tie-break), plus post-build DML. `stale = true` leaves the last
    * commits unabsorbed.
    */
  private def table(stale: Boolean): String = {
    val dir = s"$base/${if (stale) "stale" else "fresh"}"
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    spark.range(300).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST((id * 137) % 5000 AS STRING), 'UTF-8') AS value",
      "id AS ts")
      .write.format("graft-kv").option("regions", 3).mode("overwrite").save(dir)
    KvIndex.create(spark, dir, "by_v", "f", "v", pad = 6, covered = true)
    // DML: 20 updates (10 jump into the top, 10 drop low) + 15 deletes
    spark.range(20).selectExpr(
      "lpad(CAST(id * 13 AS STRING), 6, '0') AS rowKey",
      "'f' AS family", "'v' AS qualifier",
      "encode(CAST(CASE WHEN id < 10 THEN 6000 + id ELSE id END AS STRING), 'UTF-8') AS value",
      "1000000 + id AS ts")
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    KvDelete.deleteRows(spark, dir,
      spark.range(100, 115).selectExpr("lpad(CAST(id AS STRING), 6, '0') AS rowKey"))
    if (!stale) {
      val r = KvIndex.refresh(spark, dir, "by_v")
      assert(r.isInstanceOf[KvIndex.Refreshed], s"staging refresh: $r")
    }
    KvIndexRouting.install(spark)
    dir
  }

  private def rows(df: DataFrame): Seq[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("routed == unrouted across direction × k × bounds × freshness (the full grid)") {
    var routedCount = 0
    var total = 0
    for (stale <- Seq(false, true)) {
      val dir = table(stale)
      spark.read.format("graft-kv").load(dir)
        .filter(col("family") === "f" && col("qualifier") === "v")
        .groupBy(col("rowKey"))
        .agg(decode(graft.functions.MaxByTsAgg.maxByTs(
          col("value"), col("ts")), "UTF-8").as("value"))
        .createOrReplaceTempView("tp_v")
      val boundShapes = Seq(
        "", // bare top-n
        "WHERE CAST(value AS BIGINT) >= 1000",
        "WHERE CAST(value AS BIGINT) < 3000",
        "WHERE CAST(value AS BIGINT) >= 1000 AND CAST(value AS BIGINT) < 3000",
        "WHERE CAST(value AS BIGINT) > 4990", // near-empty exclusive lo
        "WHERE CAST(value AS BIGINT) >= 3000 AND CAST(value AS BIGINT) < 1000") // empty
      for {
        desc <- Seq(true, false)
        k <- Seq(1, 5, 40)
        where <- boundShapes
      } {
        val d = if (desc) "DESC" else "ASC"
        val sql =
          s"""SELECT rowKey, value FROM tp_v $where
             |ORDER BY CAST(value AS BIGINT) $d, rowKey $d LIMIT $k""".stripMargin
        val routedDf = spark.sql(sql)
        val got = rows(routedDf)
        if (routedDf.queryExecution.executedPlan.toString
            .contains("KvRoutedLookup")) routedCount += 1
        total += 1
        spark.conf.set(KvIndexRouting.EnabledKey, "false")
        try {
          val want = rows(spark.sql(sql))
          assert(got == want,
            s"routed != unrouted (stale=$stale, k=$k, $d, '$where'):\n" +
              s"  routed:   $got\n  unrouted: $want")
        } finally spark.conf.unset(KvIndexRouting.EnabledKey)
      }
    }
    // the sweep must actually exercise the route, not compare unrouted
    // plans against themselves
    assert(routedCount >= total / 2,
      s"only $routedCount/$total grid cells routed — the sweep lost its teeth")
  }
}
