package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.kv.{KvGenerator, KvTable, RangeLayout}
import graft.ops.{KvPivot, TypedProject}
import graft.schema.SchemaFile
import graft.streaming.StreamingPivot

/** Relational extensions (SURVEY §2.4-2.6): joins, windows, set ops.
  *
  * One of the domain slices of the [[Queries]] catalog (r18 split —
  * the registry and the DuckDB oracle maps stay in Queries.scala; the
  * self-type gives every slice the shared fixtures without widening
  * their visibility beyond the package).
  */
private[graft] trait QueriesRelational { self: Queries.type =>
  // --------------------------------------------- relational (SURVEY §2.4-2.6)

  /** Enrich-by-key equi-join (the only reference-shaped join use case,
    * SURVEY §2.4): orders enriched with the small customer dim — broadcast
    * by hint, aggregates integer-exact.
    */
  def relEnrichJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = KvTable.table(spark, sfDir, "orders")
    val customer = KvTable.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice"))).cast("long").as("sum_price"))
  }

  private[graft] lazy val relEnrichJoinSql: String =
    """SELECT c_nationkey, count(*) AS n_orders,
      |  CAST(sum(floor(o_totalprice)) AS BIGINT) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Window top-k (SURVEY §2.5-2.6 absent in the reference): top-3 orders
    * per customer by price, deterministic tie-break on orderkey.
    */
  def relTopkOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    KvTable.table(spark, sfDir, "orders")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("rank").cast("long").as("rank"),
        floor(col("o_totalprice") * 100).cast("long").as("price_x100"))
  }

  private[graft] lazy val relTopkOrdersSql: String =
    """SELECT o_custkey, o_orderkey, rk::BIGINT AS rank,
      |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_x100
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3""".stripMargin

  /** Salted two-phase aggregation over an extreme-skew key (5 event types):
    * the reduce side runs on `buckets` tasks per key instead of one.
    */
  def relSkewAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.SkewTools
    val events = KvTable.table(spark, sfDir, "events")
    SkewTools.saltedSumCount(events,
        key = col("event_type"),
        value = floor(col("value") * 100).cast("long"),
        salt = col("event_id"), buckets = 32)
      .select(col("k").as("event_type"), col("n"), col("sum").as("sum_x100"))
  }

  private[graft] lazy val relSkewAggSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(floor(value * 100)) AS BIGINT) AS sum_x100
      |FROM events GROUP BY 1""".stripMargin

  /** Backward as-of join (time-series enrichment; SURVEY §2.4 — the
    * reference has no joins at all): each click picks up the same user's
    * most recent purchase at-or-before it. Sort-based single-shuffle
    * implementation, [[graft.ops.AsofJoin]].
    */
  def relAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.AsofJoin
    val ev = KvTable.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("tsNanos"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsNanos"), col("value"))
    AsofJoin.asofBackward(clicks, purchases,
        key = Seq("user_id"), timeCol = "tsNanos", tieCol = "event_id",
        rightPayload = Seq("event_id", "tsNanos", "value"))
      .select(col("event_id").as("click_id"), col("user_id"),
        col("_asof.event_id").as("purchase_id"),
        expr("(tsNanos - _asof.tsNanos) DIV 1000000000").as("gap_s"),
        floor(col("_asof.value") * 100).cast("long").as("p_value_x100"))
  }

  /** Equivalent to DuckDB's `c ASOF LEFT JOIN p ON user AND c.ts >= p.ts`,
    * written as an explicit left join + rank-1 pick because ASOF JOIN leaves
    * equal-timestamp ties arbitrary while the engine's tie-break (largest
    * event id) must be replayable.
    */
  private[graft] lazy val relAsofJoinSql: String =
    """SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
      |  (epoch_ns(c.ts) - epoch_ns(p.ts)) // 1000000000 AS gap_s,
      |  CAST(floor(p.value * 100) AS BIGINT) AS p_value_x100
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |QUALIFY row_number() OVER (
      |  PARTITION BY c.event_id ORDER BY p.ts DESC, p.event_id DESC) = 1""".stripMargin

  /** Banded interval join ([[graft.ops.RangeJoin]]): clicks within the day
    * before each error, aggregated per error.
    */
  def relRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.RangeJoin
    val ev = KvTable.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("tsNanos").as("ets"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("tsNanos").as("cts"), col("value").as("cval"))
    RangeJoin.backwardWindowJoin(errors, clicks, Seq("user_id"), "ets", "cts",
        window = 24L * 3600 * 1000000000L)
      .groupBy(col("err_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(floor(col("cval") * 100).cast("long")).as("sum_click_x100"))
  }

  private[graft] lazy val relRangeJoinSql: String =
    """SELECT e.event_id AS err_id, e.user_id, count(*) AS n_clicks,
      |  CAST(sum(CAST(floor(c.value * 100) AS BIGINT)) AS BIGINT) AS sum_click_x100
      |FROM events e JOIN events c
      |  ON e.user_id = c.user_id AND c.event_type = 'click'
      | AND epoch_ns(c.ts) <= epoch_ns(e.ts)
      | AND epoch_ns(c.ts) >= epoch_ns(e.ts) - 86400000000000
      |WHERE e.event_type = 'error'
      |GROUP BY 1, 2""".stripMargin

  /** Hierarchical aggregation (SURVEY §2.3 — grouping sets are free Spark
    * built-ins the reference never had): rollup over (status, priority)
    * with a grouping id disambiguating subtotal levels.
    */
  def relRollup(spark: SparkSession, sfDir: String): DataFrame =
    KvTable.table(spark, sfDir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice"))).cast("long").as("sum_price"))

  private[graft] lazy val relRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
      |  count(*) AS n_orders,
      |  CAST(sum(floor(o_totalprice)) AS BIGINT) AS sum_price
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin

  /** CUBE over (status, priority, year): all 2³ grouping-set combinations
    * in ONE pass — Spark expands the sets into a single partial-aggregable
    * plan (each input row contributes to every set map-side), so the
    * 8-way report costs one exchange, not eight scans. The rollup's lattice
    * completion; `grouping_id` disambiguates the NULL-as-total rows exactly
    * as DuckDB numbers them.
    */
  def relCube(spark: SparkSession, sfDir: String): DataFrame =
    KvTable.table(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .cube(col("o_orderstatus"), col("o_orderpriority"), col("o_year"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice"))).cast("long").as("sum_price"))

  private[graft] lazy val relCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS o_year,
      |  GROUPING_ID(o_orderstatus, o_orderpriority, year(o_orderdate)) AS gid,
      |  count(*) AS n_orders,
      |  CAST(sum(floor(o_totalprice)) AS BIGINT) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority, year(o_orderdate))""".stripMargin

  /** Iterative graph compute ([[graft.ops.PageRank]]): 3 supersteps of
    * integer-exact PageRank over the symmetric customer↔supplier trade
    * graph (an edge per distinct lineitem trade relationship, both
    * directions, nodes namespaced even/odd). Every superstep is one hash
    * join + one aggregation exchange; fixed-count iteration built into the
    * plan, nothing driver-side.
    */
  def relPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val li = KvTable.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = KvTable.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val raw = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
    val edges = raw.select(col("a").as("src"), col("b").as("dst"))
      .union(raw.select(col("b").as("src"), col("a").as("dst")))
    graft.ops.PageRank.run(edges)
  }

  private[graft] lazy val relPagerankSql: String =
    """WITH raw AS (SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node FROM e),
      |nn AS (SELECT count(*) AS N FROM nodes),
      |r0 AS (SELECT node, 1000000000000 // N AS r FROM nodes CROSS JOIN nn),
      |c1 AS (SELECT dst, sum(r // deg) AS cin
      |       FROM r0 JOIN e ON node = src JOIN deg USING (src) GROUP BY 1),
      |r1 AS (SELECT node, (1000000000000 * 15) // (100 * N)
      |         + (85 * coalesce(cin, 0)) // 100 AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON node = dst),
      |c2 AS (SELECT dst, sum(r // deg) AS cin
      |       FROM r1 JOIN e ON node = src JOIN deg USING (src) GROUP BY 1),
      |r2 AS (SELECT node, (1000000000000 * 15) // (100 * N)
      |         + (85 * coalesce(cin, 0)) // 100 AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON node = dst),
      |c3 AS (SELECT dst, sum(r // deg) AS cin
      |       FROM r2 JOIN e ON node = src JOIN deg USING (src) GROUP BY 1),
      |r3 AS (SELECT node, (1000000000000 * 15) // (100 * N)
      |         + (85 * coalesce(cin, 0)) // 100 AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON node = dst)
      |SELECT node::BIGINT AS node, r::BIGINT AS rank_s FROM r3""".stripMargin

  /** Per-supplier triangle counts over the DOULION-sampled supplier
    * co-occurrence graph. The graph: suppliers are adjacent when they serve
    * ≥1 common order; since co-occurrence graphs densify toward complete
    * (every pair of the 100 sf0.01 suppliers shares an order), the edge set
    * is p=1/5 Bernoulli-sampled by a deterministic integer hash — DOULION
    * (Tsourakakis et al., KDD'09): count triangles on the sampled graph,
    * estimate the original as count/p³ with provably small variance. The
    * sample is the same arithmetic in both engines, so counts hash-match;
    * [[graft.ops.Triangles]] does the degree-oriented enumeration that
    * bounds wedge fan-out at scale.
    */
  def relTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Triangles
    val pe = KvTable.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val pairs = pe.as("a").join(pe.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey"))
      .select(col("a.l_suppkey").as("u"), col("b.l_suppkey").as("v"))
      .distinct()
    val e = pairs.filter(
      ((col("u") * 2654435761L + col("v") * 40503L) % 1000003L) % 5 === 0)
    Triangles.perNodeCounts(e)
  }

  private[graft] lazy val relTrianglesSql: String =
    """WITH pe AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      |e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v
      |       FROM pe a JOIN pe b ON a.l_orderkey = b.l_orderkey
      |                          AND a.l_suppkey < b.l_suppkey
      |       GROUP BY 1, 2),
      |e AS (SELECT u, v FROM e0
      |      WHERE ((u * 2654435761 + v * 40503) % 1000003) % 5 = 0),
      |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |        FROM e e1 JOIN e e2 ON e1.v = e2.u
      |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |x AS (SELECT unnest([a, b, c]) AS node FROM tri)
      |SELECT node::BIGINT AS node, count(*)::BIGINT AS n_tri
      |FROM x GROUP BY 1""".stripMargin

  /** Hourly gap-fill over the events series ([[graft.ops.GapFill]]): per
    * event_type, the dense hour grid with observation counts and the last
    * written value (LWW by event_id, like the pivot) carried forward into
    * empty hours. Integer hour buckets (`tsNanos DIV 3600e9`) keep the
    * bucketing exact in both engines — nanos exceed 2^53, so double division
    * would mis-bucket.
    */
  def relGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.GapFill
    val observed = KvTable.events(spark, sfDir)
      .groupBy(col("event_type"), expr("tsNanos DIV 3600000000000").as("h"))
      .agg(count(lit(1)).as("n_obs"),
        max_by(floor(col("value") * 100).cast("long"), col("event_id")).as("v"))
    GapFill.locf(observed, "event_type", "h", Seq("v"), materialize = true)
      .select(col("event_type"), col("h"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("v").as("filled_x100"))
  }

  private[graft] lazy val relGapfillSql: String =
    """WITH b AS (SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
      |             count(*) AS n_obs,
      |             max_by(CAST(floor(value * 100) AS BIGINT), event_id) AS v
      |           FROM events GROUP BY 1, 2),
      |g AS (SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
      |      FROM b GROUP BY event_type),
      |j AS (SELECT g.event_type, g.h, coalesce(b.n_obs, 0) AS n_obs, b.v
      |      FROM g LEFT JOIN b ON g.event_type = b.event_type AND g.h = b.h)
      |SELECT event_type, h::BIGINT AS h, n_obs::BIGINT AS n_obs,
      |  (last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS filled_x100
      |FROM j""".stripMargin

  /** Both sides of the trade join persisted as bucketed catalog tables,
    * hash-bucketed on their join keys with equal bucket counts — the
    * co-location contract under which a big-big join needs NO exchange at
    * all (and the downstream per-key aggregate reuses the same
    * partitioning). At 100 TB this is THE pattern for a fact table joined
    * repeatedly on one key: pay the bucketing once at load, never shuffle
    * the fact again.
    */
  private[graft] def ensureBucketedTrade(spark: SparkSession, sfDir: String): String =
    artifacts.computeIfAbsent(s"bucketed_trade|$sfDir", _ => {
      // no dots: the slug names CATALOG TABLES, where '.' splits schema.table
      val slug = sfDir.replaceAll("[^A-Za-z0-9]+", "_") +
        "_" + Integer.toHexString(sfDir.hashCode)
      val base = tmpOut(s"bucketed_trade_$slug")
      def persist(df: DataFrame, name: String, key: String): Unit = {
        val table = s"graft_${name}_$slug"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        graft.sinks.Sinks.deleteRecursive(spark, s"$base/$name")
        df.repartition(8, col(key))
          .write.format("parquet").bucketBy(8, key).sortBy(key)
          .option("path", s"$base/$name").saveAsTable(table)
      }
      persist(KvTable.table(spark, sfDir, "orders"), "orders", "o_custkey")
      persist(KvTable.table(spark, sfDir, "customer"), "customer", "c_custkey")
      slug
    })

  /** Zero-exchange big-big join over the bucketed tables: the merge-hinted
    * sort-merge join consumes both bucketed scans' hash partitioning
    * directly, and the per-custkey aggregate rides the same partitioning —
    * PlanSpec asserts NO shuffle anywhere in the executed plan (the
    * broadcast alternative would also avoid a shuffle here, but only
    * because customer is small; the bucketed plan is the one that survives
    * when both sides are fact-sized).
    */
  def relBucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val slug = ensureBucketedTrade(spark, sfDir)
    val o = spark.table(s"graft_orders_$slug")
    val c = spark.table(s"graft_customer_$slug")
    o.join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("c_nationkey")).as("nationkey"),
        sum(floor(col("o_totalprice"))).cast("long").as("sum_price"))
  }

  private[graft] lazy val relBucketedJoinSql: String =
    """SELECT o_custkey, count(*) AS n_orders, max(c_nationkey) AS nationkey,
      |  CAST(sum(floor(o_totalprice)) AS BIGINT) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Semi-structured extraction: the events `props` JSON column parsed and
    * aggregated. `get_json_object` evaluates per row in the scan projection
    * (no UDF, no intermediate struct materialization); the only exchange is
    * the ≤50-key final aggregate — the standard shape for prop-bag columns
    * at scale, where parsing pushes to the scan and raw JSON never shuffles.
    */
  def kvJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    KvTable.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  private[graft] lazy val kvJsonExtractSql: String =
    """SELECT event_type,
      |  json_extract_string(props, '$.k')::BIGINT % 10 AS k_mod,
      |  count(*) AS n,
      |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Trailing 7-bucket moving average OVER the gap-filled series — the
    * reason gap fill precedes windowed analytics: on the raw sparse series
    * a ROWS frame would span wildly different time extents per row; on the
    * dense grid ROWS 6 PRECEDING IS seven hours. Integer avg (sum DIV n)
    * keeps the oracle hash-exact.
    */
  def relMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-6, Window.currentRow)
    relGapfill(spark, sfDir)
      .select(col("event_type"), col("h"), col("filled_x100"),
        sum(col("filled_x100")).over(w).as("s"),
        count(lit(1)).over(w).as("nw"))
      .select(col("event_type"), col("h"), col("filled_x100"),
        expr("s DIV nw").as("avg7_x100"))
  }

  private[graft] lazy val relMovingAvgSql: String =
    s"""WITH filled AS ($relGapfillSql)
       |SELECT event_type, h, filled_x100,
       |  (sum(filled_x100) OVER w // count(*) OVER w)::BIGINT AS avg7_x100
       |FROM filled
       |WINDOW w AS (PARTITION BY event_type ORDER BY h
       |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Semi/anti joins (SURVEY §2.4 — absent in the reference, free in Spark):
    * active users = customers with at least one event; for each, order count
    * plus an anti-join flag against high-priority orders. Both sides plan as
    * broadcast/hash joins with no row duplication — the point of semi/anti
    * over `IN`-style inner joins at scale.
    */
  def relSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = KvTable.table(spark, sfDir, "orders")
    val activeUsers = KvTable.events(spark, sfDir)
      .select(col("user_id")).distinct()
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("u_custkey"))
    orders
      .join(activeUsers, col("o_custkey") === col("user_id"), "left_semi")
      .join(urgent, col("o_custkey") === col("u_custkey"), "left_anti")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice"))).cast("long").as("sum_price"))
  }

  private[graft] lazy val relSemiAntiSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(floor(o_totalprice)) AS BIGINT) AS sum_price
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders u
      |                  WHERE u.o_orderpriority = '1-URGENT'
      |                    AND u.o_custkey = o.o_custkey)
      |GROUP BY 1""".stripMargin

  /** Set operations (SURVEY §2.7 — absent in the reference): customer keys
    * that ordered but never appeared in events (EXCEPT), appeared in both
    * (INTERSECT), tagged and unioned. Distinct set semantics on both sides.
    */
  def relSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val orderKeys = KvTable.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"))
    val eventKeys = KvTable.events(spark, sfDir)
      .select(col("user_id").as("k"))
    orderKeys.intersect(eventKeys).withColumn("src", lit("both"))
      .unionByName(orderKeys.except(eventKeys).withColumn("src", lit("orders_only")))
  }

  private[graft] lazy val relSetOpsSql: String =
    """SELECT k, 'both' AS src FROM (
      |  SELECT o_custkey AS k FROM orders INTERSECT SELECT user_id FROM events)
      |UNION ALL
      |SELECT k, 'orders_only' AS src FROM (
      |  SELECT o_custkey AS k FROM orders EXCEPT SELECT user_id FROM events)""".stripMargin

  /** Distinct users per event type through the KMV sketch
    * ([[graft.functions.KmvDistinctAgg]]): constant 512 KiB state per group
    * at ANY input size, mergeable at any partitioning. At the verify scales
    * every group is far below k = 65536, where KMV is provably exact — so
    * the `count(DISTINCT)` oracle matches hash-exactly; past k (the 100-TB
    * path) the same plan degrades to a ~0.4%-error estimate instead of an
    * unbounded exact-distinct shuffle.
    */
  def aggDistinctKmv(spark: SparkSession, sfDir: String): DataFrame =
    KvTable.table(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvDistinctAgg.kmvDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  private[graft] lazy val aggDistinctKmvSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events
      |FROM events GROUP BY 1""".stripMargin

  /** Bloom-reduced shuffle join ([[graft.ops.BloomJoin]]): lineitem joined
    * to the urgent-orders subset — a build side that at 100 TB is far past
    * broadcast range (~20% of orders) while its key SET still fits a bloom
    * sketch. The codegen'd pre-filter drops non-joining lineitem rows
    * before the join shuffle; the exact join absorbs false positives, so
    * the result is hash-identical to the plain join the oracle runs.
    */
  def relBloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = KvTable.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = KvTable.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    graft.ops.BloomJoin.reduceJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 100000L, fpp = 0.01)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100)).cast("long").as("rev_x100"))
  }

  private[graft] lazy val relBloomJoinSql: String =
    """SELECT o_orderkey, count(*) AS n_items,
      |  CAST(sum(floor(l_extendedprice * 100)) AS BIGINT) AS rev_x100
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1""".stripMargin

  /** Exact distributed quantiles per group WITHOUT a per-group sort of the
    * raw rows (Spark's `percentile` buffers and sorts every value per
    * group — a scale killer on a hot group). The inputs are integer-floored,
    * so the value domain is bounded: groupBy(group, value) + count
    * compresses the data to one row per DISTINCT value (one hash shuffle),
    * a cumulative count over that compact relation locates each
    * percentile's bracketing values, and the final interpolation replays
    * `percentile`'s exact formula `(hi−pos)·loVal + (pos−lo)·hiVal` —
    * bit-identical output (DuckDB `quantile_cont` oracle unchanged). Every
    * exchange and sort after the first touches only distinct values, never
    * raw rows; no sort-based `percentile` aggregate appears in the plan
    * (PlanSpec pins this). The approximate path at true scale remains
    * `approx_percentile` (t-digest), which no cross-engine oracle replays.
    */
  def relQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = KvTable.table(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"), floor(col("o_totalprice")).as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("v"))
    // n rides the SAME exchange+sort as the running sum (partition-only
    // frame over an already-sorted child): one window pass produces both,
    // where a separate `groupBy(max(cum))` + join would recompute the whole
    // window subtree (Spark does not share it) and shuffle twice more.
    val wAll = Window.partitionBy(col("o_orderstatus"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = vc.select(col("o_orderstatus"), col("v"), col("c"),
      sum(col("c")).over(w).as("cum"), sum(col("c")).over(wAll).as("n"))
    // Exactly one distinct-value row covers sorted index i (cum−c ≤ i < cum),
    // so a conditional max picks the value at that rank.
    def valAt(i: Column): Column =
      max(when(col("cum") - col("c") <= i && i < col("cum"), col("v")))
    def pos(p: Double): Column = lit(p) * (col("n") - 1).cast("double")
    val brackets = Seq("p50" -> 0.5, "p90" -> 0.9).flatMap { case (nm, p) =>
      Seq(valAt(floor(pos(p))).as(s"_lo_$nm"), valAt(ceil(pos(p))).as(s"_hi_$nm"))
    }
    // percentile's interpolation, replayed exactly: position = p·(n−1),
    // result = (ceil(pos)−pos)·v[floor(pos)] + (pos−floor(pos))·v[ceil(pos)]
    def interp(nm: String, p: Double): Column = {
      val (lo, hi) = (floor(pos(p)), ceil(pos(p)))
      val loV = col(s"_lo_$nm").cast("double")
      val hiV = col(s"_hi_$nm").cast("double")
      val r = when(lo === hi, loV)
        .otherwise((hi - pos(p)) * loV + (pos(p) - lo) * hiV)
      floor(r * 100).cast("long")
    }
    cum
      .groupBy(col("o_orderstatus"), col("n"))
      .agg(brackets.head, brackets.tail: _*)
      .select(col("o_orderstatus"),
        interp("p50", 0.5).as("p50_x100"),
        interp("p90", 0.9).as("p90_x100"),
        col("n"))
  }

  private[graft] lazy val relQuantilesSql: String =
    """SELECT o_orderstatus,
      |  CAST(floor(quantile_cont(floor(o_totalprice), 0.5) * 100) AS BIGINT) AS p50_x100,
      |  CAST(floor(quantile_cont(floor(o_totalprice), 0.9) * 100) AS BIGINT) AS p90_x100,
      |  count(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** The same per-status percentiles through the MERGEABLE quantile sketch
    * ([[graft.functions.QuantileSketchAgg]]) instead of the bounded-domain
    * exact plan: one partial-aggregated pass, O(k·log n) state per group,
    * no per-group value histogram on the exchange. Shares rel_quantiles'
    * oracle — below k the sketch replays quantile_cont bit-for-bit, which
    * is the same exact-below-capacity contract the KMV and SpaceSaving
    * sketches pin.
    */
  def aggQuantilesSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.QuantileSketchAgg
    KvTable.table(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        // k EXPLICIT with headroom over the gate scales: per-status groups
        // hold ~5k values at sf0.01 and ~50k at sf0.1 — 2^18 keeps the
        // exactness precondition satisfied through ~5x the bench scale
        // rather than silently riding the default's edge.
        QuantileSketchAgg.quantileSketch(
          floor(col("o_totalprice")).cast("long"), Seq(0.5, 0.9), k = 262144).as("q"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        floor(element_at(col("q"), 1) * 100).cast("long").as("p50_x100"),
        floor(element_at(col("q"), 2) * 100).cast("long").as("p90_x100"),
        col("n"))
  }

}
