package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.ext.Dedup
import graft.kv.{KvGenerator, KvTable, RangeLayout}
import graft.ops.{KvPivot, TypedProject}
import graft.schema.SchemaFile
import graft.streaming.StreamingPivot

/** Similarity / ANN queries (SURVEY §7.6).
  *
  * One of the domain slices of the [[Queries]] catalog (r18 split —
  * the registry and the DuckDB oracle maps stay in Queries.scala; the
  * self-type gives every slice the shared fixtures without widening
  * their visibility beyond the package).
  */
private[graft] trait QueriesSimilarity { self: Queries.type =>
  // ------------------------------------------- similarity search (§7.6)

  /** Query set: every 50th vector (10 queries at sf0.01). */
  private[graft] lazy val isQuery: Column => Column = v => v % 50 === 0

  def annTopkBrute(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.bruteTopK(embeds(spark, sfDir), isQuery)

  /** Oracle dialect for the sequential-fold dot product of two vec columns. */
  private[graft] def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (x, y) -> x + y)"

  private[graft] lazy val annNormCte: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(${dotSql("v", "v")}) AS nrm FROM e)""".stripMargin

  private[graft] lazy val annTopkBruteSql: String =
    s"""WITH $annNormCte,
       |q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
       |p AS (SELECT q.vec_id AS q, c.vec_id AS nb,
       |        floor(${dotSql("q.v", "c.v")} * 1000 / (q.nrm * c.nrm))::BIGINT AS cos_x1000
       |      FROM q JOIN n c ON c.vec_id <> q.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cos_x1000 DESC, nb) AS rk FROM p)
       |SELECT q, nb, rk::BIGINT AS rank, cos_x1000 FROM r WHERE rk <= 5""".stripMargin

  /** SemDeDup over the embeddings corpus SEEDED with planted near-dups
    * (every 10th vector copied under id+1000000 with one component nudged
    * +0.01 — cosine ≈ 0.9999, done in DOUBLE on both engines so the
    * corpora are bit-identical): [[Dedup.semanticDedup]] must drop exactly
    * the planted copies (no natural pair in the synthetic corpus reaches
    * cosine 0.995; max observed ≈ 0.48) with the original as keeper. The
    * oracle replays the full decision — cell assignment against the same
    * fixed centroids, within-cell pairs only, smallest-id keeper — so a
    * cross-cell comparison, wrong keeper, or missed/phantom drop all
    * hash-mismatch.
    */
  def dedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val base = embeds(spark, sfDir).select(col("vec_id"),
      graft.functions.VectorOps.toDoubleArray(col("embedding")).as("embedding"))
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01d)).otherwise(x)).as("embedding"))
    Dedup.semanticDedup(base.unionAll(copies))
  }

  private[graft] lazy val dedupSemanticSql: String =
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cp AS (SELECT vec_id + 1000000 AS vec_id,
       |         list_concat([v[1] + 0.01], v[2:]) AS v
       |       FROM e0 WHERE vec_id % 10 = 0),
       |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM cp),
       |n AS (SELECT vec_id, v, sqrt(${dotSql("v", "v")}) AS nrm FROM e),
       |c AS (SELECT c_id, cv, sqrt(${dotSql("cv", "cv")}) AS cn
       |      FROM (VALUES $ivfCentroidValues) t(c_id, cv)),
       |sc AS (SELECT n.vec_id, c.c_id,
       |         floor(${dotSql("n.v", "c.cv")} * 1000000 / (n.nrm * c.cn))::BIGINT AS s
       |       FROM n CROSS JOIN c),
       |rk AS (SELECT vec_id, c_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c_id) AS r
       |       FROM sc),
       |asg AS (SELECT vec_id, c_id AS cell FROM rk WHERE r = 1),
       |drops AS (SELECT d.vec_id AS vec_id, min(k.vec_id) AS kept_by
       |  FROM asg d
       |  JOIN asg k ON k.cell = d.cell AND k.vec_id < d.vec_id
       |  JOIN n a ON a.vec_id = d.vec_id
       |  JOIN n b ON b.vec_id = k.vec_id
       |  WHERE floor(${dotSql("a.v", "b.v")} * 1000 / (a.nrm * b.nrm)) >= 995
       |  GROUP BY 1)
       |SELECT a.vec_id, a.cell::BIGINT AS cell, d.kept_by,
       |  d.kept_by IS NOT NULL AS is_dup
       |FROM asg a LEFT JOIN drops d ON d.vec_id = a.vec_id""".stripMargin

  /** Int8-quantized ANN scan ([[Similarity.quantTopK]]): ranking by the
    * integer dot of packed 64-byte vectors. The oracle replays the exact
    * quantization (`round(127·v/‖v‖)` — round-half-away ties agree between
    * engines on identical doubles) and integer dot, so this hash-matches
    * rather than being recall-judged.
    */
  def annTopkQuant(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.quantTopK(embeds(spark, sfDir), isQuery)

  /** Shared stage-1 CTE text: int8 quantization + the all-pairs integer dot
    * for the query set (mirrors [[Similarity.quantIndex]]/`quantTopK`). ONE
    * definition so the plain-quant and rerank oracles can never encode two
    * different quantization formulas.
    */
  private[graft] lazy val annQuantScoreCte: String =
    """qz AS (SELECT vec_id, list_transform(v, x -> round(x * 127 / nrm)::BIGINT) AS qv
      |       FROM n),
      |pq AS (SELECT a.vec_id AS q, c.vec_id AS nb,
      |         list_reduce(list_transform(list_zip(a.qv, c.qv), z -> z[1] * z[2]),
      |                     (x, y) -> x + y)::BIGINT AS dot_q
      |       FROM qz a JOIN qz c ON c.vec_id <> a.vec_id
      |       WHERE a.vec_id % 50 = 0)""".stripMargin

  private[graft] lazy val annTopkQuantSql: String =
    s"""WITH $annNormCte,
       |$annQuantScoreCte,
       |r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY dot_q DESC, nb) AS rk
       |      FROM pq)
       |SELECT q, nb, rk::BIGINT AS rank, dot_q FROM r WHERE rk <= 5""".stripMargin

  /** Two-stage ANN ([[Similarity.quantRerankTopK]]): int8 scan for a wide
    * candidate set, exact float cosine re-rank of just those — the
    * production memory-bandwidth shape. Both stages deterministic → the
    * oracle replays stage 1's integer ranking then stage 2's exact cosine.
    */
  def annTopkQuantRerank(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.quantRerankTopK(embeds(spark, sfDir), isQuery)

  private[graft] lazy val annTopkQuantRerankSql: String =
    s"""WITH $annNormCte,
       |$annQuantScoreCte,
       |cand AS (SELECT q, nb FROM (
       |           SELECT *, row_number() OVER (PARTITION BY q ORDER BY dot_q DESC, nb) AS rk
       |           FROM pq) WHERE rk <= 50),
       |px AS (SELECT cand.q, cand.nb,
       |         floor(${dotSql("a.v", "b.v")} * 1000 / (a.nrm * b.nrm))::BIGINT AS cos_x1000
       |       FROM cand JOIN n a ON a.vec_id = cand.q JOIN n b ON b.vec_id = cand.nb),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cos_x1000 DESC, nb) AS rk
       |      FROM px)
       |SELECT q, nb, rk::BIGINT AS rank, cos_x1000 FROM r WHERE rk <= 5""".stripMargin

  def annTopkLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.lshTopK(embeds(spark, sfDir), isQuery)

  /** The per-table sign-bit bucket, oracle dialect (mirrors
    * Similarity.bucketOf — planes are exact rationals k/97 - 1/2 computed by
    * each engine; `t` is the hash-table index column in scope).
    */
  private[graft] lazy val annBucketExpr: String =
    s"""list_reduce(list_transform(range(0, ${Similarity.NumBits}), i ->
       |  CASE WHEN list_reduce(list_transform(range(0, ${Similarity.Dim}),
       |         d -> v[d+1] * ((((t*577 + i)*131 + d*31 + 7) % 97) / 97.0 - 0.5)),
       |         (x, y) -> x + y) > 0
       |  THEN (1::BIGINT << i) ELSE 0::BIGINT END), (x, y) -> x + y)""".stripMargin

  private[graft] lazy val annTopkLshSql: String =
    s"""WITH $annNormCte,
       |tb AS (SELECT vec_id, v, nrm, t, $annBucketExpr AS bucket
       |       FROM n CROSS JOIN (SELECT unnest(range(0, ${Similarity.NumTables})) AS t)),
       |qp AS (SELECT vec_id, t, xor(bucket, f::BIGINT) AS probe
       |       FROM tb CROSS JOIN (SELECT unnest([${(0L +: (0 until Similarity.NumBits).map(1L << _)).mkString(", ")}]) AS f)
       |       WHERE vec_id % 50 = 0),
       |cand AS (SELECT DISTINCT qp.vec_id AS q, c.vec_id AS nb2
       |         FROM qp JOIN tb c ON c.t = qp.t AND c.bucket = qp.probe
       |                          AND c.vec_id <> qp.vec_id),
       |p AS (SELECT q, nb2,
       |        floor(${dotSql("a.v", "b.v")} * 1000 / (a.nrm * b.nrm))::BIGINT AS cos_x1000
       |      FROM cand JOIN n a ON a.vec_id = q JOIN n b ON b.vec_id = nb2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cos_x1000 DESC, nb2) AS rk FROM p)
       |SELECT q, nb2 AS nb, rk::BIGINT AS rank, cos_x1000 FROM r WHERE rk <= 5""".stripMargin

  def annTopkIvf(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.ivfTopK(embeds(spark, sfDir), isQuery)

  /** The IVF path against its PERSISTED layout: corpus partitioned by cell
    * on disk, probe cells pushed as a static partition filter (PlanSpec
    * asserts the pruning). Same oracle as the in-memory IVF — identical
    * result by construction.
    */
  def annTopkIvfPruned(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.ivfTopKIndexed(spark, ensureIvfIndex(spark, sfDir), isQuery)

  /** The IVF path against the INCREMENTALLY-maintained layout (base persist
    * + drift-gated batch append, [[ensureIvfIncrIndex]]) — the oracle is
    * the FULL-corpus IVF: an append under a frozen quantizer must be
    * indistinguishable from a rebuild, and this query proves it.
    */
  def annTopkIvfIncremental(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.ivfTopKIndexed(spark, ensureIvfIncrIndex(spark, sfDir), isQuery)

  /** IVF oracle: centroid scores via the same floor-scaled cosine; cell
    * assignment = rank-1 centroid, probes = rank ≤ NProbe (score DESC,
    * centroid id ASC — mirroring the (score, -id) struct max in Scala).
    * Centroids are the SAME [[graft.ext.IvfCentroids]] literals the engine
    * inlines (Double.toString round-trips, DuckDB parses correctly-rounded
    * → bit-identical doubles), so no training is replayed oracle-side.
    */
  // lazy: referenced by oracle SQL vals declared BOTH before and after
  // this point in the file (val init order is declaration order)
  private[graft] lazy val ivfCentroidValues: String =
    graft.ext.IvfCentroids.Cents.zipWithIndex.map { case (cv, i) =>
      s"($i, [${cv.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n        ")

  private[graft] lazy val annTopkIvfSql: String =
    s"""WITH $annNormCte,
       |c AS (SELECT c_id, cv, sqrt(${dotSql("cv", "cv")}) AS cn
       |      FROM (VALUES $ivfCentroidValues) t(c_id, cv)),
       |sc AS (SELECT n.vec_id, c.c_id,
       |         floor(${dotSql("n.v", "c.cv")} * 1000000 / (n.nrm * c.cn))::BIGINT AS s
       |       FROM n CROSS JOIN c),
       |rk AS (SELECT vec_id, c_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c_id) AS r
       |       FROM sc),
       |asg AS (SELECT vec_id, c_id AS cell FROM rk WHERE r = 1),
       |probes AS (SELECT vec_id, c_id AS cell FROM rk
       |           WHERE r <= ${Similarity.NProbe} AND vec_id % 50 = 0),
       |cand AS (SELECT p.vec_id AS q, a.vec_id AS nb FROM probes p
       |         JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.vec_id),
       |p AS (SELECT q, nb,
       |        floor(${dotSql("a.v", "b.v")} * 1000 / (a.nrm * b.nrm))::BIGINT AS cos_x1000
       |      FROM cand JOIN n a ON a.vec_id = q JOIN n b ON b.vec_id = nb),
       |r2 AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cos_x1000 DESC, nb) AS rk2
       |       FROM p)
       |SELECT q, nb, rk2::BIGINT AS rank, cos_x1000 FROM r2 WHERE rk2 <= 5""".stripMargin

  /** Sub-quadratic embedding near-dup pairs: LSH bucket-collision candidates
    * + exact rescoring ([[Dedup.embeddingLshPairs]]); the oracle runs the
    * quadratic scan restricted to "collides in ≥1 table" — same set.
    */
  def dedupEmbedLshPairs(spark: SparkSession, sfDir: String): DataFrame =
    // balanced: 16 banded-signature hashes per vector over the whole corpus
    // before the first exchange (measured -0.3 s, r21 — see embedsBalanced)
    Dedup.embeddingLshPairs(embedsBalanced(spark, sfDir))

  private[graft] lazy val dedupEmbedLshPairsSql: String =
    s"""WITH $annNormCte,
       |bk AS (SELECT vec_id, v, nrm,
       |         list_transform(range(0, ${Similarity.NumTables}), t -> $annBucketExpr) AS bks
       |       FROM n),
       |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
       |        floor(${dotSql("x.v", "y.v")} * 1000 / (x.nrm * y.nrm))::BIGINT AS cos_x1000
       |      FROM bk x JOIN bk y ON x.vec_id < y.vec_id
       |      WHERE len(list_filter(range(0, ${Similarity.NumTables}),
       |                            t -> x.bks[t+1] = y.bks[t+1])) > 0)
       |SELECT a, b, cos_x1000 FROM p WHERE cos_x1000 >= 400""".stripMargin

}
