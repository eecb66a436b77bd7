package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.ext.TextAnalysis
import graft.kv.{KvGenerator, KvTable, RangeLayout}
import graft.ops.{KvPivot, TypedProject}
import graft.schema.SchemaFile
import graft.streaming.StreamingPivot

/** Deduplication queries (SURVEY §7.6).
  *
  * One of the domain slices of the [[Queries]] catalog (r18 split —
  * the registry and the DuckDB oracle maps stay in Queries.scala; the
  * self-type gives every slice the shared fixtures without widening
  * their visibility beyond the package).
  */
private[graft] trait QueriesDedup { self: Queries.type =>
  // ------------------------------------------------- deduplication (§7.6)

  import graft.ext.Dedup

  private[graft] def embeds(spark: SparkSession, sfDir: String): DataFrame =
    KvTable.table(spark, sfDir, "embeddings")

  /** The embeddings corpus, scan-balanced (r21, opt guide §2.5 — see
    * [[docsBalanced]] for the decision rule). Used ONLY by the embedding
    * LSH pair generator, whose 16-band signature fan-out is the one
    * embeds consumer heavy enough to amortize the exchange; the ann_topk_*
    * family measured 2-3× SLOWER under a blanket balance (their per-query
    * work after the tiny query-side filter is already exchange-bound —
    * full-run A/B, BENCH_FULL_r21_mid vs _before).
    */
  private[graft] def embedsBalanced(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.ScanBalance.ensureMinParallelismFor(
      KvTable.table(spark, sfDir, "embeddings"), col("vec_id"),
      s"$sfDir/embeddings.parquet")

  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(docs(spark, sfDir))

  private[graft] lazy val dedupExactSql: String =
    """SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_dup
      |FROM documents""".stripMargin

  /** Chunk-level exact dedup + reconstruction ([[Dedup.paragraphDedup]]). */
  def dedupParagraph(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.paragraphDedup(docs(spark, sfDir))

  private[graft] lazy val dedupParagraphSql: String =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |  FROM documents WHERE length(trim(text)) > 0),
      |c AS (
      |  SELECT doc_id, i AS idx,
      |    array_to_string(list_slice(ws, i*10+1, i*10+10), ' ') AS chunk
      |  FROM w, UNNEST(generate_series(0, (len(ws)-1)//10)) AS t(i)),
      |win AS (
      |  SELECT chunk, doc_id, idx FROM (
      |    SELECT chunk, doc_id, idx,
      |      row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
      |    FROM c) WHERE rn = 1)
      |SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS clean_text
      |FROM win GROUP BY doc_id""".stripMargin

  def dedupJaccardPairs(spark: SparkSession, sfDir: String): DataFrame =
    // balanced: the shingle pipeline feeds two consumers, so the serialized
    // tokenize+shingle ran twice on one core (measured -0.8 s, r21)
    Dedup.jaccardPairs(docsBalanced(spark, sfDir))

  /** Shared oracle CTEs: tokens → distinct 3-shingles (1-based list ops). */
  private[graft] lazy val shingleCtes: String =
    """toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |shd AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
      |          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      |        FROM toks WHERE len(t) >= 3)""".stripMargin

  /** PolyHash fold, oracle dialect (must mirror PolyHashExpr exactly);
    * `mult = 131` replays the second independent hash inside SimHash64.
    */
  private[graft] def polyHashSql(arg: String, mult: Int = 31): String =
    s"list_reduce(list_transform(string_split($arg, ''), c -> unicode(c)::BIGINT), " +
      s"(x, y) -> (x * $mult + y) % 2147483647)"

  private[graft] lazy val dedupJaccardPairsSql: String =
    s"""WITH $shingleCtes,
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |ok AS (SELECT s FROM shd GROUP BY s
       |       HAVING count(*) > 1 AND count(*) <= ${Dedup.MaxPosting}),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |          FROM shd x JOIN shd y USING (s) JOIN ok USING (s)
       |          WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT a, b, ((i * 1000) // (sa.n + sb.n - i))::BIGINT AS jac_x1000
       |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
       |WHERE (i * 1000) // (sa.n + sb.n - i) >= 800""".stripMargin

  /** Jaccard pairs behind the document-frequency stopword filter — the
    * designed hot-shingle control at scale: shingles shared by more than
    * `JaccardMaxDf` docs (boilerplate) are removed from the similarity
    * space BEFORE pair generation, so a viral shingle never reaches the
    * posting fan-out at all ([[Dedup.MaxPosting]] stays as the backstop).
    * Scores are true Jaccard over the filtered shingle universe — at sf0.01
    * this shifts 10 of the 25 near-dup pair scores vs the unfiltered query.
    */
  lazy val JaccardMaxDf = 5

  def dedupJaccardDf(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(docsBalanced(spark, sfDir), maxDf = JaccardMaxDf)

  private[graft] lazy val dedupJaccardDfSql: String =
    s"""WITH $shingleCtes,
       |kept AS (SELECT shd.* FROM shd JOIN (
       |           SELECT s FROM shd GROUP BY s HAVING count(*) <= $JaccardMaxDf) USING (s)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
       |ok AS (SELECT s FROM kept GROUP BY s
       |       HAVING count(*) > 1 AND count(*) <= ${Dedup.MaxPosting}),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |          FROM kept x JOIN kept y USING (s) JOIN ok USING (s)
       |          WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT a, b, ((i * 1000) // (sa.n + sb.n - i))::BIGINT AS jac_x1000
       |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
       |WHERE (i * 1000) // (sa.n + sb.n - i) >= 800""".stripMargin

  /** Duplicated 8-token spans ([[Dedup.substringDupSpans]]): window-level
    * substring dedup — strings are hashed to 128 bits before any exchange.
    */
  def dedupSubstring(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.substringDupSpans(docs(spark, sfDir))

  private[graft] lazy val dedupSubstringSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |              FROM documents),
      |p AS (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos
      |      FROM toks WHERE len(t) >= 8),
      |w AS (SELECT doc_id, pos, concat_ws(' ', t[pos], t[pos+1], t[pos+2],
      |        t[pos+3], t[pos+4], t[pos+5], t[pos+6], t[pos+7]) AS s
      |      FROM p),
      |d AS (SELECT s FROM w GROUP BY s HAVING count(*) > 1)
      |SELECT doc_id, count(*)::BIGINT AS dup_windows,
      |  min(pos)::BIGINT AS first_pos
      |FROM w JOIN d USING (s)
      |GROUP BY 1""".stripMargin

  def dedupMinhashSig(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashSignatures(docs(spark, sfDir))

  /** hs CTE: per-doc list of shingle polyhashes. */
  private[graft] lazy val minhashHsCte: String =
    s"""hs AS (SELECT doc_id, list(${polyHashSql("s")}) AS hs FROM shd GROUP BY doc_id)"""

  private[graft] def minhashTerm(j: Int): String =
    s"list_min(list_transform(hs, h -> (h * ${Dedup.hashA(j)} + ${Dedup.hashB(j)}) % ${Dedup.P}))"

  private[graft] lazy val dedupMinhashSigSql: String = {
    val cols = (0 until Dedup.NumHashes).map(j => s"${minhashTerm(j)} AS s$j").mkString(",\n  ")
    s"""WITH $shingleCtes,
       |$minhashHsCte
       |SELECT doc_id,
       |  $cols
       |FROM hs""".stripMargin
  }

  def dedupMinhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    // balanced: 32 MinHash folds over every shingle set before the first
    // exchange (measured -0.3 s, r21)
    Dedup.minhashLshPairs(docsBalanced(spark, sfDir))

  /** CTE chain ending in `mp(a, b, match16)`: the verified MinHash-LSH
    * near-dup pairs (shared by the pairs query and the clustering oracle).
    */
  private[graft] lazy val minhashPairCtes: String = {
    val sigList = (0 until Dedup.NumHashes).map(minhashTerm).mkString("[", ", ", "]")
    s"""$shingleCtes,
       |$minhashHsCte,
       |sig AS (SELECT doc_id, $sigList AS sig FROM hs),
       |bands AS (SELECT doc_id, sig, b AS band,
       |            concat_ws(',', sig[b*4+1], sig[b*4+2], sig[b*4+3], sig[b*4+4]) AS key
       |          FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y
       |         ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |mp AS (SELECT * FROM (
       |  SELECT a, b, len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))::BIGINT AS match16
       |  FROM cand JOIN sig sa ON sa.doc_id = a JOIN sig sb ON sb.doc_id = b)
       |  WHERE match16 >= 12)""".stripMargin
  }

  private[graft] lazy val dedupMinhashPairsSql: String =
    s"""WITH $minhashPairCtes
       |SELECT a, b, match16 FROM mp""".stripMargin

  /** INCREMENTAL ingest admission — the dedup gate of a continuously-fed
    * corpus: 4/5 of the documents table plays the EXISTING store, every
    * `doc_id % 5 == 0` doc the incoming batch, and a batch doc is rejected
    * when MinHash-LSH confirms a near-dup relationship with any existing
    * doc. Reuses the sub-quadratic pair machinery of dedup_minhash_pairs
    * unchanged; admission itself is one tiny distinct + left join over the
    * pair relation, so the incremental gate costs what the pair scan costs.
    */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val isBatch = (c: Column) => c % 5 === 0
    val cross = Dedup.minhashLshPairs(d)
      .filter(isBatch(col("a")) =!= isBatch(col("b")))
      .select(when(isBatch(col("a")), col("a")).otherwise(col("b")).as("doc_id"))
      .distinct()
      .withColumn("_hit", lit(true))
    d.filter(isBatch(col("doc_id"))).select(col("doc_id"))
      .join(cross, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("_hit").isNotNull, lit("near_dup_of_corpus"))
          .otherwise(lit("admitted")).as("status"))
  }

  private[graft] lazy val dedupIncrementalSql: String =
    s"""WITH $minhashPairCtes,
       |hits AS (SELECT DISTINCT CASE WHEN a % 5 = 0 THEN a ELSE b END AS doc_id
       |         FROM mp WHERE (a % 5 = 0) <> (b % 5 = 0))
       |SELECT d.doc_id,
       |  CASE WHEN h.doc_id IS NOT NULL THEN 'near_dup_of_corpus'
       |       ELSE 'admitted' END AS status
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % 5 = 0""".stripMargin

  /** Near-dup cluster assignment: connected components over the MinHash-LSH
    * pair graph ([[Dedup.clusters]] label propagation); the oracle walks the
    * same graph with a recursive CTE.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    Dedup.clusters(d, Dedup.minhashLshPairs(d))
  }

  private[graft] lazy val dedupClustersSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |e AS (SELECT a AS src, b AS dst FROM mp
       |      UNION ALL SELECT b AS src, a AS dst FROM mp),
       |walk(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node)
       |SELECT node AS doc_id, min(lbl)::BIGINT AS cluster_id
       |FROM walk GROUP BY node""".stripMargin

  /** Canonical-corpus selection: the standard post-dedup pass — group docs
    * by near-dup cluster and keep the HIGHEST-QUALITY member (tie-break:
    * smallest doc_id), reporting cluster size for audit. One extra shuffle
    * over (doc_id, cluster_id, quality) triples on top of the cluster
    * assignment; text never moves. The max_by over a (quality, -doc_id)
    * struct keeps the pick deterministic AND partial-aggregable (no
    * per-cluster sort).
    */
  def pipeCanonicalCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    // balanced: THREE consumers (cluster pairs, quality, join) replay the
    // scan + shingle/stats narrow work (r21 — see docsBalanced)
    val d = docsBalanced(spark, sfDir)
    val cl = Dedup.clusters(d, Dedup.minhashLshPairs(d))
    val q = TextAnalysis.quality(d).select(col("doc_id"), col("quality"))
    cl.join(q, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max_by(struct(col("doc_id"), col("quality")),
          struct(col("quality"), -col("doc_id"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("best.doc_id").as("keep_id"),
        col("best.quality").as("quality"), col("n_members"))
  }

  private[graft] lazy val pipeCanonicalCorpusSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |e AS (SELECT a AS src, b AS dst FROM mp
       |      UNION ALL SELECT b AS src, a AS dst FROM mp),
       |walk(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node),
       |cl AS (SELECT node AS doc_id, min(lbl)::BIGINT AS cluster_id
       |       FROM walk GROUP BY node),
       |q AS (SELECT doc_id, quality FROM ($txtQualitySql) tq),
       |r AS (SELECT cl.cluster_id, cl.doc_id, q.quality,
       |        row_number() OVER (PARTITION BY cl.cluster_id
       |          ORDER BY q.quality DESC, cl.doc_id) AS rk,
       |        count(*) OVER (PARTITION BY cl.cluster_id) AS n
       |      FROM cl JOIN q USING (doc_id))
       |SELECT cluster_id, doc_id AS keep_id, quality,
       |  n::BIGINT AS n_members
       |FROM r WHERE rk = 1""".stripMargin

  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhash(docs(spark, sfDir))

  /** 64-bit SimHash oracle: bits 0..30 from the mult-31 poly hash, bits
    * 31..61 from the mult-131 hash (mirrors graft.functions.SimHash64).
    */
  private[graft] lazy val simhashCtes: String =
    s"""tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS s FROM documents),
       |th AS (SELECT doc_id, ${polyHashSql("s")} AS h1, ${polyHashSql("s", 131)} AS h2 FROM tok),
       |bits AS (SELECT doc_id, b,
       |           CASE WHEN 2 * sum(CASE WHEN b < 31 THEN (h1 >> b) & 1
       |                                  ELSE (h2 >> (b - 31)) & 1 END) > count(*)
       |                THEN 1::BIGINT ELSE 0 END AS bit
       |         FROM th CROSS JOIN (SELECT unnest(range(0, 62)) AS b) GROUP BY doc_id, b),
       |sh AS (SELECT doc_id, sum(bit * (1::BIGINT << b))::BIGINT AS simhash FROM bits GROUP BY doc_id)""".stripMargin

  private[graft] lazy val dedupSimhashSql: String =
    s"""WITH $simhashCtes
       |SELECT doc_id, simhash FROM sh""".stripMargin

  def dedupSimhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, sfDir))

  /** Oracle runs the quadratic scan; the engine runs 4×16-bit LSH banding —
    * identical results for hamming ≤ 3 by pigeonhole.
    */
  private[graft] lazy val dedupSimhashPairsSql: String =
    s"""WITH $simhashCtes
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |  bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
       |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin

  def dedupEmbedPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.embeddingPairs(embeds(spark, sfDir))

  private[graft] lazy val dedupEmbedPairsSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_reduce(list_transform(list_zip(v, v), p -> p[1] * p[2]),
      |             (x, y) -> x + y)) AS nrm FROM e)
      |SELECT * FROM (
      |  SELECT x.vec_id AS a, y.vec_id AS b,
      |    floor(list_reduce(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2]),
      |          (x2, y2) -> x2 + y2) * 1000 / (x.nrm * y.nrm))::BIGINT AS cos_x1000
      |  FROM n x JOIN n y ON x.vec_id < y.vec_id)
      |WHERE cos_x1000 >= 400""".stripMargin

}
