package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column (SURVEY
  * §7.6): brute-force cosine top-k as the correctness baseline, and a
  * multi-table random-hyperplane LSH variant as the 100-TB path.
  *
  * Scale design:
  *  - Brute force is `broadcast(queries) × corpus` — a broadcast nested loop
  *    (no corpus shuffle, one pass, codegen'd DotProduct inner loop), then a
  *    per-query top-k window. Right answer for small query sets; O(|Q|·|C|)
  *    compute is the documented cost.
  *  - LSH: L=5 hash tables × 6 sign-bits (defaults; both per-call tunable —
  *    see the recall/cost sweep in BASELINE.md) from fixed pseudo-random
  *    hyperplanes. The corpus is indexed once per table (equi-join key
  *    (table, bucket)); queries probe their own bucket plus all hamming-1
  *    neighbors in each table (multi-probe), candidates are deduped, then
  *    exactly rescored. Compute drops to O(|Q| · candidates); at real corpus
  *    sizes the bit-width grows with log(corpus) to keep buckets small while
  *    tables × probes control recall.
  *
  * Determinism contract: hyperplanes are exact rationals `k/97 - 1/2`
  * computed identically by Spark and the oracle; ranking orders by the
  * integer-scaled cosine with neighbor id as tie-break.
  */
object Similarity {

  val NumBits = 6
  val NumTables = 5
  val Dim = 64

  /** Auto-scaled sign-bit width: expected bucket occupancy is
    * n / 2^bits, so holding candidate-set size flat as the corpus grows
    * means bits ~ log2(n / TargetBucket). Clamped below by [[NumBits]]
    * (the swept small-corpus default — unchanged behavior through sf0.1)
    * and above by [[MaxAutoBits]] (beyond ~16 bits the hamming-1
    * multiprobe no longer recovers recall). Per-call `bits` override
    * everywhere.
    */
  val TargetBucket = 1000L
  val MaxAutoBits = 16

  def autoBits(corpusCount: Long): Int = {
    val target = math.max(1L, corpusCount / TargetBucket)
    // ceil(log2(target))
    val b = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, target - 1))
    math.min(MaxAutoBits, math.max(NumBits, b))
  }

  /** Hyperplane component r(t, i, d): deterministic, identical in SQL. */
  def plane(t: Int, i: Int, d: Int): Double =
    (((t * 577 + i) * 131 + d * 31 + 7) % 97).toDouble / 97.0 - 0.5

  /** Sign-bit bucket of a (double-array) vector of dimension `dim` in
    * table t. All NumBits hyperplane dots run in ONE [[DotMatrix]] pass —
    * unrolled per-bit DotProducts push the generated method past the JVM's
    * huge-method JIT limit and the stage silently runs interpreted (see
    * DotMatrix). The bit fold over the 6-element dot array is a cheap HOF.
    */
  def bucketOf(v: Column, t: Int, dim: Int = Dim, bits: Int = NumBits): Column = {
    val planes = typedlit((0 until bits).map(i =>
      (0 until dim).map(d => plane(t, i, d))))
    val weights = typedlit((0 until bits).map(i => 1L << i))
    aggregate(
      zip_with(VectorOps.dotAll(v, planes), weights,
        (d, w) => when(d > 0, w).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** vec_id, v (double array), nrm. */
  def index(embeddings: DataFrame): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      VectorOps.toDoubleArray(col("embedding")).as("v"))
    e.select(col("vec_id"), col("v"), VectorOps.norm(col("v")).as("nrm"))
  }

  /** One row per (vector, table): the LSH index relation. */
  def bucketedIndex(idx: DataFrame, dim: Int = Dim,
      tables: Int = NumTables, bits: Int = NumBits): DataFrame =
    idx.select(col("vec_id"), col("v"), col("nrm"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), bucketOf(col("v"), t, dim, bits).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q")).orderBy(col("cos_x1000").desc, col("nb"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("nb"), col("rank").cast("long").as("rank"), col("cos_x1000"))
  }

  private def cosX1000: Column =
    floor(VectorOps.dot(col("qr.v"), col("cand.v")) * 1000 /
      (col("qr.nrm") * col("cand.nrm"))).cast("long")

  /** Exact top-k: every query scored against the whole corpus. */
  def bruteTopK(embeddings: DataFrame, isQuery: Column => Column, k: Int = 5): DataFrame = {
    val idx = index(embeddings)
    val qs = broadcast(idx.filter(isQuery(col("vec_id")))).as("qr")
    val scored = qs.join(idx.as("cand"), col("cand.vec_id") =!= col("qr.vec_id"))
      .select(col("qr.vec_id").as("q"), col("cand.vec_id").as("nb"),
        cosX1000.as("cos_x1000"))
    topK(scored, k)
  }

  // ------------------------------------------------------ int8 quantization

  /** vec_id + the L2-normalized vector scaled-int8-quantized and PACKED to
    * one byte per component (`round(127 · v_i / ||v||)`): 64 B/vector
    * instead of 512 B of doubles. See [[graft.functions.Int8Ops]] for the
    * 100-TB memory argument.
    */
  def quantIndex(embeddings: DataFrame): DataFrame =
    index(embeddings).select(col("vec_id"),
      graft.functions.Int8Ops.quantize(col("v"), col("nrm")).as("qv"))

  /** Memory-bound ANN scan: rank by the INTEGER dot of packed int8 vectors
    * (≈ 127²·cosine). Same broadcast-queries × corpus shape as [[bruteTopK]]
    * but the corpus scan touches 1/8th the bytes and the inner loop is an
    * integer multiply-add — at 100 TB this is the difference between a
    * memory-bandwidth-bound scan that fits the quantized corpus in executor
    * page cache and one that thrashes. Integer scores are also exactly
    * reproducible in the oracle (no FP summation-order concerns).
    */
  def quantTopK(embeddings: DataFrame, isQuery: Column => Column, k: Int = 5): DataFrame = {
    val qi = quantIndex(embeddings)
    val qs = broadcast(qi.filter(isQuery(col("vec_id")))).as("qr")
    val scored = qs.join(qi.as("cand"), col("cand.vec_id") =!= col("qr.vec_id"))
      .select(col("qr.vec_id").as("q"), col("cand.vec_id").as("nb"),
        graft.functions.Int8Ops.dot(col("qr.qv"), col("cand.qv")).as("dot_q"))
    val w = Window.partitionBy(col("q")).orderBy(col("dot_q").desc, col("nb"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("nb"), col("rank").cast("long").as("rank"), col("dot_q"))
  }

  /** The production two-stage shape: a WIDE quantized first pass (top
    * `candidates` by int8 dot — the memory-bound scan touching 1/8th the
    * bytes) feeding a NARROW exact re-rank (float cosine on `candidates`
    * rows per query instead of the whole corpus). Exact-top-k recall is
    * bounded only by quantization error at the candidate cut, which the
    * wide margin (candidates >> k) absorbs; both stages are deterministic,
    * so the result is oracle-replayable end to end.
    */
  def quantRerankTopK(embeddings: DataFrame, isQuery: Column => Column,
      k: Int = 5, candidates: Int = 50): DataFrame = {
    val cand = quantTopK(embeddings, isQuery, candidates)
      .select(col("q"), col("nb"))
    val idx = index(embeddings)
    // candidate list and query vectors are |Q|-sized — broadcast both; the
    // corpus is only streamed once more to pick up candidate vectors by id
    val scored = broadcast(cand)
      .join(broadcast(idx.filter(isQuery(col("vec_id")))).as("qr"),
        col("q") === col("qr.vec_id"))
      .join(idx.as("cand"), col("nb") === col("cand.vec_id"))
      .select(col("q"), col("nb"), cosX1000.as("cos_x1000"))
    topK(scored, k)
  }

  // ------------------------------------------------------------- IVF

  val NumCells = 32
  /** Default probe count — the knee of the recall/cost curve in the
    * BASELINE.md sweep (recall@5 0.87 at sf0.1 / 0.92 at 1M vectors, vs
    * 0.76/0.84 at 12 and a 75%-of-corpus scan for ~0.98 at 24). Per-call
    * overridable on [[ivfTopK]].
    */
  val NProbe = 16

  /** (score, -centroid) structs per cell: array_max / descending sort then
    * give the arg-max with the SMALLEST centroid id on score ties, mirroring
    * the oracle's ORDER BY score DESC, c_id ASC. All centroid dots run in
    * one DotMatrix pass (constant generated-code size — 32 unrolled
    * DotProducts blow the JVM's huge-method JIT limit and fall to the
    * interpreter); the scale/struct fold over the 32-element result is a
    * cheap HOF.
    */
  private def cellScores(v: Column, nrm: Column): Column = {
    val cents: Array[(Long, Array[Double], Double)] =
      IvfCentroids.Cents.zipWithIndex.map { case (cv, i) =>
        (i.toLong, cv, IvfCentroids.normOf(cv))
      }
    require(cents.length == NumCells, "IvfCentroids artifact out of sync with NumCells")
    val centMatrix = typedlit(cents.map(_._2.toSeq).toSeq)
    val centNegIds = typedlit(cents.map(c => -c._1).toSeq)
    val centNorms = typedlit(cents.map(_._3).toSeq)
    zip_with(
      zip_with(VectorOps.dotAll(v, centMatrix), centNorms,
        (d, cn) => floor(d * 1000000 / (nrm * cn)).cast("long")),
      centNegIds,
      (s, negid) => struct(s.as("s"), negid.as("negid")))
  }

  /** The corpus with its coarse-cell assignment — one codegen'd projection,
    * no join, no shuffle.
    */
  def assignCells(idx: DataFrame): DataFrame =
    idx.withColumn("cell",
      -array_max(cellScores(col("v"), col("nrm"))).getField("negid"))

  /** A query set with one row per (query, probe cell): the NProbe
    * highest-scoring cells per query vector.
    */
  private def probeRows(assigned: DataFrame, isQuery: Column => Column,
      nProbe: Int = NProbe): DataFrame =
    assigned.filter(isQuery(col("vec_id")))
      .withColumn("probe",
        explode(slice(reverse(array_sort(cellScores(col("v"), col("nrm")))), 1, nProbe)))
      .select(col("vec_id"), col("v"), col("nrm"), (-col("probe.negid")).as("cell"))

  /** IVF (inverted-file) ANN: the corpus is coarse-partitioned by nearest
    * centroid; a query probes only its `NProbe` nearest cells and rescores
    * those short-lists exactly. Compute per query drops from O(|corpus|) to
    * O(|corpus| · NProbe / NumCells) — the standard large-corpus trade
    * (recall < 1 when a true neighbor lives in an unprobed cell).
    *
    * Centroids are TRAINED (deterministic driver-side spherical k-means,
    * [[IvfCentroids]]) and ship as a literal model artifact — NumCells × Dim
    * doubles inlined into the plan, exactly how a production IVF index
    * carries its coarse quantizer. Assignment is a single codegen'd
    * projection over the corpus — no join, no shuffle. The persisted form
    * ([[persistIvfIndex]] / [[ivfTopKIndexed]]) makes the cell id a
    * partition column, so a probe prunes whole files.
    */
  def ivfTopK(embeddings: DataFrame, isQuery: Column => Column, k: Int = 5,
      nProbe: Int = NProbe): DataFrame = {
    val assigned = assignCells(index(embeddings))
    val qs = broadcast(probeRows(assigned, isQuery, nProbe))
    // Each corpus vector lives in exactly one cell and probe cells are
    // distinct, so candidates are already unique — no dedup pass needed.
    val scored = qs.as("qr").join(assigned.as("cand"),
        col("qr.cell") === col("cand.cell") && col("cand.vec_id") =!= col("qr.vec_id"))
      .select(col("qr.vec_id").as("q"), col("cand.vec_id").as("nb"),
        cosX1000.as("cos_x1000"))
    topK(scored, k)
  }

  /** Persist the corpus as an on-disk IVF index: parquet PARTITIONED BY the
    * coarse cell — the physical layout where "probe NProbe of NumCells
    * cells" becomes file-level pruning (a probe reads NProbe directories,
    * the other NumCells - NProbe are never listed into the scan).
    */
  def persistIvfIndex(embeddings: DataFrame, path: String): Unit =
    assignCells(index(embeddings))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Mean best-centroid cosine of an already-assigned relation (columns
    * v, nrm): the quantizer-fit statistic. A corpus the coarse quantizer
    * represents well scores high; a drifted distribution scores low.
    */
  def quantizerFit(assigned: DataFrame): Double =
    assigned
      .select((array_max(cellScores(col("v"), col("nrm"))).getField("s") / 1e6).as("s"))
      .agg(avg(col("s"))).head().getDouble(0)

  /** INCREMENTAL index maintenance: extend a [[persistIvfIndex]] layout
    * with a new batch WITHOUT rebuilding. The batch is assigned with the
    * same frozen coarse quantizer (the [[IvfCentroids]] literal artifact)
    * and appended file-wise into its cell directories — existing files are
    * never touched, so the append costs O(|batch|) regardless of index
    * size. Because cell assignment is a pure function of the vector under
    * a frozen quantizer, the appended layout is relation-equivalent to a
    * full rebuild over (existing ∪ batch) — pinned by the
    * ann_topk_ivf_incremental oracle and a spec.
    *
    * Drift gate: appending is only sound while the frozen quantizer still
    * represents the data. The batch's [[quantizerFit]] is compared to the
    * existing corpus's; a drop beyond `maxFitDrop` means the distribution
    * moved (new domain, new modality) and blind appends would pile the
    * batch into ill-fitting cells — the method REFUSES and the caller must
    * retrain ([[persistIvfIndex]] over the union with fresh centroids).
    * Returns (existingFit, batchFit) for observability.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, maxFitDrop: Double = 0.10): (Double, Double) = {
    val existingFit = quantizerFit(spark.read.parquet(path))
    val assigned = assignCells(index(batch)).localCheckpoint()
    val batchFit = quantizerFit(assigned)
    require(batchFit >= existingFit - maxFitDrop,
      f"centroid drift: batch quantizer fit $batchFit%.4f is more than " +
        f"$maxFitDrop%.2f below the corpus fit $existingFit%.4f — retrain " +
        "the coarse quantizer instead of appending")
    assigned.write.mode("append").partitionBy("cell").parquet(path)
    (existingFit, batchFit)
  }

  /** ANN top-k over a [[persistIvfIndex]] layout with STATIC partition
    * pruning: the query set's probe cells are collected (bounded:
    * ≤ |queries| × NProbe ints — the queries already broadcast) and pushed
    * as a literal `cell IN (...)` partition filter, so the candidate scan
    * touches only the probed directories. Same result as [[ivfTopK]].
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      isQuery: Column => Column, k: Int = 5, nProbe: Int = NProbe): DataFrame = {
    import spark.implicits._
    val corpus = spark.read.parquet(path)
    // The probe relation is tiny (≤ |queries| × nProbe rows) and has TWO
    // consumers (broadcast side, partition-filter cell list) — collect it
    // ONCE and rebuild locally, instead of running the query-side index
    // scan + centroid scoring twice.
    // The dual use (broadcast + literal partition filter) needs the probe
    // set on the driver — sized for INSPECTION query batches. A large
    // online batch must be refused BEFORE it materializes on the driver:
    // take(bound+1) collects at most bound+1 rows, so the guard itself
    // can never OOM what it guards against.
    val ProbeBound = 1000000
    val probes = probeRows(corpus, isQuery, nProbe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell").cast("long"))
      .as[(Long, Seq[Double], Double, Long)].take(ProbeBound + 1)
    require(probes.length <= ProbeBound,
      s"ivfTopKIndexed: more than $ProbeBound probe rows — for bulk query " +
        "batches use ivfTopK, which keeps the probe relation distributed")
    val probeCells = probes.map(_._4).distinct.sorted
    val qs = broadcast(
      probes.toSeq.toDF("vec_id", "v", "nrm", "cell"))
    val pruned = corpus.filter(col("cell").isin(probeCells: _*))
    val scored = qs.as("qr").join(pruned.as("cand"),
        col("qr.cell") === col("cand.cell") && col("cand.vec_id") =!= col("qr.vec_id"))
      .select(col("qr.vec_id").as("q"), col("cand.vec_id").as("nb"),
        cosX1000.as("cos_x1000"))
    topK(scored, k)
  }

  /** ANN top-k: per table, queries probe their bucket + all hamming-1
    * buckets; candidates deduped across tables, then exactly rescored.
    *
    * `bits <= 0` (the default) derives the width from the corpus count via
    * [[autoBits]] — one cheap count() buys bucket occupancy that stays
    * ~[[TargetBucket]] as the corpus scales, instead of buckets (and the
    * candidate join) growing linearly past the fixed-width design point.
    */
  def lshTopK(embeddings: DataFrame, isQuery: Column => Column, k: Int = 5,
      dim: Int = Dim, tables: Int = NumTables, bits: Int = -1): DataFrame = {
    val b = if (bits > 0) bits else autoBits(embeddings.count())
    val idx = index(embeddings)
    val corpus = bucketedIndex(idx, dim, tables, b).as("cand")
    val flips = array((lit(0L) +: (0 until b).map(i => lit(1L << i))): _*)
    val qs = broadcast(
      bucketedIndex(idx.filter(isQuery(col("vec_id"))), dim, tables, b)
        .select(col("vec_id"), col("t"), col("bucket"), explode(flips).as("flip"))
        .select(col("vec_id"), col("t"),
          col("bucket").bitwiseXOR(col("flip")).as("probe")))
    // Candidate pairs can repeat across tables/probes -> dedup BEFORE the
    // expensive rescoring join (ships only ids through the shuffle).
    val cand = qs.as("qp").join(corpus,
        col("qp.t") === col("cand.t") && col("qp.probe") === col("cand.bucket") &&
          col("cand.vec_id") =!= col("qp.vec_id"))
      .select(col("qp.vec_id").as("q"), col("cand.vec_id").as("nb"))
      .distinct()
    val scored = cand
      .join(idx.select(col("vec_id").as("q"), col("v").as("qv"), col("nrm").as("qn")), "q")
      .join(idx.select(col("vec_id").as("nb"), col("v").as("cv"), col("nrm").as("cn")), "nb")
      .select(col("q"), col("nb"),
        floor(VectorOps.dot(col("qv"), col("cv")) * 1000 /
          (col("qn") * col("cn"))).cast("long").as("cos_x1000"))
    topK(scored, k)
  }
}
