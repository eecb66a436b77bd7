package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared per-JVM SparkSession for all specs (fork := true gives the test run
  * its own JVM; one session amortizes startup across suites).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      // Storage-partitioned joins over the graft-kv connector's reported
      // KeyGroupedPartitioning (KvRegionLayout): the main opt-in plus
      // partition-value padding so pruned/missing regions on one side
      // zip against empties instead of forcing a shuffle.
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      // The connector clusters by REGION-OF-rowKey; joins on
      // (rowKey, qualifier) are still co-located by it (equal pairs are a
      // fortiori equal on rowKey), but the default co-partition check
      // demands partition keys == join keys exactly — relax it.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Smallest scale factor — plenty for unit-level assertions. */
  val sfDir = "/root/testdata/sf0.001"

  def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Seeded ScalaCheck runner for property-law tests (each sample runs
    * Spark jobs, so sample counts stay small; the fixed seed reproduces).
    */
  def checkProp(name: String, p: org.scalacheck.Prop, seed: Long, samples: Int): Unit = {
    import org.scalacheck.{Test => SCTest}
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples)
        .withInitialSeed(org.scalacheck.rng.Seed(seed)), p)
    withClue(s"$name: ${res.status}") { assert(res.passed) }
  }
}
