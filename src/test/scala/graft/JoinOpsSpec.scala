package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, RangeJoin}

/** As-of and banded range joins (SURVEY §2.4 extensions). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "user_id", "tsNanos")
    val r = right.toDF("event_id", "user_id", "tsNanos", "value")
    AsofJoin.asofBackward(l, r, Seq("user_id"), "tsNanos", "event_id",
        Seq("event_id", "value"))
      .select($"event_id", $"user_id", $"_asof.event_id".as("m"), $"_asof.value".as("v"))
  }

  test("asof picks the latest right row at-or-before each left row, per key") {
    val got = asof(
      left = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L)),
      right = Seq((1L, 1L, 5L, 1.0), (2L, 1L, 40L, 2.0), (3L, 1L, 60L, 3.0),
        (4L, 2L, 50L, 4.0))) // equal timestamp: inclusive
      .orderBy($"event_id").collect().map(_.toSeq)
    got shouldBe Seq(
      Seq(100L, 1L, 2L, 2.0), // ts 50 → right ts 40
      Seq(101L, 1L, 1L, 1.0), // ts 10 → right ts 5
      Seq(102L, 2L, 4L, 4.0)) // ts 50 → right ts 50 (>= is inclusive)
  }

  test("asof leaves no-match left rows with a null payload (left semantics)") {
    val got = asof(
      left = Seq((100L, 1L, 50L), (101L, 3L, 50L)),
      right = Seq((1L, 1L, 99L, 1.0)))
      .orderBy($"event_id").collect().map(_.toSeq)
    got shouldBe Seq(Seq(100L, 1L, null, null), Seq(101L, 3L, null, null))
  }

  test("asof keeps every left row exactly once (no fan-out on dup right times)") {
    // two right rows at the SAME time for the key: deterministic winner = the
    // larger tie column (later in sort order)
    val got = asof(
      left = Seq((100L, 1L, 50L)),
      right = Seq((1L, 1L, 40L, 1.0), (2L, 1L, 40L, 2.0)))
      .collect().map(_.toSeq)
    got shouldBe Seq(Seq(100L, 1L, 2L, 2.0))
  }

  private def range(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
      window: Long) = {
    val l = left.toDF("l_id", "user_id", "lts")
    val r = right.toDF("r_id", "user_id", "rts")
    RangeJoin.backwardWindowJoin(l, r, Seq("user_id"), "lts", "rts", window)
      .select($"l_id", $"r_id").orderBy($"l_id", $"r_id")
  }

  test("range join matches exactly [lts - window, lts], inclusive both ends") {
    val got = range(
      left = Seq((1L, 7L, 1000L)),
      right = Seq(
        (10L, 7L, 899L),  // just outside
        (11L, 7L, 900L),  // lower bound: inclusive
        (12L, 7L, 950L),  // inside, previous bucket or same — must match
        (13L, 7L, 1000L), // upper bound: inclusive
        (14L, 7L, 1001L), // after left: no
        (15L, 8L, 950L)), // other key: no
      window = 100L).collect().map(_.toSeq)
    got shouldBe Seq(Seq(1L, 11L), Seq(1L, 12L), Seq(1L, 13L))
  }

  test("range join catches right rows in the previous time bucket") {
    // window 100 → buckets [900,999], [1000,1099]; left at 1010 must reach a
    // right row at 920 (previous bucket) and at 1005 (own bucket)
    val got = range(
      left = Seq((1L, 7L, 1010L)),
      right = Seq((10L, 7L, 920L), (11L, 7L, 1005L), (12L, 7L, 909L)),
      window = 100L).collect().map(_.toSeq)
    got shouldBe Seq(Seq(1L, 10L), Seq(1L, 11L))
  }

  test("range join result never duplicates a match (two probes, one hit)") {
    val got = range(
      left = Seq((1L, 7L, 1000L)),
      right = Seq((10L, 7L, 1000L)),
      window = 100L).collect().map(_.toSeq)
    got shouldBe Seq(Seq(1L, 10L))
  }

  // ---------------------------------------------------- property laws

  import org.scalacheck.{Gen, Prop}

  private def check(name: String, p: org.scalacheck.Prop): Unit =
    checkProp(name, p, seed = 7L, samples = 10)

  /** (id, key, ts) rows; ids unique, ts may collide across keys but the
    * generator keeps (key, ts) unique per side — the operator's documented
    * determinism precondition for the right side.
    */
  private def rowsGen(idBase: Long): Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 60L)
    } yield (k, ts))
  } yield rows.distinct.zipWithIndex.map { case ((k, ts), i) => (idBase + i, k, ts) }

  test("law: asof matches the latest right row at-or-before, per key (random inputs)") {
    check("asof", Prop.forAll(rowsGen(100), rowsGen(1000)) { (ls, rsRaw) =>
      val rs = rsRaw.map { case (id, k, ts) => (id, k, ts, id.toDouble) }
      val expected = ls.map { case (lid, k, lts) =>
        val cand = rs.filter(r => r._2 == k && r._3 <= lts)
        lid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(r => (r._3, r._1))._1))
      }.toMap
      val got = asof(ls, rs).collect().map(r =>
        r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
      got == expected
    })
  }

  test("law: salted asof (time-sliced hot keys) equals the unsalted result") {
    check("asofSalted", Prop.forAll(rowsGen(100), rowsGen(1000), Gen.choose(2, 7)) {
      (ls, rsRaw, slices) =>
        val rs = rsRaw.map { case (id, k, ts) => (id, k, ts, id.toDouble) }
        val l = ls.toDF("event_id", "user_id", "tsNanos")
        val r = rs.toDF("event_id", "user_id", "tsNanos", "value")
        def norm(df: org.apache.spark.sql.DataFrame) =
          df.select($"event_id", $"user_id",
              $"_asof.event_id".as("m"), $"_asof.value".as("v"))
            .collect().map(_.toSeq).toSet
        val plain = norm(AsofJoin.asofBackward(l, r,
          Seq("user_id"), "tsNanos", "event_id", Seq("event_id", "value")))
        val salted = norm(AsofJoin.asofBackwardSalted(l, r,
          Seq("user_id"), "tsNanos", "event_id", Seq("event_id", "value"), slices))
        plain == salted
    })
  }

  test("law: salted range join equals the unsalted result") {
    check("rangeSalted", Prop.forAll(rowsGen(100), rowsGen(1000), Gen.choose(1L, 30L)) {
      (ls, rs, w) =>
        val l = ls.toDF("l_id", "user_id", "lts")
        val r = rs.toDF("r_id", "user_id", "rts")
        def pairs(salt: Int) =
          RangeJoin.backwardWindowJoin(l, r, Seq("user_id"), "lts", "rts", w, salt)
            .select($"l_id", $"r_id").collect()
            .map(row => (row.getLong(0), row.getLong(1)))
        pairs(1).toSet == pairs(3).toSet && pairs(3).length == pairs(3).distinct.length
    })
  }

  test("law: range join equals the naive theta-join filter (random inputs)") {
    check("range", Prop.forAll(rowsGen(100), rowsGen(1000), Gen.choose(1L, 30L)) {
      (ls, rs, w) =>
        val expected = (for {
          (lid, lk, lts) <- ls
          (rid, rk, rts) <- rs
          if lk == rk && rts <= lts && rts >= lts - w
        } yield (lid, rid)).toSet
        val got = range(ls, rs, w).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        got == expected
    })
  }

  test("bloom-reduced join equals the plain join; the sketch filter really prunes") {
    import graft.functions.BloomMightContainExpr
    val fact = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "payload")
    val dim = Seq(1L, 2L, 3L).toDF("dk") // 3% of fact keys join
    val plain = fact.join(dim, $"k" === $"dk").agg(count(lit(1)), sum($"payload"))
      .as[(Long, Long)].head()
    val reduced = graft.ops.BloomJoin.reduceJoin(fact, dim, "k", "dk",
        expectedItems = 100L, fpp = 0.01)
      .agg(count(lit(1)), sum($"payload")).as[(Long, Long)].head()
    reduced shouldBe plain
    // the predicate alone prunes (almost) all non-members: at 1% fpp over
    // 97 non-member keys, expect << 97 leaks — bound loosely at 20
    val bf = dim.stat.bloomFilter("dk", 100L, 0.01)
    val kept = fact.filter(BloomMightContainExpr.mightContain(bf, $"k"))
      .select($"k").distinct().count()
    kept should be >= 3L
    kept should be <= 23L
    // members are NEVER dropped (bloom has no false negatives)
    Seq(1L, 2L, 3L).foreach(k => bf.mightContainLong(k) shouldBe true)
  }
}
