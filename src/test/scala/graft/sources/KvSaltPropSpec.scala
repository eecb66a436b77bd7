package graft.sources

import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop}

/** Property law for [[KvSalt.expand]] — the EXACTNESS claim everything
  * salt-related rests on: for every logical key `k` and every supported
  * rowKey filter `f`,
  *
  *   stored(k) satisfies expand(f)  ⟺  k satisfies f.
  *
  * "⇐" (no loss) is what keeps results complete; "⇒" (no excess) is what
  * lets the per-reader LIMIT cap count parquet-filtered rows and the
  * unsatisfiable-conjunction pruner drop files. Checked over arbitrary
  * keys (unicode, empty, keys that themselves look like salt prefixes)
  * and randomly nested And/Or filter trees.
  */
class KvSaltPropSpec extends graft.SparkSpec {

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(32)),
    Gen.listOf(Gen.choose(32.toChar, 0x2FFF.toChar)).map(_.mkString.take(32)),
    Gen.const(""),
    // adversarial: logical keys shaped like stored prefixes
    Gen.choose(0, 999).map(i => f"$i%03d|suffix"))

  private def leafGen(values: Gen[String]): Gen[Filter] = Gen.oneOf(
    values.map(EqualTo("rowKey", _)),
    Gen.listOfN(3, values).map(vs => In("rowKey", vs.toArray[Any])),
    values.map(GreaterThan("rowKey", _)),
    values.map(GreaterThanOrEqual("rowKey", _)),
    values.map(LessThan("rowKey", _)),
    values.map(LessThanOrEqual("rowKey", _)),
    values.map(v => StringStartsWith("rowKey", v.take(4))))

  private def filterGen(values: Gen[String], depth: Int): Gen[Filter] =
    if (depth <= 0) leafGen(values)
    else Gen.oneOf(
      leafGen(values),
      for { l <- filterGen(values, depth - 1); r <- filterGen(values, depth - 1) }
        yield And(l, r),
      for { l <- filterGen(values, depth - 1); r <- filterGen(values, depth - 1) }
        yield Or(l, r))

  /** Reference evaluation of the supported rowKey filter algebra. */
  private def sat(f: Filter, k: String): Boolean = f match {
    case EqualTo("rowKey", v: String) => k == v
    case In("rowKey", vs) => vs.exists(_ == k)
    case GreaterThan("rowKey", v: String) => k > v
    case GreaterThanOrEqual("rowKey", v: String) => k >= v
    case LessThan("rowKey", v: String) => k < v
    case LessThanOrEqual("rowKey", v: String) => k <= v
    case StringStartsWith("rowKey", p) => k.startsWith(p)
    case And(l, r) => sat(l, k) && sat(r, k)
    case Or(l, r) => sat(l, k) || sat(r, k)
    case other => fail(s"unexpected filter $other")
  }

  test("law: stored(k) satisfies expand(f) iff k satisfies f, for every bucket count") {
    // filter values drawn from the SAME pool as keys so equality/range
    // boundaries actually get hit, not just missed
    val pool = Gen.listOfN(12, keyGen)
    val prop = Prop.forAll(pool, Gen.choose(1, 256)) { (vals, n) =>
      val values = Gen.oneOf(vals ++ Seq("", "m"))
      val check = Prop.forAll(filterGen(values, 2), Gen.oneOf(vals)) { (f, k) =>
        val expanded = KvSalt.expand(f, n)
        sat(expanded, KvSalt.stored(k, n)) == sat(f, k)
      }
      check
    }
    checkProp("expandExact", prop, seed = 1337L, samples = 60)
  }

  test("law: expansion of a rowKey filter never changes non-rowKey predicates") {
    val f = And(EqualTo("family", "f"), GreaterThan("ts", java.lang.Long.valueOf(5L)))
    KvSalt.expand(f, 16) shouldBe f
  }
}
