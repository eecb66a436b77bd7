package graft.sources

import org.scalacheck.{Gen, Prop}

/** Property laws for [[KvBloom]] — the invariants the planner's soundness
  * rests on, checked over arbitrary (including unicode and empty) keys:
  * a pruned segment must NEVER actually contain the key, so false
  * negatives are the one unforgivable failure; everything else (fpp,
  * refusal, corrupt tokens) only costs performance.
  */
class KvBloomPropSpec extends graft.SparkSpec {

  private val keyGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(64)),
    Gen.listOf(Gen.choose(32.toChar, 0x2FFF.toChar)).map(_.mkString.take(64)),
    Gen.const(""))

  test("law: no member of the built set is ever reported absent (no false negatives)") {
    checkProp("noFalseNeg", Prop.forAll(Gen.listOfN(200, keyGen)) { keys =>
      val b = new KvBloom.Builder
      keys.foreach(b.add)
      b.buildToken() match {
        case None => keys.isEmpty // only an empty builder may refuse here
        case Some(tok) =>
          val bloom = KvBloom.decode(tok).get
          keys.forall(bloom.mightContain)
      }
    }, seed = 42L, samples = 30)
  }

  test("law: decode answers like the builder's set after the serialize round-trip") {
    checkProp("roundTrip",
      Prop.forAll(Gen.listOfN(100, keyGen)) { members =>
        val b = new KvBloom.Builder
        members.foreach(b.add)
        b.buildToken() match {
          case None => members.isEmpty
          case Some(tok) =>
            // decode twice (cold + via the planning cache): identical answers
            val bloom = KvBloom.decode(tok).get
            val cached = KvBloom.decodeCached(tok).get
            members.forall(k => bloom.mightContain(k) && cached.mightContain(k))
        }
      }, seed = 7L, samples = 30)
  }

  test("law: hash64 is deterministic and spread (no collisions among hundreds of keys)") {
    checkProp("hashSpread", Prop.forAll(Gen.listOfN(500, keyGen)) { keys =>
      val distinct = keys.distinct
      val hashes = distinct.map(KvBloom.hash64)
      distinct.forall(k => KvBloom.hash64(k) == KvBloom.hash64(k)) &&
        hashes.distinct.length == distinct.length
    }, seed = 11L, samples = 30)
  }
}
