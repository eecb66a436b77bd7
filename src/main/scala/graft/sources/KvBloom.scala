package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.zip.{Deflater, Inflater}

/** Per-segment rowKey BLOOM FILTER, carried on the manifest add line — the
  * HBase ROW bloom (`BLOOMFILTER => 'ROW'`, stored per HFile and consulted
  * by every Get) re-expressed for manifest-planned scans: a point lookup
  * (`rowKey = k`, `rowKey IN (...)`, or the runtime-pruned join's key set)
  * tests each candidate segment's bloom at PLANNING time and never
  * schedules a task for a segment that cannot contain the key.
  *
  * Why min/max bounds are not enough: a freshly ingested table is a pile
  * of epoch segments, and every epoch typically spans the whole keyspace —
  * range pruning keeps ALL of them for a point lookup, while a bloom keeps
  * ~1 (+fpp). The two mechanisms are complementary by construction: blooms
  * are built only for small (epoch-sized) segments, where ranges cannot
  * prune; large compacted regions have tight disjoint ranges, where blooms
  * would be oversized and ranges already prune exactly.
  *
  * Sizing: ~[[BitsPerKey]] bits per distinct key, power-of-two bits in
  * [2^10, [[MaxBits]]], k = 7 probes (optimal for 10 bits/key). A file
  * with more than `MaxBits / BitsPerKey` (~26k) distinct keys gets NO
  * bloom — it would either saturate (useless) or bloat every log entry
  * that carries it. The serialized form is deflate+base64 of the bitset
  * (epoch segments are sparse — mostly-zero bitsets compress to a few
  * hundred bytes), so a checkpoint entry carrying dozens of epoch blooms
  * stays KB-scale.
  *
  * The filter answers MAY-CONTAIN: a false positive only costs one
  * needlessly scanned segment; false negatives are impossible (the same
  * `hash64` feeds build and probe).
  */
private[graft] final class KvBloom(k: Int, bits: Array[Byte]) {
  private val mMask = bits.length * 8 - 1 // bit count is a power of two

  def mightContain(key: String): Boolean = {
    val h = KvBloom.hash64(key)
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt
    var i = 0
    while (i < k) {
      // Kirsch–Mitzenmacher double hashing: g_i = h1 + i*h2, masked into
      // the power-of-two bit space.
      val idx = (h1 + i * h2) & mMask
      if ((bits(idx >>> 3) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }
}

private[graft] object KvBloom {

  val BitsPerKey = 10
  val MaxBits: Int = 1 << 18 // 32 KiB raw ceiling; above it, no bloom
  val Probes = 7 // ~0.693 * BitsPerKey

  /** Streaming builder used by the sink writer: buffers one 64-bit hash
    * per row (bounded — collection stops past the no-bloom threshold) and
    * sizes the bitset from the DISTINCT count at build time, which a
    * one-pass writer cannot know up front.
    */
  final class Builder {
    private val maxKeys = MaxBits / BitsPerKey
    private var hashes = new scala.collection.mutable.ArrayBuffer[Long](256)

    def add(key: String): Unit =
      if (hashes != null) {
        hashes += hash64(key)
        // Amortized dedup keeps the buffer bounded at ~2× the bloom's
        // distinct-key capacity: a duplicate-heavy file (the LWW shape —
        // many versions, few keys) still earns its bloom, while a file
        // whose DISTINCT count exceeds capacity drops the buffer and
        // stops paying per row. One distinct pass per ~capacity appends.
        if (hashes.length > maxKeys * 2) {
          val d = hashes.distinct
          if (d.length > maxKeys) hashes = null
          else { hashes.clear(); hashes ++= d }
        }
      }

    /** The serialized stat token, or None when the file is too keyful
      * (or empty) to carry a useful bloom.
      */
    def buildToken(): Option[String] = {
      if (hashes == null || hashes.isEmpty) return None
      val distinct = hashes.distinct
      val wantBits = distinct.length.toLong * BitsPerKey
      if (wantBits > MaxBits) return None
      var m = 1024
      while (m < wantBits) m <<= 1
      val bits = new Array[Byte](m / 8)
      val mask = m - 1
      distinct.foreach { h =>
        val h1 = h.toInt
        val h2 = (h >>> 32).toInt
        var i = 0
        while (i < Probes) {
          val idx = (h1 + i * h2) & mask
          bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
          i += 1
        }
      }
      Some(s"$Probes.${encodeBits(bits)}")
    }
  }

  /** Planning-side decode cache: a point query over a many-segment table
    * probes one bloom per candidate, and tables are re-planned per query —
    * without memoization that is O(segments) inflate calls per point
    * lookup. Tokens are immutable values (content-addressed by their own
    * string), so a flat map keyed by token is sound; bounded by clearing
    * wholesale at capacity (tokens cycle only when tables churn files, so
    * the steady state is one entry per live segment across all tables).
    */
  private val decodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[KvBloom]]()
  private val DecodeCacheMax = 8192

  def decodeCached(token: String): Option[KvBloom] = {
    val hit = decodeCache.get(token)
    if (hit != null) return hit
    val v = decode(token)
    if (decodeCache.size >= DecodeCacheMax) decodeCache.clear()
    decodeCache.put(token, v)
    v
  }

  /** Parse a stat token back to a probe-ready filter. Unknown/corrupt
    * tokens decode to None — the planner then simply cannot prune with
    * this file's bloom (forward compatibility, same contract as unknown
    * stat tokens).
    */
  def decode(token: String): Option[KvBloom] =
    try {
      val dot = token.indexOf('.')
      if (dot <= 0) return None
      val k = token.substring(0, dot).toInt
      val bits = decodeBits(token.substring(dot + 1))
      // power-of-two byte length >= 128 is the only valid shape
      if (k <= 0 || bits.length < 128 || (bits.length & (bits.length - 1)) != 0) None
      else Some(new KvBloom(k, bits))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** FNV-1a 64 over the UTF-8 bytes, finished with the splitmix64
    * avalanche — cheap, dependency-free, and well-mixed in both 32-bit
    * halves (the double-hashing scheme consumes them independently).
    */
  def hash64(key: String): Long = {
    val bytes = key.getBytes(StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  private def encodeBits(bits: Array[Byte]): String = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(bits); d.finish()
    val out = new java.io.ByteArrayOutputStream(bits.length / 4)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    Base64.getEncoder.encodeToString(out.toByteArray)
  }

  private def decodeBits(b64: String): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(Base64.getDecoder.decode(b64))
    val out = new java.io.ByteArrayOutputStream(4096)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new IllegalStateException("truncated bloom")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
