package graft.kv

import org.apache.spark.unsafe.types.UTF8String

/** Unsigned UTF-8 byte ordering for Strings — the ordering parquet's
  * `Binary` comparator AND Spark's `UTF8String` use. JVM `String`
  * ordering compares UTF-16 code units, which diverges for strings
  * mixing supplementary-plane code points (>= U+10000, surrogate pairs
  * starting 0xD800-0xDBFF in UTF-16 but 0xF0.. in UTF-8) with chars in
  * [U+E000, U+FFFF] (above surrogates in UTF-16, 0xEE..-0xEF.. in
  * UTF-8). Any min/max that feeds a parquet range predicate or an
  * index-key bound MUST use this ordering, or the derived range can
  * exclude matching rows (silent wrong results, not just a wider scan).
  */
object Utf8Order extends Ordering[String] {
  override def compare(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  def min(a: String, b: String): String = if (compare(a, b) <= 0) a else b
  def max(a: String, b: String): String = if (compare(a, b) >= 0) a else b
}
