package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Direct bit extraction from md5 digests — the shared hot-path helper for
  * every sketch/routing site whose oracle contract is
  * `conv(substring(md5(x), a, 15), 16, 10)`.
  *
  * The old form at those sites rendered all 16 digest bytes through
  * per-byte `"%02x".format` (format-string parse + boxing, 16×/digest),
  * concatenated, then `Long.parseLong(hex.substring(...), 16)` round-
  * tripped the string back to the integer — ~10-50× the cost of the md5
  * itself. Hex digit i is nibble i of the digest read big-endian, so the
  * same integers fall out of plain shifts:
  *
  *   - [[top60]]  ≡ `parseLong(hex.substring(0, 15), 16)`  — bytes 0..6
  *     whole, plus the high nibble of byte 7 (15 nibbles = 60 bits).
  *   - [[mid60]]  ≡ `parseLong(hex.substring(16, 31), 16)` — bytes 8..14
  *     whole, plus the high nibble of byte 15.
  *
  * Both are bit-identical BY CONSTRUCTION (spec-pinned against the string
  * path in `Md5BitsSpec`), so every gated query's hash stays exact — only
  * the encoding of the same 60 bits changes. 60 bits < 63 keeps every
  * value non-negative, so `% m` is a true bucket index with no sign fix.
  *
  * The in-repo precedent is [[MinHashSignature]] (compares raw digest
  * bytes, hex-encodes only winners); this object extends that discipline
  * to the aggregator/routing sites the round-11 noop bench exposed.
  */
object Md5Bits {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Thread-cached md5 of raw bytes (digest() resets the instance). */
  def md5(bytes: Array[Byte]): Array[Byte] = digests.get().digest(bytes)

  /** Thread-cached md5 of a string's UTF-8 bytes. */
  def md5(s: String): Array[Byte] = md5(s.getBytes(UTF_8))

  /** md5 over a pre-encoded prefix + element bytes without concatenating
    * (UTF-8 of `prefix + elem` is the concatenation of the parts' UTF-8).
    */
  def md5(prefix: Array[Byte], elem: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.update(prefix)
    md.update(elem)
    md.digest()
  }

  /** Leading 60 bits of a digest: hex digits [0, 15). Always ≥ 0. */
  def top60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** 60 bits from hex digits [16, 31) — the second Bloom probe. */
  def mid60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 8
    while (i < 15) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(15) & 0xf0L) >>> 4)
  }

  /** `top60(md5(s))` — the one-call form for routing/bucketing sites. */
  def hash60(s: String): Long = top60(md5(s))
}
