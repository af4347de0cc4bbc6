package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** ORACLE-REPLAYABLE Bloom sketch: k bit positions per item derived
  * from md5 — `pos_j = bigint(hex(md5(j || '|' || item))[0:13]) mod m`
  * — the exact arithmetic a SQL engine can re-derive with its own
  * `md5`/`substr`/hex-cast builtins (the q113 CMS discipline applied
  * to the Bloom family). The round-13 sketch wrapped Spark's Murmur3
  * `util.sketch.BloomFilter`, whose hash is engine-internal — the one
  * sketch whose DECISIONS could not be independently replayed, leaving
  * q93 a rows-only entry. With md5 positions the bit LAYOUT stays out
  * of the contract (nobody compares bit arrays) while every membership
  * decision is reproducible in DuckDB: re-derive the k positions per
  * n-gram in SQL, test them against the benchmark's position set.
  *
  * Sizing is PURE INTEGER so both engines agree without a float
  * boundary: m = max(n, 1) · 29 bits (≈3.6 bytes/item), k = 20 —
  * within rounding the optimal pair for ~1e-6 false-positive rate
  * ((1 − e^(−20/29))^20 ≈ 1.1e-6), the same budget the previous
  * Murmur3 sketch targeted. 13 hex chars = 52 bits, so positions stay
  * exact in an IEEE-safe integer range on every engine; the PRACTICAL
  * cap is the single JVM byte[] holding the bits — ~1.7×10¹⁰ bits ≈
  * 590M items (Dedup.shingleSketch guards it with a require; shard
  * the benchmark into multiple sketches beyond that), well below the
  * 52-bit position range itself.
  *
  * No false negatives, by construction — the superset/monotone gates
  * (DedupSpec) hold for any Bloom; false positives only ever FLAG
  * extra rows, the conservative direction for decontamination.
  */
case class Md5BloomSketch(bits: Array[Byte], mBits: Long, k: Int)
    extends Serializable {

  /** True iff all k md5-derived bits are set; short-circuits on the
    * first clear bit (the overwhelmingly common negative path does
    * ~1–2 digests, not 20).
    */
  def mightContain(s: String): Boolean = {
    var j = 0
    while (j < k) {
      val p = Md5BloomSketch.position(j, s, mBits)
      if ((bits((p >>> 3).toInt) & (1 << (p & 7L).toInt)) == 0) return false
      j += 1
    }
    true
  }
}

object Md5BloomSketch {

  /** 29 bits/item, k = 20: the integer-sized ~1e-6-fpp point (see
    * class doc). One definition — the oracle SQL hardcodes the same
    * two constants.
    */
  val BitsPerItem = 29L
  val K = 20

  def mBitsFor(nItems: Long): Long = math.max(nItems, 1L) * BitsPerItem

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** `bigint(hex(md5(j || '|' || s))[0:13]) mod m` — the first 13 hex
    * chars are the digest's first 6.5 bytes, i.e. the big-endian
    * 56-bit value of bytes 0..6 shifted right 4. Identical to Spark's
    * `conv(substring(md5(concat(j, '|', s)), 1, 13), 16, 10)` and
    * DuckDB's `CAST(('0x' || substr(md5(...), 1, 13)) AS BIGINT)`.
    */
  def position(j: Int, s: String, m: Long): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest((j.toString + "|" + s).getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v >>> 4) % m
  }

  /** Set item `s`'s k bits in `bits` (the build-side kernel; the byte
    * array is the caller's accumulator — treeAggregate OR-merges).
    */
  def add(bits: Array[Byte], s: String, m: Long, k: Int): Unit = {
    var j = 0
    while (j < k) {
      val p = position(j, s, m)
      bits((p >>> 3).toInt) = (bits((p >>> 3).toInt) | (1 << (p & 7L).toInt)).toByte
      j += 1
    }
  }
}
