package graft.functions

import java.nio.charset.StandardCharsets

/** From-spec XXH64 (xxHash, public-domain algorithm; 64-bit variant) used
  * ONLY as the independent arithmetic side of the driver's
  * `text_rolling_hash_check`: the production rolling hash is Spark's codegen
  * `xxhash64` fold (TextAnalysis.rollingHash); this reimplementation follows
  * the published spec byte-for-byte, so any drift between the two paths —
  * seed plumbing, UTF-8 bytes, tail handling, avalanche — lands a violation
  * row. Not used anywhere in the data path.
  */
object XxHash64Ref {

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def read64LE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def read32LE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def round(acc: Long, lane: Long): Long =
    rotl(acc + lane * P2, 31) * P1

  @inline private def mergeRound(h0: Long, acc: Long): Long =
    (h0 ^ round(0L, acc)) * P1 + P4

  /** XXH64 of `bytes` with `seed`, per the published spec. */
  def hash(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var i = 0
    var h =
      if (len >= 32) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        while (i + 32 <= len) {
          a1 = round(a1, read64LE(bytes, i))
          a2 = round(a2, read64LE(bytes, i + 8))
          a3 = round(a3, read64LE(bytes, i + 16))
          a4 = round(a4, read64LE(bytes, i + 24))
          i += 32
        }
        var m = rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
        m = mergeRound(m, a1); m = mergeRound(m, a2)
        m = mergeRound(m, a3); mergeRound(m, a4)
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round(0L, read64LE(bytes, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (read32LE(bytes, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^ (h >>> 32)
  }

  /** XXH64 of one long = spec hash of its 8 little-endian bytes (matches
    * Spark's LongType hashing).
    */
  def hashLong(v: Long, seed: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hash(b, seed)
  }

  /** The rolling fold `TextAnalysis.rollingHash` performs, re-expressed over
    * this from-spec hash: acc₀ = 0; accᵢ = XXH64(utf8(tokᵢ), seed =
    * XXH64(accᵢ₋₁, 42)) — Spark's `xxhash64(acc, w)` hashes its arguments in
    * sequence, each result seeding the next, starting from seed 42.
    */
  def rollingFold(tokens: Seq[String]): Long =
    tokens.foldLeft(0L) { (acc, w) =>
      hash(w.getBytes(StandardCharsets.UTF_8), hashLong(acc, 42L))
    }
}
