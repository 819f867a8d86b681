package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.UUID

/** Deterministic identity functions.
  *
  * Reference semantics: `_stable_uuid` at /root/reference/src/pipeline.py:61-64 —
  * `uuid5(NAMESPACE_DNS, "|".join(non-empty parts))`. Byte-exact RFC-4122 v5
  * (SHA-1) implementation so triple identities match the reference corpus.
  */
object Ids {

  /** RFC-4122 DNS namespace, same constant as Python's `uuid.NAMESPACE_DNS`. */
  val NamespaceDns: UUID = UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

  private def uuidBytes(u: UUID): Array[Byte] = {
    val b = new Array[Byte](16)
    var msb = u.getMostSignificantBits
    var lsb = u.getLeastSignificantBits
    var i = 7
    while (i >= 0) { b(i) = (msb & 0xff).toByte; msb >>>= 8; i -= 1 }
    i = 15
    while (i >= 8) { b(i) = (lsb & 0xff).toByte; lsb >>>= 8; i -= 1 }
    b
  }

  // MessageDigest.getInstance synchronizes on the JCA provider registry —
  // calling it per row serializes all executor threads (measured: local[32]
  // slower than local[8]). One digest per thread, reset per use.
  private val sha1 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-1"))

  /** RFC-4122 v5 (SHA-1, name-based) UUID — bit-compatible with Python `uuid5`. */
  def uuid5(namespace: UUID, name: String): UUID = {
    val md = sha1.get()
    md.reset()
    md.update(uuidBytes(namespace))
    md.update(name.getBytes(UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC-4122 variant
    var msb = 0L
    var lsb = 0L
    var i = 0
    while (i < 8) { msb = (msb << 8) | (h(i) & 0xff); i += 1 }
    while (i < 16) { lsb = (lsb << 8) | (h(i) & 0xff); i += 1 }
    new UUID(msb, lsb)
  }

  /** `_stable_uuid(*parts)`: uuid5(DNS, "|".join(p for p in parts if p)).
    * Null parts are treated like empty strings (dropped), matching the
    * reference's falsy filter. (pipeline.py:61-64)
    */
  def stableUuid(parts: String*): String = {
    val key = parts.iterator.filter(p => p != null && p.nonEmpty).mkString("|")
    uuid5(NamespaceDns, key).toString
  }
}
