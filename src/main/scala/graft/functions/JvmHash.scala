package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** JVM-side twins of PortableHash's column expressions, for use inside
  * typed flatMap/map closures. MUST stay value-identical to the column
  * forms (h60 = conv(substring(md5(s),1,15),16,10); seeded = universal
  * family mod P) — JvmHashSpec asserts this against the Spark expressions.
  */
object JvmHash {
  val P: Long = PortableHash.P

  /** First 15 hex chars of md5(s) parsed as a long (= PortableHash.h60). */
  def h60(s: String): Long = {
    // Thread-local would avoid per-call getInstance; MessageDigest.getInstance
    // is cheap enough (no contention) for current volumes.
    val md = MessageDigest.getInstance("MD5")
    val dig = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // 15 hex chars = 60 bits = first 7 bytes + high nibble of byte 8.
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xf0L) >> 4)
    v
  }

  def h60p(s: String): Long = h60(s) % P

  /** Seeded universal hash (= PortableHash.seeded). */
  def seeded(hModP: Long, seed: Int): Long = {
    val a = (2654435761L * (seed + 1)) % P
    val b = (40503L * (seed + 7)) % P
    (a * hModP + b) % P
  }

}
