package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine-deterministic hashing primitives.
  *
  * Engine-native hash functions (Spark xxhash64 / DuckDB hash) use
  * different algorithms, so any query whose OUTPUT depends on hash values
  * could never be oracle-checked. Everything here is built from md5 (bit
  * identical everywhere) plus integer arithmetic both engines evaluate
  * exactly:
  *
  *   h60(s)       = first 15 hex chars of md5(s) as a 60-bit BIGINT
  *                  DuckDB twin: CAST('0x' || substr(md5(s),1,15) AS BIGINT)
  *   seeded(h, i) = universal-hash family (a_i * (h mod P) + b_i) mod P
  *                  with P = 1e9+7; products stay < 2^60, no overflow.
  *
  * These power MinHash signatures, SimHash bit sampling and document
  * fingerprints (DedupQueries / TextAnalysis) with DuckDB-checkable
  * results.
  */
object PortableHash {
  /** Modulus for seeded hashes: largest common prime < 2^30 keeps every
    * intermediate product below 2^60 in both engines' BIGINT math. */
  val P = 1000000007L

  /** 60-bit md5-derived hash (always non-negative). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** h60 reduced mod P — input to the seeded family. */
  def h60p(c: Column): Column = h60(c) % P

  /** Seeded universal hash; `seed` is a column of small ints (0..63). */
  def seeded(hModP: Column, seed: Column): Column = {
    val a = (lit(2654435761L) * (seed + 1)) % P
    val b = (lit(40503L) * (seed + 7)) % P
    (a * hModP + b) % P
  }

  /** DuckDB SQL fragments mirroring the Scala columns, for oracle reuse. */
  def h60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"
  def h60pSql(e: String): String = s"(${h60Sql(e)} % 1000000007)"
  def seededSql(h: String, seed: String): String =
    s"((((2654435761 * ($seed + 1)) % 1000000007) * $h + ((40503 * ($seed + 7)) % 1000000007)) % 1000000007)"
}
