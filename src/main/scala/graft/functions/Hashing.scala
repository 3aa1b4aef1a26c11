package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable hash family.
  *
  * All content hashes are derived from md5 hex prefixes rather than
  * Spark's murmur3/xxhash so that the DuckDB oracle can reproduce every
  * value with plain SQL (`md5` is identical everywhere; native hash
  * functions differ per engine). Arithmetic stays within signed-64-bit
  * exact range so Spark and DuckDB agree bit-for-bit.
  */
object Hashing {

  /** First 15 hex chars of md5 → non-negative 60-bit long.
    * DuckDB equivalent: CAST(('0x' || substr(md5(x),1,15)) AS BIGINT).
    * Native codegen'd digest-byte assembly ([[Md5PrefixLong]]) — same
    * value as the conv/substring composition, none of its four per-row
    * string materializations (equivalence property-tested against the
    * composed form in HashingSpec).
    */
  def md5Long60(c: Column): Column = Md5PrefixLong(c, 15)

  /** First 8 hex chars of md5 → non-negative 32-bit value in a long. */
  def md5Long32(c: Column): Column = Md5PrefixLong(c, 8)

  /** JVM-side twin of [[md5Long60]] (same md5 → same value), for driver-
    * side derivation of deterministic constants (e.g. LSH hyperplanes).
    */
  def md5Long60Jvm(s: String): Long = {
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = digest.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Prime just above 2^32 — modulus of the MinHash permutation family.
    * Keeps (a*h + b) within 2^62 for a < 2^29, so 64-bit arithmetic is
    * exact in both engines.
    */
  val MinHashPrime: Long = 4294967311L

  /** Deterministic permutation coefficients for perm index i. */
  def permA(i: Int): Long = 1L + 37L * i
  def permB(i: Int): Long = (1000003L * i + 12345L) % MinHashPrime
}
