package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Spark's `hash()`/`xxhash64()` and DuckDB's `hash()` are different
  * algorithms, so any operator whose OUTPUT must hash-match the DuckDB
  * oracle (MinHash signatures, SimHash, LSH bucket ids, fingerprints)
  * uses this instead: the first 8 hex chars of md5 read as an unsigned
  * 32-bit integer. Both engines produce identical md5 hex strings, and
  * the conversion is exact in both:
  *
  *   Spark :  conv(substring(md5(x), 1, 8), 16, 10)  cast to long
  *   DuckDB:  ('0x' || substr(md5(x), 1, 8))::BIGINT
  *
  * Keyspace is 2^32 — plenty for LSH banding/bucketing; this is NOT a
  * cryptographic or collision-optimal hash, it is a *reproducibility*
  * hash. At 100 TB scale the same construction still works (md5 is
  * cheap relative to shuffle cost and the hash is only applied to
  * short shingles/tokens).
  */
object PortableHash {

  /** Unsigned 32-bit hash of a string column, identical in DuckDB. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: family of independent hash functions for MinHash. */
  def h32(seed: Int, c: Column): Column =
    h32(concat(lit(seed.toString), lit("|"), c))

  /** DuckDB SQL fragment equivalent to [[h32(c)]], for oracle authoring. */
  def duckH32(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 8))::BIGINT)"

  /** DuckDB SQL fragment equivalent to the seeded [[h32(seed,c)]]. */
  def duckH32(seed: Int, expr: String): String =
    duckH32(s"'$seed' || '|' || $expr")
}
