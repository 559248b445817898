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

  // ---- affine permutation family (MinHash) ----
  //
  // K seeded md5 calls per shingle is the naive MinHash formulation and
  // dominated the benchmark. The classic fix: hash each shingle ONCE,
  // then derive the K "independent" hashes as affine permutations
  //   h_i = (A_i * (h % P) + B_i) % P,   P = 2^31 - 1
  // P keeps A_i * h' < 2^62 (no BIGINT overflow in either engine) and
  // the constants are md5-derived so the family is reproducible
  // everywhere without RNG state.

  val MersennePrime31: Long = 2147483647L // 2^31 - 1

  /** Deterministic (A_i, B_i) permutation constants. */
  def minhashPerms(k: Int): Seq[(Long, Long)] = {
    import java.nio.charset.StandardCharsets
    import java.security.MessageDigest
    def c(tag: String): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(tag.getBytes(StandardCharsets.UTF_8))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      v % MersennePrime31
    }
    (0 until k).map(i => (c(s"A|$i") % (MersennePrime31 - 1) + 1, c(s"B|$i")))
  }

  /** Spark form of h_i given a pre-reduced h' = h32(x) % P column. */
  def permute(hmod: Column, a: Long, b: Long): Column =
    (lit(a) * hmod + lit(b)) % MersennePrime31

  /** DuckDB form of the same permutation. */
  def duckPermute(hmodExpr: String, a: Long, b: Long): String =
    s"(($a * $hmodExpr + $b) % $MersennePrime31)"
}
