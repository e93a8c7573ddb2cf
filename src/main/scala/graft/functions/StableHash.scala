package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Spark's `hash()`/`xxhash64()` are fast but Spark-specific; every hash
  * here is defined in terms of md5 hex (identical in Spark, DuckDB,
  * Postgres, ...) so any derived operator (minhash, simhash, LSH bands,
  * fingerprints) can be oracle-checked SQL-for-SQL across engines.
  *
  * md5 is codegen'd (Spark `Md5` expression) and evaluated executor-side;
  * the cost vs xxhash64 is irrelevant next to the shuffle it feeds. If a
  * pipeline needs raw speed and no cross-engine parity, swap
  * [[stable32]] for `xxhash64` — every operator takes the hash column as
  * an input, not a baked-in choice.
  */
object StableHash {

  /** Prime modulus < 2^32 for the universal-hash family. */
  val Mod: Long = 4294967291L

  /** First 32 bits of md5(s) as a non-negative BIGINT.
    * DuckDB equivalent: `CAST('0x' || substr(md5(s),1,8) AS BIGINT)`. */
  def stable32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def stable32Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 8) AS BIGINT)"

  /** i-th universal hash of a pre-hashed value x: (a_i * x + b_i) mod p.
    * a_i < 2^21 keeps a_i * x < 2^53: exact in int64 AND in double, so
    * the same expression is deterministic in any engine. */
  def universal(x: Column, i: Int): Column = {
    val a = 2L * i + 1L
    val b = 1L * i * i + 7L
    (x * lit(a) + lit(b)) % lit(Mod)
  }

  /** Driver-side deterministic scramble for plan-build-time constants
    * (e.g. SRP hyperplane weights). The weights land in the plan as
    * literals, so oracle SQL generated from the same function matches. */
  def universalConst(x: Long): Long =
    (x * 6364136223846793005L + 1442695040888963407L) >>> 33

  def universalSql(xExpr: String, i: Int): String = {
    val a = 2L * i + 1L
    val b = 1L * i * i + 7L
    s"(($xExpr) * $a + $b) % ${Mod}"
  }
}
