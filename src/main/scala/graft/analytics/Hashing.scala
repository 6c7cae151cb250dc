package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic CROSS-ENGINE hashing for the dedup/similarity operator
  * family. Every function here has an exact DuckDB-SQL twin (`*Sql`), so
  * operators built on these are fully oracle-checkable — engine-specific
  * hashes (xxhash64, murmur `hash()`) are not reproducible outside Spark
  * and forced those operators down to rows-only verification in round 1.
  *
  * The md5-derived hashes cost one md5 per input string (the 32/64
  * per-seed hashes are cheap universal-hash arithmetic on top), so the
  * hot path stays one digest + codegen'd integer math per row.
  */
object Hashing {

  /** splitmix64 (public-domain algorithm, Steele et al., "Fast Splittable
    * Pseudorandom Number Generators") — used DRIVER-SIDE only, to derive
    * literal constants that then appear identically in both plans.
    */
  def mix(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 2^31 - 1 (prime): the universal-hash modulus. Products a*x with
    * a, x < 2^31 stay below 2^62 — no 64-bit overflow under ANSI mode,
    * in either engine.
    */
  val P31: Long = 2147483647L

  /** 31-bit portable string hash: first 8 md5 hex chars mod P31. */
  def h31(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % P31
  def h31Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,8)) AS BIGINT) % $P31"

  /** 60-bit portable string hash (md5 hex chars 9-15 ∥ 1-8) — positive
    * in a signed 64-bit lane in both engines.
    */
  def h60(c: Column): Column =
    shiftleft(conv(substring(md5(c), 9, 7), 16, 10).cast("long"), 32) +
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  def h60Sql(e: String): String =
    s"((CAST(('0x' || substr(md5($e),9,7)) AS BIGINT) << 32) + " +
      s"CAST(('0x' || substr(md5($e),1,8)) AS BIGINT))"

  /** Universal-hash family over Z_P31: x ↦ (a_i·x + b_i) mod P31. */
  def uhA(i: Int): Long = (mix(0xA11CEL + i) & Long.MaxValue) % (P31 - 1) + 1
  def uhB(i: Int): Long = (mix(0xB0BL + i) & Long.MaxValue) % P31
  def uh(i: Int, x: Column): Column = (x * uhA(i) + uhB(i)) % P31
  def uhSql(i: Int, x: String): String = s"(($x * ${uhA(i)} + ${uhB(i)}) % $P31)"

  /** Deterministic random hyperplanes for sign-LSH, components in
    * (-1, 1). Literals in both plans (broadcast by value).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      mix(seed ^ (p * 1000003L + i)).toDouble / Long.MaxValue.toDouble
    }

  def planeLit(plane: Array[Double]): Column =
    array(plane.map(lit(_)).toIndexedSeq: _*)
  def planeSql(plane: Array[Double]): String =
    plane.mkString("[", ", ", "]")

  /** Sign-bit bucket of `v` against `planes` — Spark and SQL twins.
    * (Double.toString round-trips exactly, and both engines accumulate
    * the dot product left-to-right in double, so the sign bits agree
    * bit-for-bit.)
    */
  def bucketCol(s: org.apache.spark.sql.SparkSession, v: Column,
                planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (pl, p) =>
      when(graft.plans.VectorFunctions.vec_dot(s, v, planeLit(pl)) >= 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  def bucketSql(vExpr: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (pl, p) =>
      s"(CASE WHEN list_dot_product($vExpr, ${planeSql(pl)}) >= 0 " +
        s"THEN CAST(${1L << p} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
