package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine deterministic hashing convention used by every dedup /
  * sampling / LSH operator: a 15-hex-digit window of md5, read as int64.
  * DuckDB equivalent: `('0x' || substr(md5(x), <start>, 15))::BIGINT`.
  * Defined ONCE — oracle parity depends on every operator using the same
  * window widths.
  */
object Hashing {

  /** md5 hex digits [start, start+15) as a non-negative int64 (< 2^60). */
  def md5Window15(c: Column, start: Int = 1): Column =
    conv(substring(md5(c), start, 15), 16, 10).cast("long")

  /** first-window hash reduced to [0, m). */
  def md5Bucket(c: Column, m: Long): Column = pmod(md5Window15(c), lit(m))

  /** driver-side twin of [[md5Bucket]] for planning-time bucket math
    * (x170's partition-pruned point lookup; the hash is non-negative so
    * plain % is the pmod). */
  def md5BucketOf(v: String, m: Long): Long = {
    val hex = java.security.MessageDigest
      .getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
      .take(15)
    java.lang.Long.parseLong(hex, 16) % m
  }
}
