package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection/redaction expressions shared by batch q78 and the
  * streaming scrub: pure `Column` trees, so the same codegen'd
  * projection runs over a parquet scan or a micro-batch. The regex
  * subset (character classes, bounded repetition, \b, \d) has
  * identical semantics in Java regex (Spark) and RE2 (DuckDB), which
  * is what lets q78 exact-oracle.
  */
object Pii {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IpRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def nEmails(t: Column): Column =
    size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast(LongType)
  def nPhones(t: Column): Column =
    size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast(LongType)
  def nIps(t: Column): Column =
    size(regexp_extract_all(t, lit(IpRe), lit(0))).cast(LongType)
  def hasPii(t: Column): Column =
    nEmails(t) + nPhones(t) + nIps(t) > 0L

  /** All three classes replaced, email first (its host part never
    * matches the IP pattern, so the order only matters for clarity). */
  def redact(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")
}
