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

  val CardRe = "\\d{16}"

  /** Luhn mod-10 validity of a 16-digit string column, composed from
    * codegen'd builtins (sequence → aggregate → substr): digits from
    * the RIGHT (i = 0 is the check digit, never doubled), every second
    * one doubles with the >9 ⇒ −9 fold, and the sum must be ≡ 0
    * (mod 10). Validity is what separates card-number PII from order
    * ids and timestamps — a pattern regex alone cannot express it,
    * which is why the card class lives beside, not inside, the regex
    * classes above. Batch q186 and the streaming scrub share this one
    * tree. */
  def luhnValid16(c: Column): Column = {
    val sum = aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, i) => {
      val d = c.substr(lit(16) - i, lit(1)).cast(LongType)
      val folded = when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      acc + folded
    })
    sum % 10 === 0
  }

  /** Luhn-VALID 16-digit runs in the text (the card-number count q186
    * reports; plain 16-digit runs that fail the checksum don't count). */
  def nCards(t: Column): Column =
    size(filter(regexp_extract_all(t, lit(CardRe), lit(0)),
      luhnValid16(_))).cast(LongType)

  /** Replace every Luhn-valid 16-digit run with `<CARD>` — validity is
    * not regex-expressible, so the redaction folds the VALID candidate
    * list over the text with literal `replace` (still a pure row-local
    * expression tree; invalid runs stay, by design). */
  def redactCards(t: Column): Column =
    aggregate(
      filter(regexp_extract_all(t, lit(CardRe), lit(0)), luhnValid16(_)),
      t,
      (acc, c) => replace(acc, c, lit("<CARD>")))
}
