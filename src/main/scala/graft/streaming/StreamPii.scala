package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Pii

/** Streaming PII scrub: the SAME column expressions as batch q78
  * applied in flight, so documents are redacted before they ever reach
  * a sink — the posture a privacy-constrained ingest pipeline needs
  * (raw PII never lands on disk).
  *
  * Stateless — pure per-row codegen'd regex expressions, no shuffle, no
  * state store — so it composes with any downstream streaming operator
  * and scales with partition count alone.
  */
object StreamPii {

  /** Append per-class PII counts, the flags, and the redacted text to
    * a (streaming or batch) frame with a `text` column. The card class
    * (r14) rides beside the regex classes: n_cards counts LUHN-VALID
    * 16-digit runs (batch q186's checksum tree — invalid runs are
    * order ids, not PII) and redaction replaces exactly those with
    * `<CARD>`; has_pii keeps q78's three-class definition, has_card is
    * its own flag, so batch parity for both queries holds untouched. */
  def scrubbed(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_emails", Pii.nEmails(col("text")))
      .withColumn("n_phones", Pii.nPhones(col("text")))
      .withColumn("n_ips", Pii.nIps(col("text")))
      .withColumn("n_cards", Pii.nCards(col("text")))
      .withColumn("has_pii", Pii.hasPii(col("text")))
      .withColumn("has_card", col("n_cards") > 0L)
      .withColumn("text", Pii.redactCards(Pii.redact(col("text"))))

  /** Drop documents that still contain PII after redaction would be
    * required (quarantine mode: route flagged docs elsewhere). */
  def clean(docs: DataFrame): DataFrame =
    scrubbed(docs).where(!col("has_pii") && !col("has_card"))
}
