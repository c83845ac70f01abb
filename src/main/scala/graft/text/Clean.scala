package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's tweet-cleaning chain (SURVEY §2.3 P1–P6), re-expressed as
  * composable `Column` transforms so Catalyst collapses the whole chain into a
  * single codegen'd `Project`.
  *
  * Reference: identical 6-step `withColumn` chain in all five pipelines, e.g.
  * `SGDC/sgdc.py:42-47`, `TESTING .py:43-48`.
  *
  * Order matters: URLs must be stripped (P2) before the non-letter scrub (P3)
  * destroys the `://` that identifies them.
  */
object Clean {
  /** P1 — strip @mentions / #hashtags / &entities. */
  val MentionRe = "[@#&][A-Za-z0-9-]+"
  /** P2 — strip URLs (`scheme://nonspace`). */
  val UrlRe = "\\w+://\\S+"
  /** P3 — strip everything that is not an ASCII letter. */
  val NonLetterRe = "[^A-Za-z]"
  /** P4 — collapse whitespace runs. */
  val WsRe = "\\s+"

  def stripMentions(c: Column): Column = regexp_replace(c, MentionRe, " ")
  def stripUrls(c: Column): Column     = regexp_replace(c, UrlRe, " ")
  def lettersOnly(c: Column): Column   = regexp_replace(c, NonLetterRe, " ")
  def collapseWs(c: Column): Column    = regexp_replace(c, WsRe, " ")

  /** Full P1→P6 chain: mentions, urls, non-letters, whitespace, lower, trim. */
  def clean(c: Column): Column =
    trim(lower(collapseWs(lettersOnly(stripUrls(stripMentions(c))))))

  /** The same chain as a DuckDB SQL expression over column `col`, for oracle
    * parity. DuckDB's `regexp_replace` is first-match-only by default — the
    * explicit `'g'` flag makes it global like Spark's.
    */
  def cleanSql(col: String): String =
    s"trim(lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"$col, '[@#&][A-Za-z0-9-]+', ' ', 'g'), " +
      s"'\\w+://\\S+', ' ', 'g'), " +
      s"'[^A-Za-z]', ' ', 'g'), " +
      s"'\\s+', ' ', 'g')))"
}
