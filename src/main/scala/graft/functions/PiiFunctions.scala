package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation — per-row
  * codegen'd regex scans (no shuffle, no UDFs), the standard scrubbing
  * pass a 100 TB text pipeline runs before packing/export.
  *
  * The patterns are deliberately restricted to regex syntax shared by
  * Java's `Pattern` (Spark) and RE2 (DuckDB): no lookaround, no
  * backreferences, no possessive quantifiers — so the DuckDB oracle can
  * run the *identical* pattern strings and match byte-for-byte.
  */
object PiiFunctions {

  /** RFC-loose email: local@domain.tld. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone shape: +C[C]-NNN-NNNN. */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4. \b stops a match from starting or ending inside
    * a digit run (so 1234.5.6.7890 doesn't partially match), but \b
    * holds between a digit and a '.', so a five-part version string
    * like 1.2.3.4.5 still yields a false positive on its first four
    * parts → "[IP].5". Preventing that needs (?<![.0-9])/(?![.0-9])
    * lookarounds, which the RE2-compat contract above rules out — a
    * deliberate trade: identical engine/oracle semantics over perfect
    * precision. Curation-side impact is over-redaction (safe direction);
    * PiiSpec documents the behavior. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Non-overlapping match counts per PII class. */
  def piiSignals(text: Column): Map[String, Column] = Map(
    "n_emails" -> regexp_count(text, lit(EmailRe)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhoneRe)).cast("long"),
    "n_ipv4" -> regexp_count(text, lit(Ipv4Re)).cast("long"))

  /** Replace every PII span with a typed placeholder token. Order is
    * fixed (email → phone → IP) and load-bearing: the oracle applies the
    * same sequence, and placeholders contain no digits/@ so later passes
    * cannot re-match earlier replacements. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** True when the text contains any detectable PII. */
  def hasPii(text: Column): Column =
    piiSignals(text).values.reduce(_ + _) > 0
}
