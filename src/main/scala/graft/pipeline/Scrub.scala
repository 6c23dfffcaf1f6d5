package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: redact emails, IPv4 addresses,
  * and phone-shaped numbers with typed placeholders and count each —
  * the standard pre-training hygiene pass (e.g. the C4/Gopher/RefinedWeb
  * pipelines all strip or mask contact strings before training).
  *
  * Pure codegen'd regexp projections over one narrow column — zero
  * shuffle, streams at parquet-scan speed at any scale. Patterns are
  * deliberately RE2-compatible (no backreferences/lookaround) so the
  * DuckDB oracle replays both the counts and the redacted text
  * byte-identically. */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

  /** (doc_id, n_emails, n_ips, n_phones, clean) — counts from the
    * original text, redaction applied email → ip → phone (emails go
    * first: their domains contain dots that the IP pattern must never
    * see half-redacted). */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String): Column = size(regexp_extract_all(t, lit(re), lit(0)))
    docs.select(
      col(idCol).as("doc_id"),
      n(EmailRe).cast("long").as("n_emails"),
      n(Ipv4Re).cast("long").as("n_ips"),
      n(PhoneRe).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean"))
  }
}
