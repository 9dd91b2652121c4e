package graft.quality

import org.apache.spark.sql.DataFrame

/** PII discovery (reference: governance/data_classification.py:141-207 —
  * driver-side regex over column names plus a bounded value sample; F4 in
  * SURVEY.md §2.10).
  *
  * Deliberately driver-side: it inspects |columns| names and a ≤`sampleN`
  * row sample — never a full scan — so it is O(schema), not O(data), at
  * any table size.
  */
object PiiScan {

  final case class Finding(column: String, kind: String, via: String)

  private val namePatterns: Seq[(String, String)] = Seq(
    "email" -> "(?i).*(email|e_mail).*",
    "phone" -> "(?i).*(phone|mobile|msisdn).*",
    "name" -> "(?i).*(first_?name|last_?name|full_?name|^name$|_name$).*",
    "address" -> "(?i).*(address|street|zip|postal).*",
    "national_id" -> "(?i).*(ssn|passport|national_id|tax_id).*")

  private val valuePatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "phone" -> """\+?\d[\d\s().-]{7,}\d""",
    "ipv4" -> """\b(\d{1,3}\.){3}\d{1,3}\b""")

  /** Scan column names, then regex a small collected sample of string
    * columns for value-shaped PII. */
  def scan(df: DataFrame, sampleN: Int = 100): Seq[Finding] = {
    val byName = df.schema.fields.flatMap { f =>
      namePatterns.collect {
        case (kind, re) if f.name.matches(re) => Finding(f.name, kind, "column_name")
      }
    }
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    val byValue: Seq[Finding] =
      if (stringCols.isEmpty) Seq.empty
      else {
        val sample = df.select(stringCols.map(org.apache.spark.sql.functions.col): _*)
          .limit(sampleN).collect()
        // compiled once per pattern and matched with find(), not
        // String.matches(".*re.*"): matches() anchors the whole string
        // and '.' never crosses '\n', so a multiline value containing
        // PII would silently scan clean
        val compiled = valuePatterns.toSeq.map { case (kind, re) =>
          (kind, java.util.regex.Pattern.compile(re))
        }
        stringCols.toSeq.zipWithIndex.flatMap { case (c, i) =>
          val values = sample.toSeq.map(_.getString(i)).filter(_ != null)
          // EVERY matching kind, not collectFirst: a free-text column
          // holding both emails and IPs must surface both findings, or a
          // consumer masking by kind silently misses one class of PII
          // (byName already reports all kinds — same policy here)
          compiled.collect {
            case (kind, p) if values.exists(v => hasValueMatch(kind, p, v)) =>
              Finding(c, kind, "value_sample")
          }
        }
      }
    (byName.toSeq ++ byValue).distinct
  }

  // boundary guards: a date shape embedded INSIDE a longer digit/dash run
  // ('555-1234-56-78 90') is part of the phone digits, not a date — only
  // strip shapes not attached to an adjacent digit or dash on either side.
  // Dash-JOINED CHAINS of dates ('2024-01-01-2024-01-31', the compact
  // range form) are one match: the chain group consumes the whole range,
  // so ranges still strip and are rejected as phone, while a date glued
  // to a non-date digit run ('2024-01-01-0001234') stays unstripped —
  // the documented recall-over-precision posture for date-prefixed ids.
  private val DateShape = java.util.regex.Pattern.compile(
    """(?<![\d-])\d{4}-\d{2}-\d{2}(-\d{4}-\d{2}-\d{2})*(?![\d-])""")

  /** find() with a per-kind plausibility gate. The phone shape
    * (digit/space/dash/paren runs) also matches ISO dates ('2024-01-01'
    * is a 10-char run with 8 digits) and date-prefixed codes — reported
    * as phone PII, a masking consumer would then mangle date columns.
    * Heuristic gate: strip every boundary-delimited date shape (not one
    * embedded inside a longer digit/dash run, which is phone material,
    * e.g. the 1234-56-78 inside '555-1234-56-78 90') from the match,
    * then demand
    * a phone-weight (>= 9) digit run in the remainder — a bare date or
    * a run of consecutive dates ('2024-01-01 2024-01-02 2024-01-03')
    * strips to separators and is rejected, while a genuine phone that
    * happens to start with a date-shaped prefix ('2024-01-01 555 867
    * 5309' captured as one run) still reports. Rejecting on a leading
    * date alone silently dropped that class; a value-sample scanner
    * leans recall-over-precision on what survives the strip (a
    * date-prefixed 10-digit id still reports — masking consumers
    * confirm by column, not by one sampled hit). */
  private def hasValueMatch(
      kind: String, p: java.util.regex.Pattern, v: String): Boolean = {
    val m = p.matcher(v)
    var found = false
    while (!found && m.find()) {
      found = kind != "phone" || {
        val rest = DateShape.matcher(m.group()).replaceAll("")
        rest.count(_.isDigit) >= 9
      }
    }
    found
  }
}
