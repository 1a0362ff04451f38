package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — the compliance pass every training-data
 * pipeline runs before a corpus leaves curation.
 *
 * Patterns are ASCII-only and avoid lookaround/backreferences, so they mean
 * the same thing to Java regex (Spark codegen'd `regexp_*`) and RE2 (DuckDB
 * oracle) — engine-portable by construction, like every hash in [[TextOps]].
 * No UDFs: detection is `regexp_extract_all` + `size`, redaction is chained
 * `regexp_replace`, all inside whole-stage codegen.
 *
 * Scale note: regex scanning is embarrassingly parallel per row — the only
 * design decision that matters at 100 TB is that these stay codegen'd column
 * expressions (no per-row interpreter boundary) and that redaction happens
 * in ONE projection (the chained replaces fuse), not one pass per kind.
 */
object Pii {

  /**
   * `(kind, pattern, replacement)` in REDACTION ORDER. Order matters:
   * emails go first (their local part can contain digit runs), card numbers
   * before phones (both are digit groups), IPv4 last (its octets are
   * shorter digit runs that other patterns never leave behind).
   */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b", "<CARD>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Per-kind match counts over the RAW text (`n_email`, `n_card`, …).
    * Counts are independent per kind; a string matching two patterns counts
    * in both (detection reports, redaction disambiguates by order). */
  def counts(text: Column): Seq[Column] =
    patterns.map { case (kind, re, _) =>
      size(regexp_extract_all(text, lit(re), lit(0))).as(s"n_$kind")
    }

  /** Text with every PII match replaced by its `<KIND>` token, applied in
    * [[patterns]] order within a single fused projection. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, re, tok)) => regexp_replace(c, re, tok) }

  /** True when the raw text contains any detectable PII — the cheap
    * quarantine predicate (`where(!hasPii(...))` keeps the clean split). */
  def hasPii(text: Column): Column =
    patterns.map { case (_, re, _) => regexp_like(text, lit(re)) }.reduce(_ || _)

  /** Text with every PII match replaced by a STABLE `<KIND:hash8>` token
    * (same value → same token everywhere): linkable pseudonyms instead of
    * [[redact]]'s constant markers. Computed-per-match replacement is
    * beyond `regexp_replace`, so this is the native
    * [[graft.expressions.Pseudonymize]] kernel — requires
    * [[graft.GraftExtensions.register]]. */
  def pseudonymize(text: Column): Column =
    call_function("pii_pseudonymize", text)
}
