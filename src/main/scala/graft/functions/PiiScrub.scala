package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for LLM training corpora — the scrub stage every
  * large-scale text pipeline runs between dedup and tokenization. No
  * reference implementation (SURVEY.md §7.4 category); patterns follow
  * the common public recipes (email / phone / IPv4 / IPv6 / credit-card-
  * like digit runs), deliberately written in the RE2-compatible subset
  * of Java regex (no backreferences, no lookaround) so the same pattern
  * runs identically under Spark's codegen'd `regexp_replace`, RE2-based
  * engines, and the DuckDB oracle.
  *
  * Everything here is a pure map-side expression — no UDF, no shuffle;
  * `regexp_replace` stays inside whole-stage codegen.
  *
  * These are pattern scrubs, not NER: they catch formatted identifiers,
  * not names or addresses. Recall/precision tradeoffs are the caller's —
  * patterns are exposed individually and composable.
  */
object PiiScrub {

  /** RFC-shaped emails (the pragmatic pattern, not full RFC 5321). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-ish phone numbers: optional +CC, then ≥7 digits
    * total, each separated by AT MOST two of the common separator chars
    * (covers "+1 (555) 010-0042", "555.010.0042", "0170 1234567").
    * Requiring ≥7 actual digits (not 8 chars of digit-soup, as a naive
    * `[0-9()\s.-]{6,}` run does) and capping separator runs at two keeps
    * year ranges ("2010 - 2019"), version strings and other sparse digit
    * runs out. Bare ISO dates still fit the digit/separator shape — the
    * [[scrub]] pipeline shields `dddd-dd-dd` / `dd-dd-dddd` dates before
    * this pattern runs (see [[shieldDates]]).
    */
  val PhonePattern = "\\+?[0-9](?:[()\\s.-]{0,2}[0-9]){6,}"

  /** Calendar-date shapes the phone pattern would otherwise eat:
    * `dddd[-/.]dd[-/.]dd` (ISO) and `dd[-/.]dd[-/.]dddd` (EU/US), and
    * ONLY when not embedded in a longer digit/separator run — an
    * unanchored `dd[-/.]dd[-/.]dddd` matches the '23-45-6789' tail of an
    * SSN-shaped '123-45-6789', shielding it out of the phone redaction
    * (an under-redaction). RE2 has no lookaround, so the boundaries are
    * consuming capture groups re-emitted by the replacement: group 1
    * (start-of-string or a non-digit/non-separator char), groups 2–4 the
    * ISO parts, 5–7 the EU parts, group 8 (non-digit or end). Eight
    * capture groups, ≤ 9 so `\1`-style backreferences work in every
    * RE2-compatible replacement syntax (DuckDB included).
    */
  val DatePattern =
    "(^|[^0-9./-])(?:([0-9]{4}[-/.])([0-9]{2}[-/.])([0-9]{2})|([0-9]{2}[-/.])([0-9]{2}[-/.])([0-9]{4}))([^0-9]|$)"

  /** Dotted-quad IPv4 (also matches technically-invalid octets > 255 —
    * preferable for a scrub: over-redact, never leak).
    */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Colon-separated IPv6, full or `::`-compressed (a compressed run has
    * an EMPTY group between colons, hence {0,4}). Also eats hh:mm:ss
    * timestamps — deliberate: over-redact, never leak.
    */
  val Ipv6Pattern = "\\b(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}\\b"

  /** 13–19 digit runs with optional space/dash separators (card-shaped). */
  val CardPattern = "\\b[0-9](?:[0-9 -]{11,17})[0-9]\\b"

  def redactEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, token)

  def redactPhones(text: Column, token: String = "<PHONE>"): Column =
    regexp_replace(text, PhonePattern, token)

  /** Date shield: inserts a `\u0001` sentinel after each date component
    * so the phone pattern (whose separator class excludes `\u0001`)
    * cannot span a calendar date; [[unshieldDates]] strips the sentinel
    * afterwards. Non-participating groups substitute as empty in both
    * java.util.regex and RE2/DuckDB, so one replacement string covers
    * both alternatives.
    */
  def shieldDates(text: Column): Column =
    regexp_replace(text, DatePattern, "$1$2\u0001$3\u0001$4$5\u0001$6\u0001$7$8")

  def unshieldDates(text: Column): Column =
    regexp_replace(text, "\u0001", "")

  def redactIps(text: Column, token: String = "<IP>"): Column =
    regexp_replace(regexp_replace(text, Ipv4Pattern, token), Ipv6Pattern, token)

  def redactCards(text: Column, token: String = "<CARD>"): Column =
    regexp_replace(text, CardPattern, token)

  /** The full scrub, in an order that matters: emails before phones (a
    * local-part can contain digits), IPs before phones (dotted quads are
    * digit runs), cards before phones (cards are longer digit runs and
    * would otherwise be half-eaten by the phone pattern), and calendar
    * dates shielded across BOTH digit-run passes — the card pattern eats
    * adjacent dates ("2024-01-02 2024-01-03" is a 21-char digit/sep run)
    * just as readily as the phone pattern does, so the shield must come
    * before it (dates are training signal, not PII — eating every ISO
    * date is a silent precision loss). Standard card groupings
    * (4-4-4-4, digits with spaces) never match the date shapes, so
    * shield-before-cards costs no card recall.
    *
    * The shield runs TWICE: its boundary groups CONSUME a character
    * (RE2 has no lookaround), so in a run of adjacent dates each match
    * eats the separator the NEXT date needs as its left boundary and
    * every other date goes unshielded — straight into the digit-run
    * redactions. One pass shields at least every other date in any such
    * run, so no two unshielded dates stay adjacent and a second pass
    * provably catches the rest.
    */
  def scrub(text: Column): Column =
    unshieldDates(redactPhones(redactCards(shieldDates(shieldDates(
      redactIps(redactEmails(text)))))))

  /** Count of matches for auditing (how much PII a corpus slice carries)
    * without materializing the scrubbed text: size of the split-by-pattern
    * array minus one — map-side, codegen'd.
    */
  def piiCount(text: Column, pattern: String): Column =
    size(split(text, pattern)) - 1
}
