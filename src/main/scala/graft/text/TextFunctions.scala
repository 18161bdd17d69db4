package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data-pipeline work over `documents`:
  * tokenization, token counting, language-ID heuristic, quality scoring and
  * fingerprinting. All pure Catalyst column expressions (codegen'd, no
  * UDFs), all deterministic, all reproducible in ANSI SQL for the DuckDB
  * oracle.
  *
  * Determinism notes for the oracle: every floating-point value here is
  * computed from IDENTICAL scalar operands in both engines (ratios of
  * per-row integer counts — never order-dependent sums), so doubles match
  * bit-for-bit and `round(x, 4)` agrees.
  */
object TextFunctions {

  /** Whitespace tokenization, lowercased. `split` on \s+ after trim matches
    * DuckDB's `regexp_split_to_array(trim(lower(text)), '\s+')`.
    */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count approximation: alpha runs, digit runs and single
    * punctuation marks each count as one piece (a cheap, deterministic
    * stand-in for a real tokenizer's piece count). regexp_extract_all with
    * an alternation — no lookarounds, so the same pattern runs on RE2
    * engines (the DuckDB oracle) as well as Java regex.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(trim(text)),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Language marker stopword lists (tiny, deterministic n-gram-free
    * heuristic — the point is the operator shape, not linguistic accuracy).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "les", "et", "est", "une", "des", "du"))

  /** Number of tokens that appear in `markers`. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(x => x: Any): _*))).cast("long")

  /** Language-ID heuristic: argmax of marker-hit counts with a fixed
    * priority order (en, es, de, fr) on ties; "und" (undetermined) when no
    * marker hits at all.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = markerHits(t, langMarkers("en"))
    val es = markerHits(t, langMarkers("es"))
    val de = markerHits(t, langMarkers("de"))
    val fr = markerHits(t, langMarkers("fr"))
    val m = greatest(en, es, de, fr)
    when(m === 0, lit("und"))
      .when(en === m, lit("en"))
      .when(es === m, lit("es"))
      .when(de === m, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Quality score in [0,1]:
    * 0.5·min(tokens/50, 1) + 0.3·stopword-ratio + 0.2·alpha-space ratio,
    * rounded to 4 decimals. All English-stopword based — a length/
    * punctuation/stopword composite like the classic C4/Gopher filters.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val stopRatio = markerHits(t, langMarkers("en")).cast("double") / nTok
    val alphaRatio =
      length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
        length(text).cast("double")
    round(lit(0.5) * lenScore + lit(0.3) * stopRatio + lit(0.2) * alphaRatio, 4)
  }

  /** Whole-document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Winnowing-style shingle fingerprint: minimum md5 over the document's
    * word k-shingles (rolling window of k tokens). Equal shingle
    * fingerprints ⇒ documents share their minimal shingle — a cheap
    * near-dup prefilter.
    */
  def minShingleFingerprint(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    val shingles = transform(
      sequence(lit(1), greatest(size(t) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(t, i, lit(k))))
    array_min(transform(shingles, s => md5(s)))
  }
}
