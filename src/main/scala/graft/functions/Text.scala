package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines. All pure
  * Column expressions (whole-stage codegen, no UDFs) so they run at
  * full scan speed over 100 TB of documents.
  */
object Text {

  /** Whitespace tokens of a document. Empty text → empty array. */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: split on whitespace AND punctuation
    * boundaries, so "don't stop." counts 5 pieces (don, ', t, stop, .).
    * A cheap proxy for tokenizer cost without shipping a vocab. */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= ""))

  /** Ratio of punctuation chars to total chars (0 for empty text). */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0 || len.isNull, lit(0.0))
      .otherwise(
        (len - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double")
          / len.cast("double"))
  }

  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "that", "for", "on", "with", "as", "was", "at", "by")

  /** Unicode NFC normalization (precomposed canonical form) — run
    * BEFORE any exact-hash text operation: scraped corpora mix
    * precomposed ("é") and decomposed ("e"+U+0301) encodings of the
    * same glyph, which hash differently and silently defeat exact
    * dedup keys, fingerprints, and shingles. Codegen'd JDK-normalizer
    * kernel ([[graft.plans.NfcNormalize]]); DuckDB's nfc_normalize is
    * the cross-engine twin. */
  def normalizeNfc(c: Column): Column = graft.plans.native.nfcNormalize(c)

  /** Count of (lowercased) English stopword tokens — the integer-exact
    * building block [[stopwordRatio]] and the linear classifier share. */
  def stopwordCount(c: Column): Column =
    size(filter(tokens(lower(c)), t => t.isin(stopwords.map(lit(_)): _*)))

  /** Count of punctuation characters. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))

  /** Fraction of tokens that are (lowercased) English stopwords. */
  def stopwordRatio(c: Column): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(stopwordCount(c).cast("double") / n.cast("double"))
  }

  /** Mean token length in characters (0 for empty text). */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    val n = size(toks)
    when(n === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / n.cast("double"))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length docs, sane
    * punctuation density, and a natural stopword ratio. Deliberately a
    * closed-form arithmetic expression so the same formula is
    * reproducible in any SQL engine (the DuckDB oracle re-states it). */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 4.0)
    val stopScore = least(stopwordRatio(c) * 3.0, lit(1.0))
    round((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3), 6)
  }

  /** Language-marker tables for the n-gram/marker-word language-ID
    * heuristic. Word-boundary regex hit counts per language; argmax
    * wins, ties break alphabetically, zero hits → "und". */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht", "das", "ein", "zu"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "es", "por"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pas")
  )

  private def markerHits(c: Column, words: Seq[String]): Column = {
    val toks = tokens(lower(c))
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
  }

  /** Marker-word language ID over `langMarkers`. Deterministic:
    * max hits; ties broken by language code order (de<en<es<fr). */
  def langId(c: Column): Column = {
    val scored = langMarkers.map { case (code, words) =>
      struct(markerHits(c, words).as("hits"), lit(code).as("code"))
    }
    // array_max on struct(hits, code): max hits, then max code — to get
    // alphabetical tie-break we invert via min over (-hits, code).
    val best = array_min(array(scored.map(s =>
      struct((-s.getField("hits")).as("neg"), s.getField("code").as("code"))): _*))
    when(best.getField("neg") === 0, lit("und"))
      .otherwise(best.getField("code"))
  }

  /** Canonical text normalization for fingerprinting: lowercase,
    * collapse whitespace, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Normalized-text md5 fingerprint — exact-dup key that is stable
    * across engines (md5 is bit-identical everywhere). */
  def fingerprint(c: Column): Column = md5(normalizeText(c).cast("binary"))

  /** 56-bit rolling polynomial hash of the normalized text (base 31,
    * masked to 56 bits each step so the multiply never overflows a Long
    * under ANSI mode) — cheap shard-stable fingerprint when md5's 128
    * bits are overkill. */
  def rollingHash64(c: Column): Column = {
    val mask = (1L << 56) - 1
    aggregate(
      split(normalizeText(c), ""),
      lit(0L),
      (acc, ch) => (acc * lit(31L) +
        when(ch === "", lit(0L)).otherwise(ascii(ch).cast("long"))).bitwiseAND(lit(mask)))
  }

  /** Word n-gram shingles (space-joined) of the normalized text.
    * Documents shorter than n words yield the whole text as one shingle
    * so they can still match exact duplicates. */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(normalizeText(c))
    val cnt = size(toks)
    when(cnt < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), cnt - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }
}
