package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * stopword/quality ratios, n-gram shingles, language-ID scoring, and a
  * deterministic rolling-hash fingerprint. All pure Catalyst expressions
  * (split / higher-order functions / regexp) — codegen'd, no UDFs, and
  * embarrassingly parallel per row at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token count: runs of letters, runs of digits, or single other
    * non-space chars (a cheap proxy for subword token counting).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** How many tokens fall in `words`. */
  def wordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words: _*)))

  /** Ratio of stopword tokens (the quality-scoring signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    wordHits(tokens(text), stopwords).cast("double") / size(tokens(text))

  /** Ratio of characters outside [a-z ]. */
  def nonAlphaRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z ]", "")).cast("double") / length(text)

  /** Word n-gram shingles: n consecutive whitespace tokens joined by a single
    * space. Uses 1-based `sequence` indices with 1-based `element_at` access.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
  }

  /** Position-weighted rolling fingerprint: sum(i * ascii(text[i])) mod p.
    * Order-sensitive (a permutation of the text changes it), deterministic,
    * and exactly reproducible in any SQL engine with list lambdas.
    */
  def fingerprint(text: Column): Column =
    (aggregate(
      sequence(lit(1), length(text)),
      lit(0L),
      (acc, i) => acc + i.cast("long") * ascii(substr(text, i, lit(1)))
    ) % 1000000007L).cast("long")

  /** Fraction of word trigrams that are repeats of an earlier trigram in the
    * same document — the classic intra-document repetition quality filter
    * for LLM corpora (boilerplate, scraper loops, and degenerate generations
    * score high). Counting (total - distinct) over the shingle array keeps
    * it one codegen'd pass per row: no explode, no shuffle, linear at any
    * corpus size. Docs under n tokens have no n-grams and score 0.
    */
  def dupShingleCounts(text: Column, n: Int): (Column, Column) = {
    val toks = tokens(text)
    val tri = wordShingles(text, n)
    val nGram = when(size(toks) >= n, size(toks) - (n - 1)).otherwise(0)
    val nDup = when(size(toks) >= n, size(tri) - size(array_distinct(tri))).otherwise(0)
    (nGram, nDup)
  }

  /** Per-language stopword marker sets for the language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "und", "die", "das"))
}
