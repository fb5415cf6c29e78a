package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar functions (SURVEY.md §2.11). All pure built-in
  * Catalyst expressions (higher-order functions — codegen-friendly, no UDFs),
  * and all *portable*: each has an exact DuckDB formulation so the oracle can
  * hash-match. That rules out xxhash64/md5-to-int (engine-specific) in favor
  * of an explicit polynomial rolling hash.
  */
object TextFns {
  val HashMod = 1000000007L

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from raw text (w consecutive tokens joined by a
    * space), with duplicates — callers dedupe when set semantics are needed.
    * One expression evaluation per row ([[graft.functions.expr.TokenShingles]]);
    * see its scaladoc for why the HOF composition is a recompute trap.
    */
  def shinglesFromText(text: Column, w: Int): Column =
    org.apache.spark.sql.graftshim.GraftColumn
      .lift1(graft.functions.expr.TokenShingles(_, w))(text)

  /** HOF reference formulation over a pre-split token array — mirrors the
    * DuckDB oracle fragment; property-tested equal to [[shinglesFromText]].
    */
  def shinglesHof(toks: Column, w: Int): Column =
    // guard: sequence(1, 0) DESCENDS in Spark, so a doc shorter than w must
    // short-circuit to an empty array rather than slice(toks, 0, w).
    when(size(toks) < lit(w), array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - (w - 1)),
          i => array_join(slice(toks, i, lit(w)), " ")))

  /** Polynomial rolling hash over characters: fold of (acc*31 + ascii(c)) mod
    * 1e9+7. Exactly reproducible in DuckDB via list_reduce — the portable
    * stand-in for a fingerprint/MinHash base hash. Hot-path form is the
    * codegen'd [[graft.functions.expr.StringPolyHash]]; [[rollingHashHof]]
    * is the portable reference formulation, property-tested equal.
    */
  def rollingHash(s: Column): Column =
    org.apache.spark.sql.graftshim.GraftColumn
      .lift1(graft.functions.expr.StringPolyHash.apply)(s)

  /** Banded edit distance with prefix/suffix strip: Levenshtein(a, b) if
    * <= t, else -1 — bit-equal to the thresholded builtin for BMP text
    * (see [[graft.functions.expr.BandedEditDistance]]).
    */
  def bandedEditDist(a: Column, b: Column, t: Int): Column =
    org.apache.spark.sql.graftshim.GraftColumn
      .lift2(graft.functions.expr.BandedEditDistance(_, _, t))(a, b)

  /** Higher-order-function form mirroring the DuckDB oracle fragment. */
  def rollingHashHof(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(HashMod)))

  /** i-th member of the MinHash affine hash family applied to a base hash. */
  def affineHash(h: Column, i: Column): Column =
    pmod((lit(3) + lit(2) * i) * h + (lit(7) + lit(11) * i), lit(HashMod))

  /** Count of tokens that are stopwords (fixed tiny list present in the
    * fixture vocabulary).
    */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin("the", "a")))
}
