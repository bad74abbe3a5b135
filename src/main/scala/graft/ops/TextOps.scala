package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable text-analysis operators (the surface behind t01–t06): token
  * stats, marker-based language ID, quality gating, fingerprints, BPE-ish
  * pre-tokenization, and deterministic hash splits. All pure per-row
  * `Column` expressions — embarrassingly parallel scans at any scale.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenizer pieces: letter runs, digit runs, single
    * punctuation — the shape byte-pair encoders start from. */
  def regexPieces(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Marker hit count: how many tokens are in `words`. Native
    * [[graft.functions.MarkerCount]] kernel — same semantics as
    * `size(filter(toks, x -> x IN (words)))` without the interpreted
    * per-element lambda. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    graft.functions.FoldFunctions.markerCount(toks, words)

  /** Total character count of a token array. Native
    * [[graft.functions.TokenCharSum]] kernel — same semantics as
    * `aggregate(toks, 0L, (acc, x) -> acc + length(x))` without the
    * interpreted per-element lambda. */
  def tokenCharSum(toks: Column): Column =
    graft.functions.FoldFunctions.tokenCharSum(toks)

  /** Marker-token language ID over a token array: the language whose
    * marker set hits most (first in `markers` wins ties, "und" when none
    * hit). `markers` is (langCode → marker words), checked in order. */
  def langId(toks: Column, markers: Seq[(String, Seq[String])]): Column = {
    val hitCols = markers.map { case (lang, words) => lang -> markerHits(toks, words) }
    hitCols.zipWithIndex.foldRight(lit("und")) { case (((lang, h), i), els) =>
      val laterMax = hitCols.drop(i + 1).map(_._2)
      val ge = laterMax.foldLeft(h > 0)((acc, other) => acc && h >= other)
      when(ge, lang).otherwise(els)
    }
  }

  /** Quality bucket from token stats: TOO_SHORT / STOPWORD_HEAVY /
    * SHORT_TOKENS / OK — the standard pretraining quality gate. */
  def qualityBucket(nTokens: Column, stopRatio: Column, meanTokLen: Column,
      minTokens: Int = 25, maxStopRatio: Double = 0.125,
      minMeanTokLen: Double = 3.5): Column =
    when(nTokens < minTokens, "TOO_SHORT")
      .when(stopRatio > maxStopRatio, "STOPWORD_HEAVY")
      .when(meanTokLen < minMeanTokLen, "SHORT_TOKENS")
      .otherwise("OK")

  /** Modular rolling hash over per-token codes (length·131 ⊕ first char):
    * the cheap content fingerprint; fold stays < 2^51 so BIGINT semantics
    * agree across engines. Native [[graft.functions.RollingFingerprint]]
    * kernel — same fold as the `aggregate`/`transform` HOF pair it
    * replaced, without the two interpreted lambdas per token. */
  def rollingFingerprint(toks: Column): Column =
    graft.functions.FoldFunctions.rollingFingerprint(toks)

  /** Deterministic mixture sampling — the training-data "data mixing"
    * primitive: keep a row iff its stable md5 bucket (of `id`, salted so
    * the decision is independent of [[hashSplit]]) falls under the
    * per-`key` rate. Rates are INTEGER thresholds per `denom` (e.g.
    * en → 5000/10000 = down-sample English to 50%), so the keep decision
    * is exact integer arithmetic — reproducible across engines, re-runs,
    * and repartitioning, unlike TABLESAMPLE/rand(seed). Keys absent from
    * `rates` keep everything (threshold = `denom`). */
  def mixtureSample(id: Column, key: Column, rates: Map[String, Int],
      denom: Int = 10000): Column = {
    require(rates.values.forall(r => r >= 0 && r <= denom),
      s"rates must lie in [0, $denom]")
    val threshold = rates.foldLeft(lit(denom)) { case (els, (k, r)) =>
      when(key === k, lit(r)).otherwise(els)
    }
    md5Bucket(concat(id.cast("string"), lit("#mix")), denom) < threshold
  }

  /** Deterministic stratified sampling rank: 1-based position of the row
    * inside its `stratum` under the stable md5-of-`id` order (salted
    * `#strat`, so the draw is independent of [[hashSplit]] and
    * [[mixtureSample]]; exact hash ties — ~n²/2³² per stratum — resolve
    * by `id`). `rank <= n` is then an EXACT n-per-stratum sample,
    * reproducible across engines, re-runs and repartitioning, unlike
    * TABLESAMPLE/rand(seed). One shuffle on the stratum key plus a
    * per-stratum sort; when one stratum dominates a 100 TB corpus,
    * pre-filter with a hash threshold sized from approximate stratum
    * counts (keep hash < c·n/|stratum| of the key space), then exact-rank
    * only the survivors — the same two-phase shape as top-k. */
  def stratifiedRank(stratum: Column, id: Column): Column = {
    import org.apache.spark.sql.expressions.Window
    row_number().over(Window.partitionBy(stratum).orderBy(
      conv(substring(md5(concat(id.cast("string"), lit("#strat"))), 1, 8), 16, 10)
        .cast("long"),
      id))
  }

  /** The engine's stable-bucket primitive: first 8 md5-hex chars of `s`
    * as a long, mod `denom`. ONE definition shared by [[hashSplit]] and
    * [[mixtureSample]] — every DuckDB oracle replays exactly
    * `CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % denom`, so the
    * arithmetic must never fork between call sites. */
  private def md5Bucket(s: Column, denom: Int): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % denom

  /** One BPE merge step over a symbol array: replace every adjacent
    * occurrence of (`a`, `b`) with the merged symbol `a+b`, simultaneously.
    * Requires `a != b`, which guarantees occurrences cannot overlap (an
    * overlap at positions i, i+1 would force a = b), so "merge everywhere
    * at once" is unambiguous — no greedy left-to-right tiebreak — and the
    * step is a pure per-row array expression replayable in SQL. Used by
    * the t29 BPE trainer; pairs with the same left/right symbol are simply
    * never chosen as merge candidates (the trainer filters them out). */
  def bpeMergePair(syms: Column, a: String, b: String): Column = {
    require(a != b, "bpeMergePair requires distinct symbols: a self-pair " +
      "(a,a) has ambiguous overlapping occurrences (e.g. [a,a,a])")
    // arrays shorter than 2 contain no pair and pass through unchanged —
    // also the guard against Spark's DESCENDING sequence(1, 0) == [1, 0],
    // whose out-of-range element_at would crash under ANSI mode
    when(size(syms) < 2, syms).otherwise(transform(
      filter(sequence(lit(1), size(syms)), i =>
        !(i > 1 &&
          element_at(syms, (i - 1).cast("int")) === a &&
          element_at(syms, i.cast("int")) === b)),
      i => when(
        element_at(syms, i.cast("int")) === a &&
          i < size(syms) &&
          element_at(syms, (i + 1).cast("int")) === b,
        lit(a + b)).otherwise(element_at(syms, i.cast("int")))))
  }

  /** Deterministic train/valid/test assignment from a stable id: md5
    * bucket in [0, 100), stable under repartitioning/re-runs (unlike
    * TABLESAMPLE/rand(seed), which are partitioning-dependent).
    * `trainPct`/`validPct` in percent; the rest is "test". */
  def hashSplit(id: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    val bucket = md5Bucket(id.cast("string"), 100)
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + validPct, "valid")
      .otherwise("test")
  }
}
