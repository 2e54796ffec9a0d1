package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pushdown-able fuzzy-match prefilter columns on the term dictionary —
  * the role Levenshtein automata over the FST play in the reference
  * [U lucene/core/.../util/automaton/LevenshteinAutomata.java,
  * FuzzyTermsEnum]: instead of scanning every term and running the full
  * edit-distance DP, the dictionary stores two tiny derived columns and
  * the scan is pruned BEFORE the levenshtein ever runs:
  *
  *  - `tlen`  — term length. lev(t, w) ≤ e ⇒ |len(t) − len(w)| ≤ e, a
  *    plain integer range predicate Parquet pushes down (row-group
  *    min/max pruning on the sorted dictionary).
  *  - `cmask` — 37-bit character-presence bitmask (a–z → 0–25,
  *    0–9 → 26–35, anything else → 36). Each edit removes at most one
  *    DISTINCT character of w from t, so
  *    bit_count(cmask(w) & ~cmask(t)) ≤ e is sound; extra characters in
  *    t only shrink the intersection, never excluding a true match.
  *
  * Both filters are exact-superset prefilters: the final banded
  * `levenshtein(term, w, e)` decides membership, so results are
  * value-identical to the unpruned scan. */
object TermFilters {

  /** Bit index for one character — keep in sync with `cmaskSql`. */
  @inline private def bitOf(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else 36

  /** Driver-side mirror of the `cmask` column for the query word. */
  def cmaskOf(word: String): Long =
    word.foldLeft(0L)((acc, c) => acc | (1L << bitOf(c)))

  /** `cmask` over a string column — built-ins only (codegen). */
  private def cmaskSql(c: String): String =
    s"""aggregate(split($c, ''), CAST(0 AS BIGINT), (acc, c) ->
      |  acc | shiftleft(CAST(1 AS BIGINT),
      |    CASE WHEN ascii(c) BETWEEN 97 AND 122 THEN ascii(c) - 97
      |         WHEN ascii(c) BETWEEN 48 AND 57 THEN ascii(c) - 22
      |         ELSE 36 END))""".stripMargin

  /** Append (<lenCol>, <maskCol>) filter columns derived from `src`
    * (term-stats build + compaction; the suggest gram table reuses the
    * same prefilter shape on its `gram` column). */
  def withFilterCols(df: DataFrame, src: String = "term",
                     lenCol: String = "tlen", maskCol: String = "cmask"): DataFrame =
    df.withColumn(lenCol, length(col(src)))
      .withColumn(maskCol, expr(cmaskSql(src)))

  /** Prune a dictionary scan to the candidates that can possibly be
    * within `maxEdits` of `word` (no-op on legacy frames without the
    * filter columns — still correct, just unpruned). */
  def fuzzyPruned(dict: DataFrame, word: String, maxEdits: Int,
                  lenCol: String = "tlen", maskCol: String = "cmask"): DataFrame =
    if (!dict.columns.contains(lenCol)) dict
    else {
      val wmask = cmaskOf(word)
      dict
        .filter(col(lenCol).between(word.length - maxEdits, word.length + maxEdits))
        .filter(bit_count(lit(wmask).bitwiseAND(bitwise_not(col(maskCol)))) <= maxEdits)
    }

  /** Banded levenshtein predicate (O(len·e) DP, early abandon). */
  def withinEdits(term: Column, word: String, maxEdits: Int): Column =
    levenshtein(term, lit(word), maxEdits).between(0, maxEdits)
}
