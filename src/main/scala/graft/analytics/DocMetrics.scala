package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-document curation metrics as PURE column expressions — the one
  * definition shared by the batch queries (t08 quality, t16 repetition)
  * and the ingest-maintained metrics table ([[graft.operators
  * .MetricsIndex]]): both paths evaluate literally the same `Column`
  * trees, so "maintained == batch recompute" holds by construction for
  * the per-row math and the spec only has to pin the maintenance
  * plumbing (supersession, tombstones, exactly-once).
  *
  * Everything here is expression-only and per-row (no explode, no
  * aggregation, no shuffle): the repetition stats — which the batch t16
  * computes with an explode → two hash aggregates — are re-expressed as
  * a sort + run-length fold over the doc's own 2-gram array
  * (higher-order `aggregate`), O(L log L) per doc and embarrassingly
  * parallel. That is what makes the metrics affordable ON THE INGEST
  * PATH at 100 TB: they ride the epoch batch as derived columns
  * (SURVEY §3.3 — metric expressions run on the batch before MERGE) and
  * add zero exchanges to the sink.
  *
  * Reference analog: the enrichment metrics the reference attaches per
  * ingested batch (/root/reference/convoetl/flows/generic_analytics_
  * flow_simple.py:53–99) — here per-doc instead of per-message, and
  * maintained incrementally instead of recomputed.
  */
object DocMetrics {

  /** English stopword set — shared with the language-ID / quality
    * scoring family (TextQueries t07/t08).
    */
  val stopEn: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "data", "value")

  private def words(c: Column): Column = split(c, " ")

  /** Whitespace token count (t09's ws_tokens). */
  def wsTokens(text: Column): Column = size(words(text)).cast("long")

  /** Quality score: length score (0.6 weight, saturating at 500 chars)
    * + English-stopword ratio (0.4) — t08/t13's `qualityCol`, rounded
    * to 4 places.
    */
  def quality(text: Column): Column = {
    val stopRatio = size(filter(words(lower(text)),
      w => w.isInCollection(stopEn))).cast("double") /
      nullif(size(words(text)), lit(0))
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    round(lenScore * 0.6 + stopRatio * 0.4, 4)
  }

  /** 2-gram repetition stats as ONE expression:
    * `struct(top_cnt, n_grams, dup_grams)` — identical values to the
    * batch t16 aggregate (most-frequent-2-gram count, total 2-grams,
    * count of 2-gram occurrences whose gram appears more than once).
    * NULL for docs with fewer than two words (t16 has no row for them).
    *
    * Shape: sort the doc's 2-gram array, then a single left fold
    * counting run lengths — max run = top_cnt, sum of runs > 1 =
    * dup_grams. No explode, no shuffle; the doc never leaves its row.
    */
  def repStats(text: Column): Column = {
    val w = words(text)
    // zip_with over two slices of the words array, NOT a transform
    // whose lambda slices `w` by index: referencing the derived
    // split() inside a lambda re-evaluates it per ELEMENT (the t17
    // trap — O(L²) per doc); zip_with's arguments are evaluated once
    // per row and its lambda touches only its own element args. Gram
    // values are identical (w[i] + " " + w[i+1]; split() never yields
    // nulls, so concat == concat_ws here).
    val len = greatest(size(w) - 1, lit(0))
    val grams = sort_array(zip_with(
      slice(w, lit(1), len), slice(w, lit(2), len),
      (a, b) => concat(a, lit(" "), b)))
    // fold state: (prev gram, current run length, best finished run,
    // finished-duplicate occurrence count); "" is a safe sentinel —
    // a 2-gram always contains a space
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("top"), lit(0L).as("dup"))
    // the finish lambda emits the FINAL (top_cnt, n_grams, dup_grams)
    // struct directly: building it outside from two GetStructField
    // references duplicated the whole fold subtree in the projection
    // (interpreted HOF projections do no common-subexpression
    // elimination — round-6 plan finding, 2× per-row cost)
    val folded = aggregate(grams, zero,
      (acc, x) => struct(
        x.as("prev"),
        when(x === acc("prev"), acc("run") + lit(1L))
          .otherwise(lit(1L)).as("run"),
        when(x === acc("prev"), acc("top"))
          .otherwise(greatest(acc("top"), acc("run"))).as("top"),
        when(x === acc("prev"), acc("dup"))
          .otherwise(acc("dup") + when(acc("run") > 1L, acc("run"))
            .otherwise(lit(0L))).as("dup")),
      acc => struct(
        greatest(acc("top"), acc("run")).as("top_cnt"),
        (size(w) - 1).cast("long").as("n_grams"),
        (acc("dup") + when(acc("run") > 1L, acc("run"))
          .otherwise(lit(0L))).as("dup_grams")))
    when(size(w) >= 2, folded)
  }
}
