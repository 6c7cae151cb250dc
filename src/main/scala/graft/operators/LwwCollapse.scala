package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-writer-wins collapse: reduce a batch of change events to exactly
  * one winning event per url, ordered by (warc_ts, seq) with the `seq`
  * tie-break made explicit (the reference's INSERT OR REPLACE takes an
  * arbitrary last write — /root/reference/convoetl/loaders/sqlite.py:
  * 320–346 / analytics/sqlite/message_analytics_saver.py:48–89; we must
  * be deterministic or replay equivalence fails under repartitioning,
  * SURVEY §7.4).
  *
  * Scale design: the default path is one aggregate with `max_by` over a
  * (warc_ts, seq) struct. Catalyst plans this as partial (map-side)
  * aggregation followed by a final aggregation after the shuffle — hot
  * urls are pre-combined on every input partition BEFORE the shuffle, so
  * a key receiving 10^7 duplicate updates ships at most
  * `numInputPartitions` pre-collapsed rows through the exchange. That is
  * exactly the skew bound the explicit two-stage salted variant gives,
  * with zero extra code on the hot path; the salted variant below exists
  * for operators that cannot partially aggregate (window-function shape)
  * and as the documented fallback.
  *
  * NB on plan shape: `max_by`'s struct buffer planizes as SortAggregate
  * in Spark 4 (partial aggregation preserved, but each partition sorts
  * by url first) — acceptable for this standalone batch operator; the
  * ingest HOT PATH uses the primitive-buffer [[graft.plans.LwwSeq]]
  * HashAggregate instead (measured ~10× at 64M events; PLANS.md).
  */
object LwwCollapse {

  /** Ordering key: struct comparison is lexicographic, so
    * (warc_ts, seq) max == latest warc_ts, ties broken by highest seq.
    */
  private def ordKey = struct(col("warc_ts"), col("seq"))

  /** Collapse to one row per url. Input: feed-schema DataFrame (seq, op,
    * url, warc_ts, html, text, lang, extra_score). Output: same columns,
    * one row per url — including tombstone winners (op = 'D'); callers
    * decide whether to drop or retain them.
    */
  def collapse(batch: DataFrame): DataFrame = {
    val payload = struct(batch.columns.map(col).toIndexedSeq: _*)
    batch
      .groupBy(col("url"))
      .agg(max_by(payload, ordKey).as("w"))
      .select(col("w.*"))
  }

  /** Explicit two-stage salted collapse (north_rule: "salts hot
    * url-prefix keys"). Stage 1 collapses per (url, salt) — the salt
    * splits a hot key across `saltBuckets` reducers; stage 2 collapses
    * the ≤saltBuckets survivors per url. Semantically identical to
    * `collapse` (property-tested); useful shape when the per-key work is
    * not an associative aggregate.
    */
  def collapseSalted(batch: DataFrame, saltBuckets: Int = 16): DataFrame = {
    val payload = struct(batch.columns.map(col).toIndexedSeq: _*)
    val salted = batch.withColumn("_salt", pmod(col("seq"), lit(saltBuckets)))
    val stage1 = salted
      .groupBy(col("url"), col("_salt"))
      .agg(max_by(payload, ordKey).as("w"))
      .select(col("w.*"))
    stage1
      .groupBy(col("url"))
      .agg(max_by(struct(stage1.columns.map(col).toIndexedSeq: _*), ordKey).as("w"))
      .select(col("w.*"))
  }

  /** Heavy-hitter probe for diagnostics/adaptive salting: urls whose
    * event count in the batch exceeds `threshold`.
    */
  def heavyHitters(batch: DataFrame, threshold: Long): DataFrame =
    batch.groupBy(col("url")).count().filter(col("count") > threshold)
}
