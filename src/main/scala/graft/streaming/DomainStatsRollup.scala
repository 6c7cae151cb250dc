package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.AdditiveRollup

/** Per-domain stats dimension maintained by the INGEST PATH on every
  * epoch — the web analog of the reference's `_update_user_stats` users
  * table (/root/reference/convoetl/loaders/sqlite.py:205–236: first_seen,
  * last_seen, additive total per user on each batch). Keyed on the url
  * host; wired into CdcIngest.start(statsDir = …) so the rollup advances
  * exactly-once alongside the main MERGE (each sink carries its own
  * epoch ledger — a crash between the two replays only the one that
  * missed).
  */
object DomainStatsRollup {

  /** One epoch's partial aggregate (the only pass over the batch). */
  def delta(batch: DataFrame): DataFrame =
    batch
      .groupBy(regexp_extract(col("url"), "^https?://([^/]+)", 1).as("domain"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("total_deletes"),
        min(col("warc_ts")).as("first_seen"),
        max(col("warc_ts")).as("last_seen"),
        max(col("seq")).as("max_seq"))

  val combine: Seq[(String, AdditiveRollup.Combine)] = Seq(
    "total_events" -> AdditiveRollup.add,
    "total_deletes" -> AdditiveRollup.add,
    "first_seen" -> AdditiveRollup.minOf,
    "last_seen" -> AdditiveRollup.maxOf,
    "max_seq" -> AdditiveRollup.maxOf)

  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             epochId: Long): Boolean =
    AdditiveRollup.upsert(spark, dir, delta(batch), Seq("domain"), epochId, combine)

  def read(spark: SparkSession, dir: String): DataFrame =
    AdditiveRollup.read(spark, dir)
}
