package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.CdcSchema
import graft.table.{EpochStat, FileEntry, LakeTable, Snapshot}

/** Idempotent MERGE INTO of one change-event batch into the lake table.
  *
  * Reference analog: `INSERT … ON CONFLICT DO UPDATE` /
  * `INSERT OR REPLACE` upserts (/root/reference/convoetl/loaders/
  * sqlite.py:205–236, 320–346) plus the BigQuery MERGE design
  * (workflow_suggestions.md:406–425) — re-expressed as copy-on-write
  * bucket rewrite + snapshot commit (SURVEY §2.1 S7/S8, §7.1.5).
  *
  * Exactly-once: the epochId is recorded in the committed manifest; a
  * redelivered epoch (foreachBatch retry after crash) is detected and
  * skipped BEFORE any work, so the sink is idempotent end-to-end.
  *
  * Scale shape: the batch is LWW-collapsed first (map-side combine bounds
  * hot-key skew), then only the url-hash buckets the batch actually
  * touches are read back and rewritten — a batch touching 3 of P buckets
  * costs O(3/P · tableSize) I/O, independent of total table size. The
  * target∪source resolution reuses the same associative collapse (a
  * union-collapse IS a full-outer merge with LWW resolution, without the
  * join: fewer shuffles, same semantics — both sides are hashed once by
  * url).
  */
object MergeInto {

  final case class MergeResult(
      snapshot: Snapshot, applied: Boolean,
      events: Long, upserts: Long, deletes: Long, durationMs: Long)

  /** Align an incoming batch (any additive schema version) to the latest
    * feed schema by NAME — the Catalyst-resolved column-mapping step
    * (north_rule): missing columns become typed nulls, extra columns are
    * dropped, types are cast. Column order in the source is irrelevant.
    */
  def alignToLatest(batch: DataFrame): DataFrame = {
    val have = batch.columns.toSet
    val cols = CdcSchema.latest.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    batch.select(cols.toIndexedSeq: _*)
  }

  /** Feed-schema rows → table-schema rows (+ bucket routing column). */
  private def toTableRows(df: DataFrame, numBuckets: Int): DataFrame =
    df.select(
      col("url"),
      xxhash64(col("url")).as("url_hash"),
      col("warc_ts"),
      col("seq"),
      (col("op") === "D").as("tombstone"),
      col("html"), col("text"), col("lang"), col("extra_score"))
      .withColumn("bucket", pmod(col("url_hash"), lit(numBuckets)).cast("int"))

  /** Existing table rows → same shape as toTableRows output. */
  private def tableRowsWithBucket(df: DataFrame, numBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(col("url_hash"), lit(numBuckets)).cast("int"))

  def merge(spark: SparkSession, tableDir: String, batchIn: DataFrame,
            epochId: Long): MergeResult = {
    val t0 = System.nanoTime()
    val snap = LakeTable.load(tableDir)
    if (snap.committedEpochs.contains(epochId))
      return MergeResult(snap, applied = false, 0L, 0L, 0L, 0L)

    val batch = alignToLatest(batchIn)
    // LWW winners per url within the batch (map-side combined).
    val winners = toTableRows(
      LwwCollapse.collapse(batch), snap.numBuckets)
    winners.persist()
    try {
      val events = batch.count()
      val touched = winners.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      if (touched.isEmpty) {
        // empty batch: still commit the epoch so replay skips it
        val s2 = snap.copy(
          snapshotId = snap.snapshotId + 1, parentId = snap.snapshotId,
          committedEpochs = (snap.committedEpochs :+ epochId).sorted,
          epochStats = snap.epochStats :+ EpochStat(epochId, 0, 0, 0, 0, 0.0))
        LakeTable.commit(tableDir, s2, expectParent = snap.snapshotId)
        return MergeResult(s2, applied = true, 0L, 0L, 0L,
          (System.nanoTime() - t0) / 1000000L)
      }
      val touchedSet = touched.toSet
      val target = tableRowsWithBucket(
        LakeTable.read(spark, tableDir, snap, Some(touchedSet)), snap.numBuckets)

      // union-collapse resolution: per url keep max(warc_ts, seq) of
      // {current table row} ∪ {batch winner}. Tombstones stay as rows so
      // an update older than a delete cannot resurrect the url.
      val ordKey = struct(col("warc_ts"), col("seq"))
      val cols = target.columns.map(col).toIndexedSeq
      val merged = target.unionByName(winners)
        .groupBy(col("url"))
        .agg(max_by(struct(cols: _*), ordKey).as("w"))
        .select(col("w.*"))
      merged.persist()

      val newId = snap.snapshotId + 1
      val newFiles = LakeTable.writeBuckets(spark, tableDir, newId, merged, touched)

      val delW = winners.filter(col("tombstone")).count()
      val upsW = winners.count() - delW
      val liveDelta = merged.agg(
        sum(when(col("tombstone"), 0L).otherwise(1L)),
        sum(when(col("tombstone"), 1L).otherwise(0L))).collect()(0)
      val touchedLiveOld = target.agg(
        sum(when(col("tombstone"), 0L).otherwise(1L)),
        sum(when(col("tombstone"), 1L).otherwise(0L))).collect()(0)
      def l(r: org.apache.spark.sql.Row, i: Int): Long =
        if (r.isNullAt(i)) 0L else r.getLong(i)

      // lineage: per-bucket max applied seq
      val batchLineage = winners.groupBy(col("bucket")).agg(max(col("seq")))
        .collect().map(r => r.getInt(0).toString -> r.getLong(1)).toMap
      val lineage = snap.lineage ++ batchLineage.map { case (b, s) =>
        b -> math.max(s, snap.lineage.getOrElse(b, Long.MinValue))
      }

      val durMs = (System.nanoTime() - t0) / 1000000L
      val keptFiles: List[FileEntry] =
        snap.files.filterNot(f => touchedSet.contains(f.bucket))
      val s2 = snap.copy(
        snapshotId = newId, parentId = snap.snapshotId,
        committedEpochs = (snap.committedEpochs :+ epochId).sorted,
        files = keptFiles ++ newFiles,
        lineage = lineage,
        epochStats = snap.epochStats :+ EpochStat(epochId, events, upsW, delW,
          durMs, if (durMs > 0) events * 1000.0 / durMs else 0.0),
        liveRows = snap.liveRows - l(touchedLiveOld, 0) + l(liveDelta, 0),
        tombstones = snap.tombstones - l(touchedLiveOld, 1) + l(liveDelta, 1))
      LakeTable.commit(tableDir, s2, expectParent = snap.snapshotId)
      merged.unpersist()
      MergeResult(s2, applied = true, events, upsW, delW, durMs)
    } finally winners.unpersist()
  }
}
