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
  * Scale/latency shape — the epoch costs exactly four Spark jobs:
  *   1. winners: one shuffle-by-url hash aggregate over the batch
  *      (`max_by` partial aggregation pre-combines hot keys map-side —
  *      the skew bound) carrying the per-url event count so the raw
  *      batch is scanned exactly once;
  *   2. one small collect of per-bucket batch stats (touched buckets,
  *      counts, lineage) off the cached winners;
  *   3. the merged write (union of pruned target buckets + winners,
  *      second url aggregate, bucket-partitioned files);
  *   4. one per-bucket stats aggregate off the cached merge result.
  * Old live/tombstone accounting comes from manifest file stats — no
  * rescan of the target. Only the url-hash buckets the batch touches are
  * read and rewritten: a batch touching 3 of P buckets costs
  * O(3/P · tableSize) I/O regardless of table size. The target∪source
  * resolution reuses the associative LWW collapse (a union-collapse IS a
  * full-outer merge with LWW resolution, without the join: both sides
  * hash once by url, no second shuffle).
  */
object MergeInto {

  /** Write-path strategy for one epoch (Iceberg-v2's copy-on-write vs
    * merge-on-read, north_star).
    *
    *  - [[CopyOnWrite]]: read the touched buckets, union-collapse with
    *    the batch winners, rewrite those buckets. Read-optimal; write
    *    cost O(touchedBucketBytes) per epoch.
    *  - [[MergeOnRead]]: append the batch winners as per-bucket DELTA
    *    files (equality-delete/upsert overlay) without reading the
    *    target at all. Write cost O(batchWinners) — the small-epoch tail
    *    path; readers LWW-collapse base∪delta (LakeTable.readMerged).
    *  - [[Auto]]: MergeOnRead when the winner set is small relative to
    *    the touched buckets' current rows AND no touched bucket has hit
    *    its delta-file cap; CopyOnWrite otherwise. A CoW epoch over a
    *    delta-carrying bucket folds the overlay in (minor compaction for
    *    free — the union-collapse is the same aggregate either way).
    */
  sealed trait MergeMode
  case object CopyOnWrite extends MergeMode
  case object MergeOnRead extends MergeMode
  case object Auto extends MergeMode

  /** Auto policy: MoR when winnerKeys < this fraction of the touched
    * buckets' existing rows (i.e. the epoch would rewrite ≥5× the bytes
    * it changes).
    */
  val MorWinnerFraction: Double = 0.2

  /** Auto policy: once a bucket accumulates this many delta files, the
    * next epoch touching it goes copy-on-write, folding the overlay into
    * a fresh base — bounds the read-side merge tax at scale.
    */
  val MaxDeltasPerBucket: Int = 8

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

  private def ordKey = struct(col("warc_ts"), col("seq"))

  /** Above this many distinct urls per epoch the winner-key set is no
    * longer broadcastable and the merge falls back to the salted
    * shuffled-hash join. ~4M keys × ~50B ≈ 200MB broadcast ceiling.
    */
  val BroadcastKeyLimit: Long = 4000000L

  /** Minimum salt factor for the fallback join's shuffle key: a hot
    * url's payload spreads over at least this many partitions
    * (pmod(seq, S) on both sides — equal seqs salt identically, so
    * winners always meet their key). The factor ADAPTS per batch from
    * the heavy-hitter count the phase-A aggregate already produces
    * (SURVEY §7.4 "salting factor adaptive per batch"): see
    * [[saltFactorFor]].
    */
  val FallbackSaltFactor: Int = 16

  /** Rows of one url we are willing to leave on a single (url, salt)
    * partition before widening the salt.
    */
  val TargetRowsPerSalt: Long = 2000000L

  /** Adaptive salt: enough partitions that the batch's hottest url
    * spreads to ≤ TargetRowsPerSalt rows per partition, clamped to
    * [FallbackSaltFactor, 1024]. A Zipf-head crawl domain with 10^9
    * events in one backfill epoch gets S=512 instead of drowning 1/16th
    * of the cluster.
    */
  def saltFactorFor(maxEventsPerUrl: Long): Int = {
    val needed = (maxEventsPerUrl + TargetRowsPerSalt - 1) / TargetRowsPerSalt
    math.min(1024L, math.max(FallbackSaltFactor.toLong, needed)).toInt
  }

  def merge(spark: SparkSession, tableDir: String, batchIn: DataFrame,
            epochId: Long, mode: MergeMode = Auto,
            broadcastKeyLimit: Long = BroadcastKeyLimit): MergeResult = {
    val t0 = System.nanoTime()
    val snap = LakeTable.load(tableDir)
    if (snap.isCommitted(epochId))
      return MergeResult(snap, applied = false, 0L, 0L, 0L, 0L)
    def elapsedMs = (System.nanoTime() - t0) / 1000000L

    // Spark 4.1 AQE coalesces post-shuffle partitions toward the 64MB
    // advisory size with parallelism-first DISABLED by default — on this
    // merge (CPU-heavy per byte, modest shuffle volumes) that collapses
    // the winner/union aggregations to a handful of tasks and serializes
    // the epoch (measured 4× wall-clock at 16 cores). Pin
    // parallelism-first for the duration of the merge, restore after.
    val pfKey = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    val pfPrev = spark.conf.getOption(pfKey)
    spark.conf.set(pfKey, "true")
    def restorePf(): Unit = pfPrev match {
      case Some(v) => spark.conf.set(pfKey, v)
      case None    => spark.conf.unset(pfKey)
    }
    val debugTiming = sys.env.contains("GRAFT_DEBUG_TIMING")
    var tLast = t0
    def phase(name: String): Unit = if (debugTiming) {
      val now = System.nanoTime()
      System.err.println(f"[merge-timing] epoch=$epochId $name ${(now - tLast) / 1e9}%.2f s")
      tLast = now
    }

    // 1. two-phase LWW winner selection. Phase A shuffles only the
    //    NARROW key columns (url, warc_ts, seq, op) — never the html/text
    //    payload: at web scale the payload is ~95% of the row, so the
    //    winner-key aggregate costs ~1/20 of a payload shuffle. Phase B
    //    broadcasts the winning (url, seq) keys back over the batch and
    //    keeps winner rows map-side — zero payload shuffle. (Fallback
    //    below if the key set is too big to broadcast.)
    //
    //    The winner argmax is graft.plans.LwwSeq — a declarative
    //    aggregate with a primitive (warc_ts, seq) buffer, so phase A is
    //    one codegen'd HashAggregate with map-side partial aggregation.
    //    (`max(struct)` / `max_by` buffers are structs ⇒ SortAggregate:
    //    measured 22–28 s vs 2.6 s on a 64M-event epoch at 32 cores.)
    //    The winner's tombstone flag rides in the low bit of the
    //    encoded seq: order-preserving, since seq is unique per event.
    val batch = alignToLatest(batchIn)
    val rows = batch.select(
      col("url"),
      xxhash64(col("url")).as("url_hash"),
      col("warc_ts"), col("seq"),
      (col("op") === "D").as("tombstone"),
      col("html"), col("text"), col("lang"), col("extra_score"))
      .withColumn("bucket", pmod(col("url_hash"), lit(snap.numBuckets)).cast("int"))
    val seqEnc = shiftleft(col("seq"), 1) + col("tombstone").cast("long")
    val keyAgg = rows
      .select(col("url"), col("bucket"), col("warc_ts"), col("seq"), col("tombstone"))
      .groupBy(col("url"))
      .agg(graft.plans.LwwFunctions.lww_seq(spark, col("warc_ts"), seqEnc).as("_w_enc"),
        count(lit(1)).as("_n_events"),
        // high-watermark over ALL the url's events, not just the LWW
        // winner (an out-of-order winner can carry a smaller seq than a
        // late event it beat on warc_ts — lineage must still cover it)
        max(col("seq")).as("_max_seq"),
        first(col("bucket")).as("_bucket"))
      .withColumn("_w_seq", shiftrightunsigned(col("_w_enc"), 1))
      .withColumn("_tomb", col("_w_enc").bitwiseAND(lit(1L)) === 1L)
    keyAgg.persist()
    try {
      // 2. per-bucket batch stats: touched set, metric counts, lineage.
      val bstats = keyAgg.groupBy(col("_bucket").as("bucket")).agg(
        sum(col("_n_events")).as("events"),
        sum(when(col("_tomb"), 1L).otherwise(0L)).as("dels"),
        count(lit(1)).as("keys"),
        max(col("_max_seq")).as("maxSeq"),
        max(col("_n_events")).as("maxUrl")).collect()
      phase("keyAgg+bstats")
      if (bstats.isEmpty) {
        val s2 = snap.withEpoch(epochId, EpochStat(epochId, 0, 0, 0, 0, 0.0))
          .copy(snapshotId = snap.snapshotId + 1, parentId = snap.snapshotId)
        LakeTable.commit(tableDir, s2, expectParent = snap.snapshotId)
        return MergeResult(s2, applied = true, 0L, 0L, 0L, elapsedMs)
      }
      val touched = bstats.map(_.getInt(0)).sorted.toSeq
      val touchedSet = touched.toSet
      val events = bstats.map(_.getLong(1)).sum
      val delW = bstats.map(_.getLong(2)).sum
      val nKeys = bstats.map(_.getLong(3)).sum
      val upsW = nKeys - delW
      val batchLineage = bstats.map(r => r.getInt(0).toString -> r.getLong(4)).toMap
      // heavy-hitter probe (free: same collect): the hottest url's event
      // count sets the fallback-join salt width for this epoch
      val saltF = saltFactorFor(bstats.map(_.getLong(5)).max)

      // Write-path choice (manifest stats only — zero extra jobs).
      val touchedFiles = snap.files.filter(f => touchedSet.contains(f.bucket))
      val targetRows = touchedFiles.map(_.rows).sum
      val deltaCapHit = touchedFiles.filter(_.kind == "delta")
        .groupBy(_.bucket).values.exists(_.size >= MaxDeltasPerBucket)
      val useMor = mode match {
        case MergeOnRead => true
        case CopyOnWrite => false
        case Auto => targetRows > 0 && !deltaCapHit &&
          nKeys.toDouble < MorWinnerFraction * targetRows.toDouble
      }

      // Phase B: materialize winner rows. Broadcast path when the key
      // set fits (≤ BroadcastKeyLimit urls): winner keys hash-joined
      // map-side against the batch, then a final per-url collapse over
      // ONLY the surviving rows (exact redelivered duplicates of the
      // winner may pass the key join twice — the max_by here runs over
      // winner-sized data, where its SortAggregate plan is harmless).
      // Shuffle = winner rows, not the batch. Fallback: classic
      // full-payload max_by shuffle.
      val payload = struct(rows.columns.map(col).toIndexedSeq: _*)
      val winners =
        if (nKeys <= broadcastKeyLimit) {
          // key side renamed (as in the fallback path) — joining on a
          // column derived from `rows` itself degrades to a trivially
          // true equals predicate and the join would key on seq alone
          val keys = keyAgg.select(col("url").as("_k_url"), col("_w_seq"))
          rows.join(broadcast(keys),
              rows("url") === keys("_k_url") && rows("seq") === col("_w_seq"))
            .drop("_w_seq", "_k_url")
            .groupBy(col("url"))
            .agg(max_by(payload, ordKey).as("w"))
            .select(col("w.*"))
        } else {
          // Fallback above the broadcast ceiling (e.g. a 10^10-event
          // backfill epoch): shuffle the payload ONCE and hash-join the
          // winner keys per partition — no payload sort-aggregate over
          // the raw batch. The shuffle key is SALTED: (url, pmod(seq,S))
          // on the event side, (url, pmod(_w_seq,S)) on the key side.
          // A crawl-hot url (Zipf head) spreads its payload uniformly
          // over S partitions instead of skewing one (north_rule's
          // explicit hot-key salting; AQE skew handling is unavailable
          // inside a streaming foreachBatch). Correct because the only
          // row that can match carries seq == _w_seq, and equal seqs
          // salt identically; rows on other salts are losers by
          // definition. The residual seq check rejects salt collisions.
          val keys = keyAgg.select(col("url").as("_k_url"), col("_w_seq"),
            pmod(col("_w_seq"), lit(saltF)).as("_k_salt"))
          val salted = rows.withColumn("_salt",
            pmod(col("seq"), lit(saltF)))
          salted.join(keys.hint("SHUFFLE_HASH"),
              salted("url") === keys("_k_url") &&
                salted("_salt") === keys("_k_salt") &&
                (salted("seq") - keys("_w_seq") === 0L))
            .drop("_k_url", "_w_seq", "_k_salt", "_salt")
            .groupBy(col("url"))
            .agg(max_by(payload, ordKey).as("w"))
            .select(col("w.*"))
        }

      val lineage = snap.lineage ++ batchLineage.map { case (b, s) =>
        b -> math.max(s, snap.lineage.getOrElse(b, Long.MinValue))
      }

      if (useMor) {
        // 3-MoR. Append winners as per-bucket delta files — the target is
        //    never read, so a tail epoch updating 10^4 urls on a 100 TB
        //    table costs O(winners) write + one manifest commit. liveRows/
        //    tombstones become upper bounds (a delta upsert may shadow a
        //    base row) until the next CoW fold-in or compaction restores
        //    exact counts; per-FILE stats stay exact throughout.
        winners.persist()
        try {
          val newId = snap.snapshotId + 1
          val newFiles = LakeTable.writeBuckets(spark, tableDir, newId,
            winners, touched, suffix = "-delta", kind = "delta")
          phase("winners+deltaWrite+stats")
          val durMs = elapsedMs
          val s2 = snap.withEpoch(epochId, EpochStat(epochId, events, upsW,
              delW, durMs, if (durMs > 0) events * 1000.0 / durMs else 0.0))
            .copy(
              snapshotId = newId, parentId = snap.snapshotId,
              files = snap.files ++ newFiles,
              lineage = lineage,
              liveRows = snap.liveRows + newFiles.map(_.live).sum,
              tombstones = snap.tombstones + newFiles.map(_.tombs).sum)
          LakeTable.commit(tableDir, s2, expectParent = snap.snapshotId)
          phase("commit")
          return MergeResult(s2, applied = true, events, upsW, delW, durMs)
        } finally winners.unpersist()
      }

      // 3. union-collapse resolution over pruned target buckets: per url
      //    keep max(warc_ts, seq) of {table row} ∪ {batch winner}.
      //    Tombstones stay as rows so an update older than a delete
      //    cannot resurrect the url. Delta overlays on the touched
      //    buckets enter the same collapse and their files are dropped
      //    from the manifest below — a CoW epoch IS the overlay fold-in.
      //
      //    Same sort-free shape as phase B: the per-url winner is found
      //    on NARROW columns with the primitive lww_seq HashAggregate
      //    (winners is persisted, so its payload is scanned once; the
      //    target's narrow pass is a column-pruned parquet scan), then
      //    the payload joins back on (url, enc). (url, seq) alone is NOT
      //    unique across target∪winners: an at-least-once redelivered
      //    event can be this batch's winner while its first delivery
      //    already sits in the table, and both byte-identical copies
      //    would survive a (url, seq) join-back. The enc key folds a
      //    write-generation tag into seq's low bits (LakeTable.readTagged
      //    — target writes in snapshot order, this batch's winners as the
      //    newest generation), restoring uniqueness and deterministically
      //    keeping the newest copy.
      winners.persist()
      val (targetTagged, nGensT) = LakeTable.readTagged(spark, tableDir, touchedFiles)
      val encBits = LakeTable.genBits(nGensT + 1)
      val maxSeqAll = math.max(
        touchedFiles.map(_.maxSeq).foldLeft(0L)(math.max),
        batchLineage.values.max)
      require(maxSeqAll < (1L << (62 - encBits)),
        s"seq too large for ${nGensT + 1}-generation encoding")
      val enc = shiftleft(col("seq"), encBits) + col("_gen")
      val target = targetTagged
        .withColumn("bucket", pmod(col("url_hash"), lit(snap.numBuckets)).cast("int"))
      val winnersGen = winners.withColumn("_gen", lit(nGensT))
      val narrowCols = Seq(col("url"), col("warc_ts"), enc.as("_e"))
      val uKeys = targetTagged.select(narrowCols: _*)
        .unionByName(winnersGen.select(narrowCols: _*))
        .groupBy(col("url"))
        .agg(graft.plans.LwwFunctions.lww_seq(spark, col("warc_ts"), col("_e"))
          .as("_m_e"))
        .select(col("url").as("_m_url"), col("_m_e"))
      val unionAll = target.withColumn("_e", enc)
        .unionByName(winnersGen.withColumn("_e", enc))
      val merged =
        (if (targetRows + nKeys <= broadcastKeyLimit)
          unionAll.join(broadcast(uKeys),
              unionAll("url") === col("_m_url") && unionAll("_e") === col("_m_e"))
            .drop("_m_url", "_m_e")
        else {
          val mSalted = unionAll.withColumn("_salt",
            pmod(col("_e"), lit(saltF)))
          val kSalted = uKeys.withColumn("_k_salt",
            pmod(col("_m_e"), lit(saltF)))
          mSalted.join(kSalted.hint("SHUFFLE_HASH"),
              mSalted("url") === kSalted("_m_url") &&
                mSalted("_salt") === kSalted("_k_salt") &&
                (mSalted("_e") - kSalted("_m_e") === 0L))
            .drop("_m_url", "_m_e", "_salt", "_k_salt")
        }).drop("_e", "_gen")
      merged.persist()
      try {
        // 4. write + per-bucket stats (two jobs over the cached result).
        val newId = snap.snapshotId + 1
        val newFiles = LakeTable.writeBuckets(spark, tableDir, newId, merged, touched)
        phase("winners+union+write+stats")

        val keptFiles: List[FileEntry] =
          snap.files.filterNot(f => touchedSet.contains(f.bucket))
        val oldTouched = snap.files.filter(f => touchedSet.contains(f.bucket))
        val durMs = elapsedMs
        val s2 = snap.withEpoch(epochId, EpochStat(epochId, events, upsW, delW,
            durMs, if (durMs > 0) events * 1000.0 / durMs else 0.0))
          .copy(
            snapshotId = newId, parentId = snap.snapshotId,
            files = keptFiles ++ newFiles,
            lineage = lineage,
            liveRows = snap.liveRows - oldTouched.map(_.live).sum + newFiles.map(_.live).sum,
            tombstones = snap.tombstones - oldTouched.map(_.tombs).sum + newFiles.map(_.tombs).sum)
        LakeTable.commit(tableDir, s2, expectParent = snap.snapshotId)
        phase("commit")
        MergeResult(s2, applied = true, events, upsW, delW, durMs)
      } finally { merged.unpersist(); winners.unpersist() }
    } finally { keyAgg.unpersist(); restorePf() }
  }
}
