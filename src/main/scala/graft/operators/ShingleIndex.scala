package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.DedupQueries

/** Incremental EXACT-Jaccard near-dup index — the fourth signature
  * modality over the shared [[DedupIndex]] manifest layer (minhash:
  * DedupIndex, simhash: [[SimHashIndex]], vectors: [[EmbeddingIndex]]):
  * each document's DISTINCT hashed word-5-gram shingle set is persisted
  * once, per ingest epoch, and every arriving epoch's exact n-gram
  * Jaccard pairs (the batch `DedupQueries.ngramJaccardPairs` semantics,
  * dd03) are computed from the stored sets — the epoch's text is
  * shingled once and never again, and no prior document's text is ever
  * re-read. This closes the gap the minhash index leaves: dd08/dd09
  * give estimated/LSH-candidate-bounded pairs incrementally, but the
  * EXACT pair graph (what dd07's clustering consumes) still required a
  * full-corpus re-shingle per run.
  *
  * Index row: (doc_id, shingle: int64 = xxhash64(5-gram), n_sh = the
  * doc's distinct-shingle count, _sig_epoch). `n_sh` rides on every row
  * (RLE-compressed to ~nothing in doc-sorted parquet) so a pair's
  * denominators arrive WITH the join rows — no per-doc size lookup join
  * against the index. ~16 B/row plus the amortized n_sh; the storage is
  * O(corpus words) — the honest price of exact incremental dedup (the
  * shared counts are not recoverable from any fixed-size sketch).
  *
  * Equivalence (same union-over-epochs argument as DedupIndex:
  * within-epoch self-join + epoch x strictly-older-live cross join,
  * a-less-than-b orientation): the union over epochs of [[epochPairs]]
  * equals batch `ngramJaccardPairs` on the cumulative corpus, PROVIDED
  * no shingle's doc-frequency crosses `maxDocFreq` between epochs: the
  * batch op's hot-shingle valve is a corpus-global statistic that also
  * caps the per-doc size denominators, while this index stores `n_sh`
  * uncapped and applies the valve to the candidate JOIN only, computed
  * over the cumulative live sets at fold time (restricted to the
  * epoch's shingles — only those can produce new pairs). On the test
  * corpus the valve never fires (max doc-freq 4 at every tier), so the
  * dd14 entry shares dd03's oracle verbatim; at crawl scale a shingle
  * crossing the cap stops producing NEW pairs from that epoch on
  * (bounded fan-out) but already-emitted pairs are not retracted — the
  * standard prospective semantics of incremental maintenance.
  *
  * Deletes: a tombstone row (null shingle/n_sh) supersedes the doc's
  * whole set — same contract as DedupIndex; compaction drops the rows
  * physically.
  *
  * Reference analog: the watermark-incremental posture
  * (/root/reference/convoetl/flows/extraction.py:236-250) applied to
  * the exact pair stage.
  */
object ShingleIndex {

  /** Manifest feature marking every entry as carrying a resigned/
    * mirror (and a doc_id Bloom sidecar): established at FIRST-epoch
    * commit, it lets [[epochPairs]]/[[contamination]] resolve the live
    * prior rows with two broadcast anti-joins instead of a
    * latest-per-doc groupBy + join-back over the WHOLE shingle store —
    * the largest artifact this engine persists, whose per-fold
    * exchange would grow with the corpus forever. Indexes written
    * before the mirror era (no flag) read through the groupBy fallback,
    * which stays correct for them because mirror ABSENCE only means
    * "no resigns" on entries that actually wrote mirrors.
    */
  val MirrorFeature: String = DedupIndex.MirrorFeature

  /** `docs`: (doc_id, text). Idempotent per epoch; `deletes` tombstone. */
  def appendEpoch(spark: SparkSession, dir: String, epochId: Long,
                  docs: DataFrame,
                  deletes: Option[DataFrame] = None): Boolean = {
    // round-6: the distinct set and its size are computed IN-ROW
    // (DedupQueries.distinctShingleSets) — the previous distinct +
    // groupBy-count + join-back paid THREE exchanges of the
    // corpus-words-sized shingle stream per epoch; the append is now a
    // pure projection + explode, zero exchanges (guide §2.4)
    // explode_outer + null filter (not explode): the non-outer form
    // triggers InferFiltersFromGenerate, whose size() predicate is
    // pushed below the scan fan-out and re-runs the whole array build
    // on the scan partition (see DedupQueries.distinctShingleHashes)
    val live = DedupQueries.distinctShingleSets(docs)
      .select(col("doc_id"), explode_outer(col("sh")).as("shingle"),
        col("n_sh"))
      .filter(col("shingle").isNotNull)
      .select(col("doc_id"), col("shingle"), col("n_sh"))
    val rows = deletes match {
      case None => live
      case Some(del) =>
        live.unionByName(del.select(col("doc_id"),
          lit(null).cast("long").as("shingle"),
          lit(null).cast("long").as("n_sh")))
    }
    DedupIndex.appendFrameWithMirrors(spark, dir, epochId,
      rows.withColumn("_sig_epoch", lit(epochId)), List(MirrorFeature))
  }

  /** Live (not superseded, not tombstoned) rows of the entries strictly
    * older than `epochId` (all committed entries when `epochId` is
    * None). Mirror-era indexes resolve supersession with broadcast
    * anti-joins against the epoch's docs and the tiny resigned/ lists —
    * the index side crosses ZERO exchanges; legacy dirs (no
    * [[MirrorFeature]]) fall back to the latest-per-doc groupBy, which
    * is also the regression anchor ([[graft.bench.ShingleFoldBench]]
    * A/Bs the two on one index via `forceLegacy`).
    */
  private def liveRows(spark: SparkSession, dir: String,
                       before: Option[Long],
                       excludeDocs: Option[DataFrame],
                       forceLegacy: Boolean): Option[DataFrame] = {
    val m = DedupIndex.loadManifest(dir)
    val entries = before match {
      case Some(e) => DedupIndex.priorEntries(dir, e)
      case None => m.entries
    }
    if (entries.isEmpty) return None
    val mirrored = !forceLegacy && m.features.contains(MirrorFeature)
    val base =
      if (mirrored) {
        val resigned = DedupIndex.resignedLists(spark, dir,
          // an entry's own mirror marks docs ITS epoch re-signed from
          // even-older entries; rows of the entry itself carry that
          // epoch as _sig_epoch, so `last > _sig_epoch` never drops
          // them — safe to pass every entry's list, needed when
          // `before` is None (latest overall)
          entries)
        DedupIndex.dropSuperseded(
          spark.read.parquet(entries.map(e => s"$dir/${e.path}"): _*),
          excludeDocs.getOrElse(
            spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)),
          resigned)
      } else {
        val epochs = entries.flatMap(e => e.minEpoch to e.maxEpoch)
        val latest = DedupIndex.latestSigs(
          DedupIndex.readSigs(spark, dir, epochs))
        excludeDocs match {
          case None => latest
          case Some(x) => latest.join(x, Seq("doc_id"), "left_anti")
        }
      }
    Some(base.filter(col("shingle").isNotNull)
      .select(col("doc_id"), col("shingle"), col("n_sh")))
  }

  /** Exact-Jaccard pairs of epoch `epochId` against itself AND the live
    * strictly-older index — batch dd03 restricted to pairs whose
    * younger side is this epoch. All joins are shingle-bucket shaped
    * (the scale property of the batch op), the index side is a NARROW
    * (doc_id, shingle, n_sh) scan, and the denominators ride the join
    * rows — zero per-doc lookup joins.
    */
  def epochPairs(spark: SparkSession, dir: String, epochId: Long,
                 threshold: Double, maxDocFreq: Int = 64,
                 forceLegacy: Boolean = false): DataFrame = {
    val newAll = DedupIndex.readSigs(spark, dir, Seq(epochId))
    val newSh = newAll.filter(col("shingle").isNotNull)
    val priorLive = liveRows(spark, dir, Some(epochId),
      Some(newAll.select(col("doc_id")).distinct()), forceLegacy)
    // hot-shingle valve over the CUMULATIVE live sets, restricted to
    // shingles this epoch carries (only those can join) — the broadcast
    // semi keeps the df aggregate epoch-bounded, not corpus-bounded
    val epochShingles = newSh.select(col("shingle")).distinct()
    val liveAll = priorLive match {
      case None => newSh.select(col("doc_id"), col("shingle"))
      case Some(pl) => newSh.select(col("doc_id"), col("shingle"))
        .unionByName(pl.select(col("doc_id"), col("shingle")))
    }
    val hot = liveAll
      .join(broadcast(epochShingles), Seq("shingle"), "left_semi")
      .groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDocFreq).select(col("shingle"))
    def keep(df: DataFrame): DataFrame =
      df.join(broadcast(hot), Seq("shingle"), "left_anti")
    val kNew = keep(newSh.select(col("doc_id"), col("shingle"), col("n_sh")))
    val xa = kNew.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"),
      col("shingle"))
    val xb = kNew.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"),
      col("shingle"))
    val within = xa.join(xb, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("shingle"))
    val rows = priorLive match {
      case None => within
      case Some(pl) =>
        val o = keep(pl).select(col("doc_id").as("od"),
          col("n_sh").as("on"), col("shingle"))
        val e = kNew.select(col("doc_id").as("ed"), col("n_sh").as("en"),
          col("shingle"))
        val cross = e.join(o, Seq("shingle"))
          .select(least(col("ed"), col("od")).as("doc_a"),
            greatest(col("ed"), col("od")).as("doc_b"),
            when(col("ed") < col("od"), col("en")).otherwise(col("on")).as("n_a"),
            when(col("ed") < col("od"), col("on")).otherwise(col("en")).as("n_b"),
            col("shingle"))
        within.unionByName(cross)
    }
    // n_a/n_b are constant per pair: folding them into the grouping key
    // keeps the aggregate one narrow HashAggregate, no post-join lookup
    rows.groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def foldEpoch(spark: SparkSession, dir: String, epochId: Long,
                docs: DataFrame, threshold: Double,
                maxDocFreq: Int = 64): DataFrame = {
    appendEpoch(spark, dir, epochId, docs)
    epochPairs(spark, dir, epochId, threshold, maxDocFreq)
  }

  /** Eval-set DECONTAMINATION of epoch `epochId`'s documents against
    * the eval docs (`evalIds`: a (doc_id) frame) whose shingle sets
    * live in the SAME index — batch dd10 restricted to train docs whose
    * arrival epoch is `epochId`. One persisted shingle store serves
    * both the pair maintenance (dd13/dd14) and this op: a document is
    * shingled exactly once ever, for every consumer.
    *
    * Per-epoch work is epoch x eval bounded, never corpus bounded: the
    * train side is the epoch's own narrow (doc_id, shingle) rows, the
    * eval side is the index's live rows semi-joined to `evalIds`
    * (eval sets are small — the semi filter broadcasts), and the join
    * is int64-shingle-bucket shaped with two countDistincts bounded by
    * colliding (train, eval, shingle) triples, exactly the batch dd10
    * shape. Union over epochs == batch dd10 on the cumulative corpus
    * (each train doc's row depends only on its own set x the eval set,
    * so the per-epoch restriction decomposes exactly), PROVIDED the
    * eval side is read at a time covering all eval docs — the eval scan
    * takes the index's latest live sets at CALL time, so an eval doc
    * arriving later flags only later epochs (the standard prospective
    * semantics of incremental maintenance; retrospective per-epoch
    * calls after the eval set is complete are exact).
    */
  def contamination(spark: SparkSession, dir: String, epochId: Long,
                    evalIds: DataFrame): DataFrame = {
    val ids = evalIds.select(col("doc_id"))
    // round-5 advice: drop epoch rows superseded by LATER re-signs —
    // without this, a train doc re-signed after `epochId` reported
    // both its stale and new sets in the union over epochs, diverging
    // from batch dd10. Broadcast anti-join against the later entries'
    // tiny resigned/ lists (absent on legacy dirs → unchanged
    // prospective semantics there).
    val m = DedupIndex.loadManifest(dir)
    val laterResigns = DedupIndex.resignedLists(spark, dir,
      m.entries.filter(_.maxEpoch > epochId))
    val epoch = DedupIndex.dropSuperseded(
        DedupIndex.readSigs(spark, dir, Seq(epochId))
          .filter(col("shingle").isNotNull),
        spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0),
        laterResigns)
      .select(col("doc_id"), col("shingle"))
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val eval_ = liveRows(spark, dir, before = None, excludeDocs = None,
        forceLegacy = false)
      .getOrElse(sys.error(s"contamination on an empty index at $dir"))
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("eval_id"), col("shingle"))
    epoch.join(eval_, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
