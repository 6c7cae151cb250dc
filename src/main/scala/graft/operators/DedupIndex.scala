package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.DedupQueries

/** Incremental near-dup INDEX maintenance: a persisted MinHash
  * signature table, appended per ingest epoch, that each ARRIVING epoch
  * is deduped against — so the expensive text work (shingling + k
  * minhash passes) runs once per document ever, and an epoch's dedup
  * cost scales with the epoch, not the corpus.
  *
  * This closes the one shape batch dedup cannot survive at 100 TB:
  * dd03/dd04 re-shingle the whole corpus per run, which is fine for a
  * one-shot curation pass but not for a daily feed — the reference's own
  * watermark-incremental philosophy ("never recompute what a watermark
  * lets you skip": /root/reference/convoetl/flows/extraction.py:236-250,
  * and the maintained `_update_user_stats` aggregate,
  * /root/reference/convoetl/loaders/sqlite.py:205-236) applied to the
  * dedup family.
  *
  * Layout under `indexDir` — the same snapshot-commit discipline as
  * LakeTable, because at ingest cadence the index IS a table:
  *   meta/vN.json + meta/CURRENT   — manifest of committed entries,
  *     swapped atomically; a crashed append leaves only an orphan sig
  *     dir the retry overwrites, and a redelivered epoch is a no-op.
  *   sigs/epoch=N | sigs/compact-A-B — (doc_id, mh_0..mh_31) parquet;
  *     one dir per epoch until [[compact]] folds contiguous epochs into
  *     one range entry (10^4 ingest epochs must not mean 10^4 dirs —
  *     the same metadata-growth bound the lake table enforces);
  *     [[vacuum]] reclaims superseded dirs after a grace period so
  *     pinned-path readers of the pre-compaction layout finish clean.
  *
  * Equivalence: signatures are per-doc and epoch-independent, and both
  * the batch op and this index generate candidates from the SAME band
  * buckets (DedupQueries.sigBuckets), so
  *   union over epochs E of  pairs(E x (E ∪ index<E))  ==  dd04 pairs
  * on the cumulative corpus — the within-epoch self-join covers pairs
  * born in one epoch, the epoch⋈index join covers pairs across epochs,
  * and no pair is produced twice (its younger side belongs to exactly
  * one epoch). Oracle-checked as dd08 against the dd04 DuckDB SQL.
  *
  * Scale shape: appendEpoch's cost is O(epoch text). epochPairs joins
  * the epoch's band buckets against the index's — the epoch side is
  * small, the index side is a NARROW (doc_id, band, 4-int tuple) scan
  * of the signature parquet (~150 B/doc), never the corpus text (the
  * ~100×-wider payload). All joins are plain shuffle joins on those
  * narrow keys — no broadcast of corpus-sized sides. On a real cluster
  * the sigs table is additionally written bucketBy(band-bucket hash) so
  * the index side of the candidate join is pre-shuffled on disk and
  * only the epoch side exchanges; the sandbox has no metastore, so that
  * layout upgrade is documented rather than wired.
  */
object DedupIndex {
  import org.json4s.{DefaultFormats, Formats}
  import org.json4s.jackson.Serialization
  implicit private val fmts: Formats = DefaultFormats

  /** One committed signature parquet dir covering epochs
    * [minEpoch, maxEpoch] (a single epoch until compaction folds a
    * contiguous run into one entry).
    */
  final case class IndexEntry(minEpoch: Long, maxEpoch: Long, path: String)
  final case class IndexManifest(version: Long, entries: List[IndexEntry]) {
    def epochs: Seq[Long] =
      entries.flatMap(e => e.minEpoch to e.maxEpoch).sorted
    def isCommitted(epochId: Long): Boolean =
      entries.exists(e => epochId >= e.minEpoch && epochId <= e.maxEpoch)
  }

  private def sigsRoot(dir: String): Path = Paths.get(dir, "sigs")
  private def metaDir(dir: String): Path = Paths.get(dir, "meta")
  private def currentPtr(dir: String): Path = metaDir(dir).resolve("CURRENT")

  def loadManifest(dir: String): IndexManifest =
    if (!Files.exists(currentPtr(dir))) IndexManifest(0L, Nil)
    else {
      val v = Files.readString(currentPtr(dir)).trim
      Serialization.read[IndexManifest](
        Files.readString(metaDir(dir).resolve(s"$v.json")))
    }

  /** Write manifest vN then atomically swap CURRENT — the LakeTable
    * commit protocol (single-writer ingest posture; `expectVersion`
    * catches a concurrent committer).
    */
  private def commitManifest(dir: String, m: IndexManifest,
                             expectVersion: Long): Unit = {
    val cur = loadManifest(dir)
    require(cur.version == expectVersion,
      s"concurrent index commit: CURRENT=v${cur.version}, expected v$expectVersion")
    Files.createDirectories(metaDir(dir))
    Files.writeString(metaDir(dir).resolve(s"v${m.version}.json"),
      Serialization.write(m))
    val tmp = metaDir(dir).resolve(s".CURRENT.tmp.${m.version}")
    Files.writeString(tmp, s"v${m.version}")
    Files.move(tmp, currentPtr(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Epoch ids present in the index, ascending. */
  def committedEpochs(dir: String): Seq[Long] = loadManifest(dir).epochs

  /** Compute `docs`' signatures (doc_id, text → mh_0..mh_31) and commit
    * them as `epochId`. Idempotent: a redelivered epoch returns false
    * and writes nothing — the retry contract of an at-least-once feed.
    * A sig dir left by a CRASHED attempt (written but never committed)
    * is overwritten by the retry — only the manifest defines existence.
    *
    * `deletes` (doc_id rows), when given, commit TOMBSTONE signatures
    * for docs deleted in this epoch: an all-null signature row that the
    * latest-per-doc resolution picks up and the live filters drop — so
    * a deleted url's signature stops generating pairs the moment its
    * delete epoch lands (round-4 advice: before this, op='D' rows were
    * filtered at the sink and a deleted doc kept pairing forever).
    * Compaction drops tombstoned docs physically.
    */
  def appendEpoch(spark: SparkSession, dir: String, epochId: Long,
                  docs: DataFrame,
                  deletes: Option[DataFrame] = None): Boolean = {
    // `_sig_epoch` provenance column: a doc RE-SIGNED in a later epoch
    // (an updated url on the streaming path) supersedes its older
    // signature — readers resolve latest-per-doc ([[latestSigs]]), the
    // index's LWW
    val live = DedupQueries.minhashSignatures(docs)
    val sigs = deletes match {
      case None => live
      case Some(del) =>
        val tomb = del.select((col("doc_id") +:
          (0 until DedupQueries.MinhashK)
            .map(i => lit(null).cast("long").as(s"mh_$i"))): _*)
        live.unionByName(tomb)
    }
    appendFrame(dir, epochId, sigs.withColumn("_sig_epoch", lit(epochId)))
  }

  /** Storage-layer append shared by the signature modalities
    * ([[DedupIndex]] minhash, [[EmbeddingIndex]] vectors): commit `df`
    * (already carrying `_sig_epoch`) as `epochId` under the manifest
    * protocol.
    */
  private[operators] def appendFrame(dir: String, epochId: Long,
                                     df: DataFrame): Boolean = {
    val m = loadManifest(dir)
    if (m.isCommitted(epochId)) return false
    val rel = s"sigs/epoch=$epochId"
    val dst = Paths.get(dir, rel)
    Files.createDirectories(sigsRoot(dir))
    val tmp = sigsRoot(dir).resolve(s".tmp-epoch-$epochId")
    df.write.mode("overwrite").parquet(tmp.toString)
    graft.FsUtil.deleteTree(dst) // crashed-attempt orphan, if any
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    commitManifest(dir, IndexManifest(m.version + 1,
      m.entries :+ IndexEntry(epochId, epochId, rel)), m.version)
    true
  }

  /** Read the signatures of exactly `epochs` — entry paths resolved NOW
    * and PINNED into the plan, so a later append (or compaction) can
    * never leak into an earlier epoch's lazy plan. The requested set
    * must be exactly a union of committed entries (compaction folds
    * contiguous history, so "one fresh epoch" and "all strictly-older
    * epochs" — the two shapes this engine asks for — always resolve).
    */
  def readSigs(spark: SparkSession, dir: String,
               epochs: Seq[Long]): DataFrame = {
    require(epochs.nonEmpty, "readSigs of no epochs")
    val want = epochs.toSet
    val m = loadManifest(dir)
    val sel = m.entries.filter(e => (e.minEpoch to e.maxEpoch).forall(want))
    val covered = sel.flatMap(e => e.minEpoch to e.maxEpoch).toSet
    require(covered == want,
      s"epochs ${want -- covered} not resolvable from committed entries " +
        s"${m.entries} (partial reads of a compacted range are not a thing)")
    spark.read.parquet(sel.map(e => s"$dir/${e.path}"): _*)
  }

  /** Fold all entries STRICTLY OLDER than the newest committed epoch
    * into ONE range entry (one merged parquet dir): 10^4 ingest epochs
    * must not mean 10^4 dirs to list and open per fold. The newest
    * epoch keeps its own entry so the two read shapes this engine asks
    * for — "the fresh epoch" and "all strictly-older epochs" — always
    * resolve even on a sink that autoMaintains after every append
    * (round-4 advice: folding the just-appended epoch broke
    * retrospective [[epochPairs]] on it). Requires the folded range to
    * be gap-free (streaming epochs are; refuses loudly otherwise rather
    * than claiming uncommitted ids). Superseded dirs stay on disk for
    * in-flight pinned-path readers until [[vacuum]]. Returns true if a
    * compaction happened.
    */
  def compact(spark: SparkSession, dir: String,
              keyCol: String = "doc_id"): Boolean = {
    val m = loadManifest(dir)
    val sorted = m.entries.sortBy(_.maxEpoch)
    if (sorted.size <= 2) return false // < 2 entries strictly below newest
    val newest = sorted.last
    val olders = sorted.init
    val ids = olders.flatMap(e => e.minEpoch to e.maxEpoch).sorted
    require(ids == (ids.min to ids.max),
      s"compact needs a gap-free epoch range below the newest, got $ids")
    val rel = s"sigs/compact-${ids.min}-${ids.max}"
    val tmp = sigsRoot(dir).resolve(s".tmp-compact-${m.version + 1}")
    // physical supersession: only each doc's LATEST signature in the
    // folded range survives (readers resolve latest anyway; compaction
    // makes it storage truth), and docs whose latest is a TOMBSTONE
    // (all payload columns null) are dropped outright — safe because
    // the fold covers the full strictly-older prefix, so no yet-older
    // entry can resurrect a stale signature
    val folded = latestSigs(
      spark.read.parquet(olders.map(e => s"$dir/${e.path}"): _*), keyCol)
    val payload = folded.columns.filterNot(c => c == keyCol || c == "_sig_epoch")
    folded
      .filter(!payload.map(col(_).isNull).reduce(_ && _))
      .write.mode("overwrite").parquet(tmp.toString)
    val dst = Paths.get(dir, rel)
    graft.FsUtil.deleteTree(dst)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    commitManifest(dir, IndexManifest(m.version + 1,
      List(IndexEntry(ids.min, ids.max, rel), newest)), m.version)
    true
  }

  /** Threshold-driven upkeep for a sink-maintained index (the
    * [[graft.table.Maintenance.autoMaintain]] analog): compact once the
    * manifest carries more than `maxEntries` (and the range is
    * gap-free), then vacuum superseded dirs past `vacuumGraceMs`.
    * Bounds both the dir count an epoch fold must open and the
    * manifest's entry list, with no human in the loop.
    */
  def autoMaintain(spark: SparkSession, dir: String, maxEntries: Int = 16,
                   vacuumGraceMs: Long = 3600000L,
                   keepManifests: Int = 64,
                   keyCol: String = "doc_id"): (Boolean, Int) = {
    val m = loadManifest(dir)
    val olders = m.entries.sortBy(_.maxEpoch).dropRight(1)
    val ids = olders.flatMap(e => e.minEpoch to e.maxEpoch).sorted
    val compacted = m.entries.size > maxEntries && olders.size >= 2 &&
      ids == (ids.min to ids.max) && compact(spark, dir, keyCol)
    expireManifests(dir, keepManifests)
    (compacted, vacuum(dir, vacuumGraceMs))
  }

  /** Delete index manifests older than the newest `keepLast` — the same
    * meta/-growth bound [[graft.table.Maintenance.expireSnapshots]]
    * enforces for the lake table (one manifest per epoch otherwise
    * accumulates forever on a sink-maintained index).
    */
  def expireManifests(dir: String, keepLast: Int = 64): Int = {
    require(keepLast >= 1)
    if (!Files.exists(currentPtr(dir))) return 0
    val cur = loadManifest(dir).version
    var deleted = 0
    graft.FsUtil.listDir(metaDir(dir))(_
      .filter { pth =>
        val n = pth.getFileName.toString
        n.startsWith("v") && n.endsWith(".json") &&
          n.stripPrefix("v").stripSuffix(".json").toLong <= cur - keepLast
      }.toList)
      .foreach { pth => Files.deleteIfExists(pth); deleted += 1 }
    deleted
  }

  /** Delete sig dirs not referenced by the CURRENT manifest and older
    * than `graceMs` (protects pinned-path plans still running over the
    * pre-compaction layout, and in-flight appends). Returns dirs
    * deleted.
    */
  def vacuum(dir: String, graceMs: Long = 3600000L): Int = {
    if (!Files.exists(sigsRoot(dir))) return 0
    val referenced = loadManifest(dir).entries
      .map(e => Paths.get(dir, e.path).toAbsolutePath.normalize).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    graft.FsUtil.listDir(sigsRoot(dir))(_
      .filter(p => Files.isDirectory(p))
      .filter(p => !referenced.contains(p.toAbsolutePath.normalize))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
      .toList)
      .foreach { p => graft.FsUtil.deleteTree(p); deleted += 1 }
    deleted
  }

  /** Latest signature per doc — the index's LWW over `_sig_epoch`. One
    * narrow HashAggregate + equi-join; a no-op when every doc was
    * signed once (the batch dd08/dd09 shape).
    */
  private[operators] def latestSigs(sigs: DataFrame,
                                    keyCol: String = "doc_id"): DataFrame = {
    val latest = sigs.groupBy(col(keyCol))
      .agg(max(col("_sig_epoch")).as("_sig_epoch"))
    sigs.join(latest, Seq(keyCol, "_sig_epoch"))
  }

  /** Near-dup candidate pairs of epoch `epochId` against itself AND the
    * strictly-older index epochs, with minhash-estimated Jaccard —
    * byte-identical semantics to the batch [[DedupQueries
    * .minhashLshPairs]] restricted to pairs whose younger side is in
    * this epoch. Pairs are (doc_a < doc_b)-oriented regardless of which
    * side is the new document.
    *
    * Re-signed docs (same doc_id in an older epoch — an updated url on
    * the streaming path) participate ONLY through their LATEST
    * signature: the logical index content is one signature per doc, so
    * the prior side drops both superseded versions and docs re-signed
    * by THIS epoch. Without that, a doc's two signature rows would
    * self-collide on every band and the est join-back would emit
    * duplicate pairs with conflicting estimates.
    */
  def epochPairs(spark: SparkSession, dir: String, epochId: Long): DataFrame = {
    val prior = committedEpochs(dir).filter(_ < epochId)
    val newAll = readSigs(spark, dir, Seq(epochId))
    // tombstone rows (deleted docs, all-null signature) participate only
    // in the EXCLUSION below — they generate no buckets and no pairs
    val newSigs = newAll.filter(col("mh_0").isNotNull)
    val newB = DedupQueries.sigBuckets(newSigs)
    val within = newB.as("x").join(newB.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    // prior side: latest-per-doc, minus docs this epoch re-signed OR
    // deleted (the anti-join key set is ALL of this epoch's rows incl.
    // tombstones), minus docs whose latest prior row is itself a
    // tombstone (deleted in an earlier epoch, never re-added)
    val priorLive =
      if (prior.isEmpty) None
      else Some(latestSigs(readSigs(spark, dir, prior))
        .filter(col("mh_0").isNotNull)
        .join(newAll.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    val cand0 = priorLive match {
      case None => within
      case Some(pl) =>
        val oldB = DedupQueries.sigBuckets(pl)
        // defense in depth: the prior side excludes this epoch's docs,
        // so equal ids cannot meet — keep the guard anyway
        val cross = newB.as("x").join(oldB.as("y"),
            col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
              col("x.doc_id") =!= col("y.doc_id"))
          .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
        within.unionByName(cross)
    }
    val cand = cand0.distinct()
    // doc-unique signature side (new ∪ live prior) — a duplicate
    // doc_id here would fan the est join out to duplicate pair rows
    val sigsAll = (priorLive match {
      case None => newSigs
      case Some(pl) => newSigs.unionByName(pl)
    }).drop("_sig_epoch")
    // est join-back: plain shuffle joins on doc_id — the index side is
    // narrow signature rows and at scale is NOT broadcastable (unlike
    // the batch op's test-scale broadcast)
    cand
      .join(sigsAll.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sigsAll.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(DedupQueries.sigMatchCount.cast("double") /
          DedupQueries.MinhashK, 4).as("est_jaccard"))
  }

  /** Commit `docs` as `epochId` and return its near-dup pairs against
    * itself ∪ the index — the one-call per-epoch dedup step an ingest
    * sink runs. The returned frame is lazy but reads only the files
    * committed up to this epoch (pinned paths).
    */
  def foldEpoch(spark: SparkSession, dir: String, epochId: Long,
                docs: DataFrame): DataFrame = {
    appendEpoch(spark, dir, epochId, docs)
    epochPairs(spark, dir, epochId)
  }

  /** EXACT-Jaccard verification of this epoch's index candidates:
    * [[epochPairs]] supplies the candidate set, and only the CANDIDATE
    * documents are shingled — shingling cost is pairs-bounded, never
    * corpus-bounded (the est-only gap of the signature path, closed).
    * `corpus` must carry (doc_id, text) for every doc the index has
    * seen; its scan is column-pruned and filtered by a broadcast join
    * on the pairs-bounded id set — one IO pass, zero re-shingling of
    * non-candidates. (On a lake table, candidate fetch additionally
    * prunes at the bucket level; against raw parquet it is a pruned
    * scan.) Exact Jaccard here is UNCAPPED (no corpus-wide doc-freq
    * valve — that is a batch-pass concept); the LSH banding already
    * bounds candidate fan-out.
    */
  def verifiedEpochPairs(spark: SparkSession, dir: String, epochId: Long,
                         corpus: DataFrame, threshold: Double,
                         requireFullCorpus: Boolean = true): DataFrame = {
    val cand = graft.analytics.SessionCaches.track(
      epochPairs(spark, dir, epochId).select(col("doc_a"), col("doc_b")))
    val ids = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    // ONE corpus pass, cached: the guard below and the shingle stage
    // both read these pairs-bounded (doc_id, text) rows from the block
    // store, so the corpus text is scanned exactly once per epoch
    val candDocs = graft.analytics.SessionCaches.track(
      corpus.select(col("doc_id"), col("text"))
        .join(broadcast(ids), Seq("doc_id")))
    // silent-wrong guard: a corpus missing docs the index has seen
    // would DROP their pairs through the inner joins below. Folded into
    // the candidate-fetch pass (round-4 advice — the previous
    // formulation paid a separate doc_id-only corpus scan per epoch):
    // the eager count materializes candDocs (which everything downstream
    // reuses) and the set difference runs on two cached pairs-bounded
    // frames. Pass requireFullCorpus = false to skip.
    if (requireFullCorpus) {
      val missing = ids
        .join(candDocs.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .count()
      require(missing == 0L,
        s"verifiedEpochPairs: corpus is missing $missing candidate " +
          "doc(s) the index has seen - their pairs would be silently " +
          "dropped (pass the full corpus, or requireFullCorpus=false)")
    }
    // hashed-shingle dedup — same 2^-64 tradeoff note as
    // DedupQueries.ngramJaccardPairs
    val sh = DedupQueries.shingles(candDocs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val shared = cand
      .join(shA, Seq("doc_a"))
      .join(shB, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
