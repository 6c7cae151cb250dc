package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.feedgen.FeedGen
import graft.model.CdcSchema
import graft.operators.MergeInto
import graft.table.{LakeTable, Maintenance}

/** Merge-on-read write path: delta overlays, read-time LWW resolution,
  * auto CoW/MoR policy, fold-in, compaction and vacuum over deltas.
  * Every test compares against the copy-on-write result or the raw-log
  * oracle — MoR is a pure write-path strategy; visible state must be
  * bit-identical.
  */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  val cfg = FeedGen.Config(seed = 7L, n = 6000L, nDomains = 40,
    pathsPerDomain = 6, evolveAt = 4000L, segments = 4)

  def key(df: DataFrame): Array[String] =
    df.select($"url", $"warc_ts".cast("long"), $"seq", $"text", $"lang",
        coalesce($"extra_score", lit(-1.0)),
        md5(coalesce($"html", lit(Array.empty[Byte]))))
      .collect().map(_.toString).sorted

  /** Ingest the seeded feed in `epochs` seq-range slices with the given
    * merge mode; returns the table dir.
    */
  def ingest(mode: MergeInto.MergeMode, epochs: Seq[(Long, Long)],
             buckets: Int = 8): String = {
    val feedDir = tmpDir("mor-feed")
    val dir = tmpDir("mor-table")
    FeedGen.writeSegments(spark, cfg, feedDir)
    LakeTable.create(dir, numBuckets = buckets)
    val feed = FeedGen.readFeed(spark, feedDir)
    epochs.zipWithIndex.foreach { case ((lo, hi), e) =>
      MergeInto.merge(spark, dir,
        feed.filter($"seq" >= lo && $"seq" < hi), e.toLong, mode)
    }
    dir
  }

  val epochs = Seq((0L, 2500L), (2500L, 4000L), (4000L, 5200L), (5200L, 6000L))

  test("forced MoR final state == forced CoW final state == raw-log oracle") {
    val morDir = ingest(MergeInto.MergeOnRead, epochs)
    val cowDir = ingest(MergeInto.CopyOnWrite, epochs)
    val mor = LakeTable.readLive(spark, morDir)
    val cow = LakeTable.readLive(spark, cowDir)
    assert(key(mor) === key(cow))
    // MoR path really produced deltas and never rewrote the base
    val snap = LakeTable.load(morDir)
    assert(snap.files.count(_.kind == "delta") > 0)
    // exactly-once holds on the MoR path too: redelivered epoch no-ops
    // before any work (checked before schema alignment, so the batch
    // contents are irrelevant here)
    val r = MergeInto.merge(spark, morDir,
      spark.emptyDataFrame, 1L, MergeInto.MergeOnRead)
    assert(!r.applied)
  }

  test("delta tombstone shadows base row; newer base-era update does not resurrect") {
    val dir = tmpDir("mor-del")
    LakeTable.create(dir, numBuckets = 4)
    def ev(seq: Long, op: String, ts: Long, text: String) =
      (seq, op, "https://m.example.com/1",
        new java.sql.Timestamp(ts), null: Array[Byte], text, "en",
        null.asInstanceOf[java.lang.Double])
    val cols = CdcSchema.latest.fieldNames
    MergeInto.merge(spark, dir,
      Seq(ev(1, "I", 1000L, "v1")).toDF(cols: _*), 0L, MergeInto.CopyOnWrite)
    MergeInto.merge(spark, dir,
      Seq(ev(3, "D", 3000L, null)).toDF(cols: _*), 1L, MergeInto.MergeOnRead)
    assert(LakeTable.load(dir).files.exists(_.kind == "delta"))
    assert(LakeTable.readLive(spark, dir).count() === 0L)
    // an update older than the delta tombstone stays dead (also via MoR)
    MergeInto.merge(spark, dir,
      Seq(ev(2, "U", 2000L, "late")).toDF(cols: _*), 2L, MergeInto.MergeOnRead)
    assert(LakeTable.readLive(spark, dir).count() === 0L)
  }

  test("auto policy: big initial batch → CoW base; small tail epoch → MoR delta; cap forces fold-in") {
    val feedDir = tmpDir("auto-feed")
    val dir = tmpDir("auto-table")
    FeedGen.writeSegments(spark, cfg, feedDir)
    LakeTable.create(dir, numBuckets = 4)
    val feed = FeedGen.readFeed(spark, feedDir)
    MergeInto.merge(spark, dir, feed.filter($"seq" < 5500L), 0L)
    val s0 = LakeTable.load(dir)
    assert(s0.files.nonEmpty && s0.files.forall(_.kind == "base"),
      "initial load must be copy-on-write")
    // tiny tail epoch (~20 keys vs ~260 base rows) chooses MoR
    MergeInto.merge(spark, dir, feed.filter($"seq" >= 5500L && $"seq" < 5520L), 1L)
    val s1 = LakeTable.load(dir)
    assert(s1.files.exists(_.kind == "delta"), "small tail epoch must append deltas")
    // hammer one bucket past the cap → auto falls back to CoW and folds in
    var e = 2L
    var snap = s1
    while (snap.files.exists(_.kind == "delta") && e < 40L) {
      MergeInto.merge(spark, dir,
        feed.filter($"seq" >= 5500L + e * 10 && $"seq" < 5510L + e * 10), e)
      snap = LakeTable.load(dir)
      e += 1
    }
    assert(e < 40L, "delta-cap fold-in never triggered within 38 epochs")
    // final state == raw-log oracle over the exact event set applied
    val applied = feed.filter($"seq" < 5520L ||
      ($"seq" >= 5520L && $"seq" < 5510L + (e - 1) * 10))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"url").orderBy($"warc_ts".desc, $"seq".desc)
    val oracle = applied.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D").drop("rn", "op")
    assert(key(LakeTable.readLive(spark, dir)) === key(oracle))
  }

  test("compaction folds deltas; live state unchanged; vacuum reclaims old files") {
    val dir = ingest(MergeInto.MergeOnRead, epochs)
    val before = key(LakeTable.readLive(spark, dir))
    val sBefore = LakeTable.load(dir)
    assert(sBefore.files.exists(_.kind == "delta"))
    val s2 = Maintenance.compact(spark, dir)
    assert(s2.files.forall(_.kind == "base"))
    assert(key(LakeTable.readLive(spark, dir)) === before)
    // exact accounting restored: liveRows == live row count
    assert(s2.liveRows === before.length.toLong)
    val deleted = Maintenance.vacuum(dir, graceMs = 0L)
    assert(deleted > 0)
    assert(key(LakeTable.readLive(spark, dir)) === before)
  }

  test("clean CoW table read has no shuffle; delta table read collapses only dirty buckets") {
    val cowDir = ingest(MergeInto.CopyOnWrite, epochs)
    val cowPlan = LakeTable.readLive(spark, cowDir)
      .queryExecution.executedPlan.toString
    assert(!cowPlan.contains("Exchange"),
      s"copy-on-write readLive must be shuffle-free, got:\n$cowPlan")
    val morDir = ingest(MergeInto.MergeOnRead, epochs)
    val morPlan = LakeTable.readLive(spark, morDir)
      .queryExecution.executedPlan.toString
    assert(morPlan.contains("Exchange") || morPlan.contains("Aggregate"),
      "merge-on-read readLive must resolve deltas")
  }
}
