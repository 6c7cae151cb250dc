package graft

import org.apache.spark.sql.functions._
import graft.feedgen.FeedGen
import graft.operators.MergeInto
import graft.table.{LakeTable, Maintenance}

/** Vacuum + compaction preserve logical state; orphans and superseded
  * snapshots are reclaimed; tombstone expiry honors its horizon.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  val cfg = FeedGen.Config(seed = 9L, n = 4000L, nDomains = 40,
    pathsPerDomain = 6, segments = 2)

  def state(dir: String): Array[String] =
    LakeTable.readLive(spark, dir)
      .select($"url", $"seq", $"text").collect().map(_.toString).sorted

  test("compact to one file per bucket + vacuum reclaims superseded files; state unchanged") {
    val dir = tmpDir("maint") + "/t"
    LakeTable.create(dir, numBuckets = 8)
    val feed = FeedGen.events(spark, cfg).toDF()
    (0 until 4).foreach { e =>
      MergeInto.merge(spark, dir,
        feed.filter($"seq" >= e * 1000L && $"seq" < (e + 1) * 1000L), e.toLong)
    }
    val before = state(dir)
    val snapBefore = LakeTable.load(dir)

    val s2 = Maintenance.compact(spark, dir)
    assert(state(dir) === before)
    assert(s2.files.size <= snapBefore.numBuckets)
    assert(s2.liveRows === snapBefore.liveRows)
    assert(s2.committedEpochs === snapBefore.committedEpochs) // ledger preserved

    // vacuum with zero grace removes every superseded/orphan file
    val deleted = Maintenance.vacuum(dir, graceMs = 0L)
    assert(deleted > 0)
    assert(state(dir) === before) // current snapshot untouched
    // every referenced file still exists
    val s3 = LakeTable.load(dir)
    s3.files.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, f.path)))
    }
  }

  test("tombstone expiry drops only tombstones older than the horizon") {
    val dir = tmpDir("maint-ts") + "/t"
    LakeTable.create(dir, numBuckets = 4)
    def ev(seq: Long, op: String, url: String, ts: Long) =
      (seq, op, url, new java.sql.Timestamp(ts), null: Array[Byte],
        if (op == "D") null else s"t$seq", "en", null.asInstanceOf[java.lang.Double])
    val cols = graft.model.CdcSchema.latest.fieldNames
    val b = Seq(
      ev(1, "D", "https://a/1", 1000L),     // old tombstone (expired)
      ev(2, "D", "https://a/2", 9000000L),  // recent tombstone (kept)
      ev(3, "U", "https://a/3", 5000L)).toDF(cols: _*)
    MergeInto.merge(spark, dir, b, 0L)
    assert(LakeTable.load(dir).tombstones === 2L)

    Maintenance.compact(spark, dir, tombstoneHorizonMs = 1000000L)
    val snap = LakeTable.load(dir)
    assert(snap.tombstones === 1L)
    assert(snap.liveRows === 1L)
    // the kept tombstone still guards against a late update
    val late = Seq(ev(0, "U", "https://a/2", 8000000L)).toDF(cols: _*)
    MergeInto.merge(spark, dir, late, 1L)
    assert(LakeTable.readLive(spark, dir).filter($"url" === "https://a/2").count() === 0L)
  }

  test("autoMaintain: compacts only past the delta threshold; vacuums orphans") {
    val dir = tmpDir("maint-auto") + "/t"
    LakeTable.create(dir, numBuckets = 4)
    val feed = FeedGen.events(spark, cfg).toDF()
    MergeInto.merge(spark, dir, feed.filter($"seq" < 2000L), 0L)
    // 3 small MoR epochs → some delta files, below the threshold
    (0 until 3).foreach { e =>
      MergeInto.merge(spark, dir,
        feed.filter($"seq" >= 2000L + e * 100L && $"seq" < 2100L + e * 100L),
        (e + 1).toLong, MergeInto.MergeOnRead)
    }
    val before = state(dir)
    val deltas = LakeTable.load(dir).files.count(_.kind == "delta")
    assert(deltas > 0)
    // threshold above current overlay: no compaction
    val (c1, _) = Maintenance.autoMaintain(spark, dir,
      maxDeltaFiles = deltas + 1, vacuumGraceMs = 0L)
    assert(!c1 && LakeTable.load(dir).files.count(_.kind == "delta") === deltas)
    // threshold below: compaction folds the overlay, vacuum reclaims
    val (c2, vac) = Maintenance.autoMaintain(spark, dir,
      maxDeltaFiles = deltas - 1, vacuumGraceMs = 0L)
    assert(c2 && vac > 0)
    assert(LakeTable.load(dir).files.forall(_.kind == "base"))
    assert(state(dir) === before)
  }

  test("rebucket 8→32: state unchanged, new layout live, later merges + changelog work") {
    val dir = tmpDir("maint-rb") + "/t"
    LakeTable.create(dir, numBuckets = 8)
    val feed = FeedGen.events(spark, cfg).toDF()
    MergeInto.merge(spark, dir, feed.filter($"seq" < 1500L), 0L)
    // leave a delta overlay in place so rebucket also folds MoR state
    MergeInto.merge(spark, dir,
      feed.filter($"seq" >= 1500L && $"seq" < 3000L), 1L, MergeInto.MergeOnRead)
    val before = state(dir)
    val snapBefore = LakeTable.load(dir)

    val s2 = Maintenance.rebucket(spark, dir, newBuckets = 32)
    assert(s2.numBuckets === 32)
    assert(state(dir) === before)
    assert(s2.committedEpochs === snapBefore.committedEpochs)
    assert(s2.files.forall(_.kind == "base")) // overlays folded
    // files actually live in the new layout
    assert(s2.files.map(_.bucket).max > 7)

    // a later merge prunes/writes on the NEW layout and stays correct
    MergeInto.merge(spark, dir, feed.filter($"seq" >= 3000L), 2L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"url").orderBy($"warc_ts".desc, $"seq".desc)
    val exp = feed.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D")
      .select($"url", $"seq", $"text").collect().map(_.toString).sorted
    assert(state(dir) === exp)

    // changelog across the rebucket is a barrier; from the rebucketed
    // snapshot onward it works and reports exactly the new epoch's wins
    val err = intercept[IllegalArgumentException] {
      graft.table.Changelog.changesSince(spark, dir, snapBefore.snapshotId)
    }
    assert(err.getMessage.contains("re-bucket"))
    val changes = graft.table.Changelog.changesSince(spark, dir, s2.snapshotId)
    assert(changes.count() > 0)
    assert(changes.agg(min($"seq")).head.getLong(0) >= 3000L)
  }
}
