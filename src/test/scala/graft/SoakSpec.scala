package graft

import org.apache.spark.sql.functions._
import graft.feedgen.FeedGen
import graft.streaming.{CdcIngest, DomainStatsRollup}
import graft.table.LakeTable

/** Restart soak (SURVEY §5.3 / north rule "resumable from any
  * checkpoint"): the WAL grows segment by segment while the ingest is
  * repeatedly stopped and restarted at RANDOM boundaries — 10 cycles,
  * both sinks (table + domain stats) attached. The end state must equal
  * a single uninterrupted replay, exactly.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  test("10 restart cycles at random WAL boundaries == one replay; both sinks exact") {
    val cfg = FeedGen.Config(seed = 99L, n = 20000L, nDomains = 60,
      pathsPerDomain = 8, dupRate = 0.06, evolveAt = 12000L, segments = 20)
    val base = tmpDir("soak")
    // stage all segments OUTSIDE the watched dir, reveal them gradually
    val staged = FeedGen.writeSegments(spark, cfg, s"$base/staged")
      .map(java.nio.file.Paths.get(_))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/feed/wal"))
    val rnd = new scala.util.Random(5)
    var revealed = 0
    var cycles = 0
    while (revealed < staged.size) {
      val k = math.min(1 + rnd.nextInt(3), staged.size - revealed)
      staged.slice(revealed, revealed + k).foreach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(s"$base/feed/wal").resolve(p.getFileName))
      }
      revealed += k
      cycles += 1
      CdcIngest.start(spark, s"$base/feed", s"$base/t", s"$base/c",
        numBuckets = 8, maxFilesPerTrigger = Some(1),
        statsDir = Some(s"$base/stats")).awaitTermination()
    }
    assert(cycles >= 8, s"soak degenerated to $cycles cycles")

    val feed = FeedGen.readFeed(spark, s"$base/feed")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"url").orderBy($"warc_ts".desc, $"seq".desc)
    val exp = feed.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D").drop("rn", "op")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"url", $"seq", $"warc_ts".cast("long"), $"text", $"lang",
          coalesce($"extra_score", lit(-1.0)),
          md5(coalesce($"html", lit(Array.empty[Byte]))))
        .collect().map(_.toString).sorted
    assert(key(LakeTable.readLive(spark, s"$base/t")) === key(exp))

    // the stats dimension survived every restart additively
    val stats = DomainStatsRollup.read(spark, s"$base/stats")
    val statsExp = DomainStatsRollup.delta(feed)
    assert(stats.exceptAll(statsExp).count() +
      statsExp.exceptAll(stats).count() === 0L)

    // ledger: every epoch exactly once, lineage covers the whole WAL
    val snap = LakeTable.load(s"$base/t")
    // bounded ledger: contiguous streaming epochs collapse into the
    // floor, the above-floor list stays empty, totals count every epoch
    assert(snap.committedEpochs.isEmpty)
    assert(snap.epochFloor === snap.totals.epochs - 1)
    assert(snap.lineage.values.max === cfg.n - 1)
  }
}
