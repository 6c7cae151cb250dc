package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.feedgen.FeedGen
import graft.operators.MergeInto
import graft.streaming.CdcIngest
import graft.table.LakeTable

/** Streaming ingest semantics: multi-epoch tail equals batch replay,
  * checkpoint resume picks up only new WAL segments, epoch redelivery is
  * a no-op (exactly-once), restart with no data is a no-op.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val cfg = FeedGen.Config(seed = 11L, n = 6000L, nDomains = 40,
    pathsPerDomain = 6, evolveAt = 4000L, segments = 3)

  def oracle(feed: DataFrame): DataFrame = {
    val w = Window.partitionBy($"url").orderBy($"warc_ts".desc, $"seq".desc)
    feed.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D").drop("rn", "op")
  }
  def key(df: DataFrame): Array[String] =
    df.select($"url", $"seq", $"warc_ts".cast("long"), $"text")
      .collect().map(_.toString).sorted

  test("JSONL WAL segments ingest to the identical state as parquet segments") {
    val c = cfg.copy(seed = 33L, n = 4000L)
    val base = tmpDir("stream-json")
    FeedGen.writeSegments(spark, c, s"$base/pq")
    FeedGen.writeSegments(spark, c, s"$base/js", format = "json")
    CdcIngest.runAvailableNow(spark, s"$base/pq", s"$base/t1", s"$base/c1",
      numBuckets = 8)
    CdcIngest.start(spark, s"$base/js", s"$base/t2", s"$base/c2",
      numBuckets = 8, feedFormat = "json").awaitTermination()
    def full(dir: String): Array[String] =
      LakeTable.readLive(spark, dir)
        .select($"url", $"seq", $"warc_ts".cast("long"), $"text", $"lang",
          coalesce($"extra_score", lit(-1.0)),
          md5(coalesce($"html", lit(Array.empty[Byte]))))
        .collect().map(_.toString).sorted
    // byte-identical through the base64 round-trip, html included
    assert(full(s"$base/t1") === full(s"$base/t2"))
    assert(full(s"$base/t1").nonEmpty)
  }

  test("streaming resumes across a mid-stream rebucket; state stays exact") {
    val c = cfg.copy(seed = 44L, n = 4000L)
    val base = tmpDir("stream-rb")
    FeedGen.writeSegments(spark, c, s"$base/feed")
    CdcIngest.runAvailableNow(spark, s"$base/feed", s"$base/t", s"$base/c",
      numBuckets = 8)
    // operational resize while the stream is stopped (the realistic
    // maintenance window), then the checkpointed stream resumes onto the
    // 32-bucket layout
    graft.table.Maintenance.rebucket(spark, s"$base/t", newBuckets = 32)
    val c2 = c.copy(n = 5000L)
    FeedGen.appendSegment(spark, s"$base/feed",
      FeedGen.events(spark, c2).toDF().filter($"seq" >= 3995L), "t1")
    CdcIngest.runAvailableNow(spark, s"$base/feed", s"$base/t", s"$base/c",
      numBuckets = 8) // creation-time bucket arg ignored: table exists
    val snap = LakeTable.load(s"$base/t")
    assert(snap.numBuckets === 32)
    assert(key(LakeTable.readLive(spark, s"$base/t")) ===
      key(oracle(FeedGen.readFeed(spark, s"$base/feed"))))
  }

  test("multi-source parallel sync: two concurrent feeds ingest independently") {
    // reference analog: N chats synced by concurrent flows
    // (orchestration.py:166–225) — here N independent streaming queries
    // share one session, each with its own checkpoint/table/ledger
    val base = tmpDir("stream-multi")
    val cfgA = cfg.copy(seed = 101L, n = 3000L)
    val cfgB = cfg.copy(seed = 202L, n = 3000L)
    FeedGen.writeSegments(spark, cfgA, s"$base/feedA")
    FeedGen.writeSegments(spark, cfgB, s"$base/feedB")
    val qA = CdcIngest.start(spark, s"$base/feedA", s"$base/tA", s"$base/cA",
      numBuckets = 8, maxFilesPerTrigger = Some(1))
    val qB = CdcIngest.start(spark, s"$base/feedB", s"$base/tB", s"$base/cB",
      numBuckets = 8, maxFilesPerTrigger = Some(1))
    qA.awaitTermination(); qB.awaitTermination()
    assert(key(LakeTable.readLive(spark, s"$base/tA")) ===
      key(oracle(FeedGen.readFeed(spark, s"$base/feedA"))))
    assert(key(LakeTable.readLive(spark, s"$base/tB")) ===
      key(oracle(FeedGen.readFeed(spark, s"$base/feedB"))))
    // ledgers are per-table: both committed their own epochs
    assert(LakeTable.load(s"$base/tA").totals.epochs > 0)
    assert(LakeTable.load(s"$base/tB").totals.epochs > 0)
  }

  test("streaming multi-epoch ingest == batch LWW oracle; resume on new segment") {
    val base = tmpDir("stream")
    val feedDir = s"$base/feed"
    val tableDir = s"$base/table"
    val ckpt = s"$base/ckpt"
    FeedGen.writeSegments(spark, cfg, feedDir)

    CdcIngest.runAvailableNow(spark, feedDir, tableDir, ckpt,
      numBuckets = 8, maxFilesPerTrigger = Some(2))
    val snap1 = LakeTable.load(tableDir)
    assert(snap1.totals.epochs > 1, "expected multiple epochs")
    assert(key(LakeTable.readLive(spark, tableDir)) ===
      key(oracle(FeedGen.readFeed(spark, feedDir))))

    // no-op restart: no new snapshot
    CdcIngest.runAvailableNow(spark, feedDir, tableDir, ckpt,
      numBuckets = 8, maxFilesPerTrigger = Some(2))
    assert(LakeTable.load(tableDir).snapshotId === snap1.snapshotId)

    // a new WAL segment arrives; the stream resumes from checkpoint
    val cfg2 = cfg.copy(n = 8000L)
    FeedGen.appendSegment(spark, feedDir,
      spark.range(6000L, 8000L).map(i => FeedGen.event(cfg2, i)).toDF(), "t1")
    CdcIngest.runAvailableNow(spark, feedDir, tableDir, ckpt,
      numBuckets = 8, maxFilesPerTrigger = Some(2))
    val snap2 = LakeTable.load(tableDir)
    assert(snap2.totals.epochs > snap1.totals.epochs)
    assert(key(LakeTable.readLive(spark, tableDir)) ===
      key(oracle(FeedGen.readFeed(spark, feedDir))))
    // lineage advanced to the new max seq
    assert(snap2.lineage.values.max === 7999L)

    // exactly-once: a redelivered epoch (simulated foreachBatch retry)
    val someBatch = FeedGen.readFeed(spark, feedDir).filter($"seq" < 1000)
    val r = MergeInto.merge(spark, tableDir, someBatch, 0L)
    assert(snap2.isCommitted(0L))
    assert(!r.applied)
    assert(LakeTable.load(tableDir).snapshotId === snap2.snapshotId)
  }

  test("enrichment seam: per-batch transform applies exactly-once before merge") {
    val base = tmpDir("enrich")
    FeedGen.writeSegments(spark, cfg, s"$base/feed")
    // enrichment: normalize lang to upper case (the reference's
    // metrics/LLM enrichment attaches at this seam, SURVEY §3.3)
    val q = CdcIngest.start(spark, s"$base/feed", s"$base/table",
      s"$base/ckpt", numBuckets = 8, maxFilesPerTrigger = Some(2),
      transform = df => df.withColumn("lang", upper(col("lang"))))
    q.awaitTermination()
    val langs = LakeTable.readLive(spark, s"$base/table")
      .select($"lang").distinct().as[String].collect()
    assert(langs.nonEmpty && langs.forall(l => l == null || l == l.toUpperCase))
    // state otherwise equals the oracle (enrichment is a projection)
    val want = oracle(FeedGen.readFeed(spark, s"$base/feed"))
      .withColumn("lang", upper($"lang"))
    assert(key(LakeTable.readLive(spark, s"$base/table")) === key(want))
  }

  test("ingest metrics ledger records every epoch with throughput") {
    val base = tmpDir("ledger")
    FeedGen.writeSegments(spark, cfg, s"$base/feed")
    CdcIngest.runAvailableNow(spark, s"$base/feed", s"$base/table",
      s"$base/ckpt", numBuckets = 8, maxFilesPerTrigger = Some(1))
    val snap = LakeTable.load(s"$base/table")
    assert(snap.epochStats.nonEmpty)
    assert(snap.epochStats.map(_.events).sum === cfg.n)
    assert(snap.epochStats.forall(e => e.durationMs > 0 && e.eventsPerSec > 0))
    // per-bucket lineage offsets cover every touched bucket
    assert(snap.lineage.nonEmpty && snap.lineage.values.forall(_ >= 0L))
  }
}
