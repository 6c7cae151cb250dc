package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.feedgen.FeedGen
import graft.streaming.CdcIngest
import graft.table.LakeTable

/** True tail mode: a ProcessingTime-triggered query ingests WAL segments
  * that arrive WHILE it runs (reference analog: polling_flow,
  * orchestration.py:84–163 — poll every interval, continue across
  * batches).
  */
class TailModeSpec extends SparkSpec {
  import spark.implicits._

  test("non-binary-capable WAL formats are refused up front") {
    val base = tmpDir("fmt-guard")
    val e = intercept[IllegalArgumentException] {
      CdcIngest.start(spark, s"$base/feed", s"$base/table", s"$base/ckpt",
        feedFormat = "csv")
    }
    assert(e.getMessage.contains("parquet"))
  }

  test("processing-time tail ingests segments appearing while the query runs") {
    val base = tmpDir("tail")
    val feedDir = s"$base/feed"
    val tableDir = s"$base/table"
    val cfg = FeedGen.Config(seed = 21L, n = 1000L, nDomains = 20,
      pathsPerDomain = 5, segments = 1)
    FeedGen.writeSegments(spark, cfg, feedDir)
    // duplicate redeliveries re-emit the PREVIOUS seq, so the highest seq
    // actually present in a range can be < n-1 — compute it exactly
    def maxSeq(c: FeedGen.Config, lo: Long, hi: Long): Long =
      (lo until hi).map(i => FeedGen.event(c, i).seq).max
    val hw1 = maxSeq(cfg, 0L, 1000L)
    val q = CdcIngest.start(spark, feedDir, tableDir, s"$base/ckpt",
      numBuckets = 4, maxFilesPerTrigger = None,
      trigger = Trigger.ProcessingTime("300 milliseconds"))
    try {
      // wait for the initial segment to land
      var tries = 0
      def committed = LakeTable.load(tableDir).lineage.values.foldLeft(-1L)(math.max)
      while (committed < hw1 && tries < 100) { Thread.sleep(200); tries += 1 }
      assert(committed === hw1, "initial segment not ingested")

      // two more segments arrive live
      val cfg2 = cfg.copy(n = 3000L)
      FeedGen.appendSegment(spark, feedDir,
        spark.range(1000L, 2000L).map(i => FeedGen.event(cfg2, i)).toDF(), "t1")
      FeedGen.appendSegment(spark, feedDir,
        spark.range(2000L, 3000L).map(i => FeedGen.event(cfg2, i)).toDF(), "t2")
      val hw2 = maxSeq(cfg2, 0L, 3000L)
      tries = 0
      while (committed < hw2 && tries < 150) { Thread.sleep(200); tries += 1 }
      assert(committed === hw2, "live segments not ingested")
    } finally q.stop()

    // final state equals batch replay of everything
    import org.apache.spark.sql.expressions.Window
    val feed = FeedGen.readFeed(spark, feedDir)
    val w = Window.partitionBy($"url").orderBy($"warc_ts".desc, $"seq".desc)
    val exp = feed.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D")
    val got = LakeTable.readLive(spark, tableDir)
    assert(got.count() === exp.count())
    val k = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"url", $"seq").collect().map(_.toString).sorted
    assert(k(got) === k(exp.drop("rn", "op")))
  }
}
