package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{SessionCaches, Tables}
import graft.operators.ShingleIndex

/** Evidence for the exact-pair index's broadcast-supersession fold
  * (ShingleIndex [[graft.operators.ShingleIndex.MirrorFeature]]): the
  * legacy path resolves latest-per-doc with a groupBy + join-back over
  * the WHOLE shingle store — the largest artifact the engine persists,
  * O(corpus words) rows — so its per-fold shuffle grows with the
  * corpus; the mirrored path's supersession is two broadcast anti-joins
  * (epoch docs + resigned/ lists) and its only index-sized cost is the
  * narrow columnar scan the candidate join needs anyway.
  *
  * Same trial matrix as [[BucketedFoldBench]]: ONE epoch slice folds
  * into a small and a large history, both paths on the SAME indexes
  * (`forceLegacy` re-reads an identical mirror-era index through the
  * groupBy anchor), pair counts asserted equal, per-trial shuffle
  * bytes from a stage listener, inline platform controls.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     SPARK_GRAFT_DEDUP_X=8 sbt -batch "runMain graft.bench.ShingleFoldBench"
  */
object ShingleFoldBench {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val densifyX = sys.env.getOrElse("SPARK_GRAFT_DEDUP_X", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-shingle-fold-bench")
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
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-shbench"
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
    val histA = sys.env.getOrElse("SPARK_GRAFT_HIST_A", "22").toInt
    val histB = sys.env.getOrElse("SPARK_GRAFT_HIST_B", "88").toInt
    require(histA < histB && histB <= 90)
    val histSmall = docs.filter(pct < histA)
    val histBig = docs.filter(pct < histB)
    val ep5 = docs.filter(pct >= 90 && pct < 95)

    def build(hist: org.apache.spark.sql.DataFrame): String = {
      val d = java.nio.file.Files.createTempDirectory(root, "ix").toString
      ShingleIndex.appendEpoch(spark, d, 0L, hist)
      ShingleIndex.appendEpoch(spark, d, 1L, ep5)
      d
    }

    try {
      val nDocs = docs.count()
      val wDir = java.nio.file.Files.createTempDirectory(root, "warm").toString
      ShingleIndex.foldEpoch(spark, wDir,
        0L, Tables.documents(spark, "/root/testdata/sf0.001"), 0.8).count()
      SessionCaches.release(spark)

      // forceLegacy re-resolves the SAME index, so one pair per history
      val (dirSmall, dirBig) = (build(histSmall), build(histBig))
      SessionCaches.release(spark)

      val c1 = PlatformControl.run(spark)
      val mSmall = scoped(
        ShingleIndex.epochPairs(spark, dirSmall, 1L, 0.8).count())
      SessionCaches.release(spark)
      val c2 = PlatformControl.run(spark)
      val mBig = scoped(
        ShingleIndex.epochPairs(spark, dirBig, 1L, 0.8).count())
      SessionCaches.release(spark)
      val c3 = PlatformControl.run(spark)
      val lSmall = scoped(
        ShingleIndex.epochPairs(spark, dirSmall, 1L, 0.8,
          forceLegacy = true).count())
      SessionCaches.release(spark)
      val c4 = PlatformControl.run(spark)
      val lBig = scoped(
        ShingleIndex.epochPairs(spark, dirBig, 1L, 0.8,
          forceLegacy = true).count())
      SessionCaches.release(spark)

      require(mSmall.pairs == lSmall.pairs && mBig.pairs == lBig.pairs,
        s"mirrored/legacy folds disagree: $mSmall vs $lSmall, $mBig vs $lBig")
      def j(t: Trial) =
        s"""{"sec":${f"${t.wall}%.2f"},"shuffle_read_mb":${t.readMb},"shuffle_write_mb":${t.writeMb}}"""
      println(s"""{"metric":"shingle_fold","sf":"$sfDir","densify_x":$densifyX,"docs":$nDocs,"cores":$cores,"hist_pct":[$histA,$histB],"pairs_small":${mSmall.pairs},"pairs_big":${mBig.pairs},"mirrored_small":${j(mSmall)},"mirrored_big":${j(mBig)},"legacy_small":${j(lSmall)},"legacy_big":${j(lBig)},"controls_sec":[${f"$c1%.2f"},${f"$c2%.2f"},${f"$c3%.2f"},${f"$c4%.2f"}],"mirrored_shuffle_growth":${f"${mBig.readMb.toDouble / math.max(mSmall.readMb, 1L)}%.2f"},"legacy_shuffle_growth":${f"${lBig.readMb.toDouble / math.max(lSmall.readMb, 1L)}%.2f"}}""")
    } finally {
      graft.FsUtil.deleteTree(root)
      spark.stop()
    }
  }
}
