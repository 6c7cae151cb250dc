package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase profiler for the dd13 incremental-cluster fold
  * (throwaway measurement aid, not part of the bench contract).
  */
object ProbeDd13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    Seq("dd13_incremental_clusters").foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      graft.analytics.SessionCaches.release(spark)
    }
    println("PROBE control " + PlatformControl.run(spark))

    (1 to 2).foreach { r =>
      val docs = graft.analytics.Tables.documents(spark, sfDir)
      val ix = graft.FsUtil.scratchDir("p13-ix")
      t(s"r$r shingle-append-0") {
        graft.operators.ShingleIndex.appendEpoch(spark, ix, 0L,
          docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      }
      t(s"r$r shingle-append-1") {
        graft.operators.ShingleIndex.appendEpoch(spark, ix, 1L,
          docs.filter(pmod(col("doc_id"), lit(2)) === 1))
      }
      val p0 = t(s"r$r pairs-plan-0") {
        graft.analytics.SessionCaches.track(
          graft.operators.ShingleIndex.epochPairs(spark, ix, 0L, 0.8))
      }
      t(s"r$r pairs-count-0") { p0.count() }
      val p1 = t(s"r$r pairs-plan-1") {
        graft.analytics.SessionCaches.track(
          graft.operators.ShingleIndex.epochPairs(spark, ix, 1L, 0.8))
      }
      t(s"r$r pairs-count-1") { p1.count() }
      val cl = graft.FsUtil.scratchDir("p13-cl")
      t(s"r$r cluster-fold-0") {
        graft.operators.ClusterIndex.foldEpoch(spark, cl, 0L,
          p0.select(col("doc_a"), col("doc_b")))
      }
      t(s"r$r cluster-fold-1") {
        graft.operators.ClusterIndex.foldEpoch(spark, cl, 1L,
          p1.select(col("doc_a"), col("doc_b")))
      }
      t(s"r$r read-labels") {
        graft.operators.ClusterIndex.readLabels(spark, cl).count()
      }
      graft.analytics.SessionCaches.releaseAnonymous(spark)
    }
    spark.stop()
  }
}
