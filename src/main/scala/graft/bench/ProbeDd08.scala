package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase profiler for the dd08/dd09 index fold (throwaway
  * measurement aid, not part of the bench contract).
  */
object ProbeDd08 {
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
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm like Bench
    Seq("dd08_incremental_neardup").foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      graft.analytics.SessionCaches.release(spark)
    }
    println("PROBE control " + PlatformControl.run(spark))

    // expression-stage bisect
    (1 to 2).foreach { r =>
      val docs0 = graft.analytics.Tables.documents(spark, sfDir)
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      t(s"b$r docs-count") { docs0.count() }
      println(s"PROBE b$r docs-partitions " + docs0.rdd.getNumPartitions)
      val sh = graft.analytics.DedupQueries.shingles(docs0)
      if (r == 1) println("PLANDUMP\n" +
        sh.queryExecution.optimizedPlan.toString.take(3000))
      t(s"b$r shingles-count") { sh.count() }
      println(s"PROBE b$r shingle-partitions " + sh.rdd.getNumPartitions)
      val shM = sh.persist()
      t(s"b$r shingles-count-warm") { shM.count() }
      t(s"b$r shingles-count-cached") { shM.count() }
      shM.unpersist()
      t(s"b$r h31-agg") {
        sh.select(graft.analytics.Hashing.h31(col("shingle")).as("h"))
          .agg(max(col("h"))).collect()
      }
      t(s"b$r sig-noop") {
        graft.analytics.DedupQueries.minhashSignatures(docs0)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // sub-step timings of one append's constituent jobs
    (1 to 2).foreach { r =>
      val docs0 = graft.analytics.Tables.documents(spark, sfDir)
        .filter(pmod(col("doc_id"), lit(2)) === 0)
      val dir0 = graft.FsUtil.scratchDir("probe-sub")
      val sigs = graft.analytics.DedupQueries.minhashSignatures(docs0)
        .withColumn("_sig_epoch", lit(0L))
      t(s"s$r sig-noop") {
        sigs.write.format("noop").mode("overwrite").save()
      }
      t(s"s$r sig-write") {
        sigs.write.mode("overwrite").parquet(s"$dir0/sigs")
      }
      val back = spark.read.parquet(s"$dir0/sigs")
      t(s"s$r buckets-write") {
        graft.analytics.DedupQueries
          .sigBuckets(back.filter(col("mh_0").isNotNull),
            carry = Seq("_sig_epoch"))
          .withColumn("sb", pmod(xxhash64(col("band"), col("bkt.r0"),
            col("bkt.r1"), col("bkt.r2"), col("bkt.r3")), lit(16)))
          .write.mode("overwrite").partitionBy("sb")
          .parquet(s"$dir0/buckets")
      }
      t(s"s$r bloom") {
        val n = back.count()
        back.select(col("doc_id")).stat.bloomFilter("doc_id",
          math.max(n, 1L), 0.01)
      }
    }

    (1 to 2).foreach { round =>
      val dir = graft.FsUtil.scratchDir("probe-dd08")
      val docs = graft.analytics.Tables.documents(spark, sfDir)
      val e0 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val e1 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      t(s"r$round append e0") {
        graft.operators.DedupIndex.appendEpoch(spark, dir, 0L, e0)
      }
      val p0 = t(s"r$round pairs-plan e0") {
        graft.operators.DedupIndex.epochPairs(spark, dir, 0L)
      }
      t(s"r$round pairs-count e0") { p0.count() }
      t(s"r$round append e1") {
        graft.operators.DedupIndex.appendEpoch(spark, dir, 1L, e1)
      }
      val p1 = t(s"r$round pairs-plan e1") {
        graft.operators.DedupIndex.epochPairs(spark, dir, 1L)
      }
      t(s"r$round pairs-count e1") { p1.count() }
      t(s"r$round union-count") { p0.unionByName(p1).count() }
      graft.analytics.SessionCaches.releaseAnonymous(spark)
    }
    spark.stop()
  }
}
