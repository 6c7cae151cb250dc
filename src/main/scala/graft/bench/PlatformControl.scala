package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Inline platform-speed control: a fixed shuffle-free whole-stage-
  * codegen hash loop (xxhash64 over a range, map-side partial avg — the
  * same probe ScalingBench's methodology uses). Its wall time depends
  * only on how fast this host's cores are DURING the bench window, not
  * on the engine, so reporting it next to each timed ingest trial lets a
  * reader separate host drift from engine regression inside one JSON
  * artifact — the sandbox's throughput swings 2–5× across minutes
  * (BENCH/BASELINE.md methodology), which made round-2's single headline
  * number uninterpretable.
  */
object PlatformControl {
  /** ~2 s at 32 nominal-speed cores; scaled by the session's
    * parallelism so the control is comparable across core counts.
    */
  val RowsPerCore: Long = 250000000L

  private val calls = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Fixed per-call stride for the disjoint ranges, independent of the
    * caller's rowsPerCore/parallelism: every range this object can emit
    * (≤ RowsPerCore rows/core, ≤ 64 cores) fits inside one stride, so
    * ranges are provably disjoint across warm-up and timed calls alike —
    * a warm-up's small span can never land inside an earlier timed range.
    */
  private val CallStride: Long = RowsPerCore * 64L + 1L

  private def loop(spark: SparkSession, rowsPerCore: Long): Unit = {
    val p = math.min(spark.sparkContext.defaultParallelism, 64)
    // DISJOINT range per call (fixed stride ≥ any span): identical plans
    // can reuse shuffle map outputs within a session, which would time
    // the cache, not the host — and overlapping ranges would still
    // canonicalize unequal, so make the disjointness total for free
    val base = calls.incrementAndGet() * CallStride
    spark.range(base, base + rowsPerCore * p, 1, p)
      .select(xxhash64(col("id")).as("h"))
      .agg(avg(col("h")))
      .collect()
    ()
  }

  def run(spark: SparkSession): Double = {
    loop(spark, RowsPerCore / 64) // untimed: codegen/JIT warm-up
    val t0 = System.nanoTime()
    loop(spark, RowsPerCore)
    (System.nanoTime() - t0) / 1e9
  }
}
