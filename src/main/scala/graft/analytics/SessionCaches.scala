package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Scoped registry for intermediates the dedup/similarity builders
  * persist (shingle sets, minhash/simhash signatures): the builders
  * return LAZY DataFrames, so they cannot unpersist inside a
  * try/finally — nothing has been computed yet when they return. Instead
  * each persist is tracked here and dropped by [[release]], which
  * callers invoke after materializing a query's result (Verify and Bench
  * do; long-lived sessions call it between queries). A long-lived
  * GraftSql session therefore never accumulates cached plans across
  * queries — the round-2 leak.
  */
object SessionCaches {
  private val reg = mutable.Map[SparkSession, mutable.ListBuffer[DataFrame]]()

  /** Bound on tracked intermediates per session: a caller that never
    * releases (direct DedupQueries API use without GraftSql.release)
    * must not grow the registry — and the cached blocks behind it —
    * without limit. Oldest entries are evicted (unpersisted) first;
    * correctness is unaffected, an evicted plan just recomputes.
    */
  val MaxTrackedPerSession = 32

  /** Persist `df` and register it for the session's next [[release]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    // self-clean: drop registrations of stopped sessions so the registry
    // never pins a SparkSession past its lifetime
    reg.filterInPlace((s, _) => !s.sparkContext.isStopped)
    df.persist()
    val buf = reg.getOrElseUpdate(df.sparkSession, mutable.ListBuffer())
    buf += df
    while (buf.size > MaxTrackedPerSession) {
      buf.remove(0).unpersist(blocking = false)
    }
    df
  }

  /** Unpersist every tracked intermediate of `spark`. Safe anytime: an
    * unpersisted plan recomputes if re-used, it never breaks a query.
    */
  def release(spark: SparkSession): Unit = synchronized {
    reg.remove(spark).foreach(_.foreach(_.unpersist(blocking = false)))
  }
}
