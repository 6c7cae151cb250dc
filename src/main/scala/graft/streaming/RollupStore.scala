package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Epoch-idempotent store for BOUNDED-CARDINALITY keyed rollup tables
  * (shared by the windowed metrics rollup and the additive keyed stats
  * rollup): versioned parquet dirs behind a PTR pointer file, swapped
  * atomically, plus an `_epochs` ledger that makes a redelivered
  * foreachBatch epoch a no-op — the same exactly-once scheme as the main
  * MERGE sink's manifest. The per-epoch rewrite is O(rollup keys), never
  * O(feed); anything unbounded belongs in a LakeTable, not here.
  */
object RollupStore {

  /** Apply one epoch: skip if `epochId` is already in the ledger,
    * otherwise compute the next state from the previous one (None before
    * the first epoch) and commit it. Returns true if applied.
    */
  def applyEpoch(spark: SparkSession, rollupDir: String, epochId: Long)
                (next: Option[DataFrame] => DataFrame): Boolean = {
    val dir = Paths.get(rollupDir)
    Files.createDirectories(dir)
    val ledger = dir.resolve("_epochs")
    val seen: Set[Long] =
      if (Files.exists(ledger))
        Files.readString(ledger).split("\n").filter(_.nonEmpty).map(_.toLong).toSet
      else Set.empty
    if (seen.contains(epochId)) return false
    val ptr = dir.resolve("PTR")
    val prev =
      if (!Files.exists(ptr)) None
      else Some(spark.read.parquet(
        dir.resolve(Files.readString(ptr).trim).toString))
    // swap: parquet dirs can't be renamed atomically over an existing
    // target, so point reads at a versioned dir via a CURRENT-style file
    val nextDir = dir.resolve(s"v-$epochId")
    next(prev).coalesce(1).write.mode("overwrite").parquet(nextDir.toString)
    val ptrTmp = dir.resolve(s".ptr.tmp.$epochId")
    Files.writeString(ptrTmp, s"v-$epochId")
    Files.move(ptrTmp, ptr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // ledger rewrite must be atomic too: a crash mid-truncate+write would
    // leave a partial line that wedges every later restart on toLong
    val ledgerTmp = dir.resolve(s".epochs.tmp.$epochId")
    Files.writeString(ledgerTmp,
      (seen + epochId).toSeq.sorted.mkString("\n") + "\n")
    Files.move(ledgerTmp, ledger, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retention: superseded v-* dirs are unreachable once PTR moved on;
    // keep the latest few for readers mid-swap, GC the rest
    val keep = 3
    val old = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("v-"))
      .toSeq.sortBy(p => p.getFileName.toString.stripPrefix("v-").toLong)
      .dropRight(keep)
    old.foreach { p =>
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
    true
  }

  def exists(rollupDir: String): Boolean =
    Files.exists(Paths.get(rollupDir, "PTR"))

  /** Read the current rollup state. */
  def read(spark: SparkSession, rollupDir: String): DataFrame = {
    val dir = Paths.get(rollupDir)
    val ptr = dir.resolve("PTR")
    require(Files.exists(ptr), s"no rollup at $rollupDir")
    spark.read.parquet(dir.resolve(Files.readString(ptr).trim).toString)
  }
}
