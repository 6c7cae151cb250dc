package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver testdata loader. One parquet per table under the sf dir. */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Scale-adaptive scan fan-out for the PER-ROW-COMPUTE-heavy tables
    * (documents: shingling/hashing/signatures; embeddings: 64-dim
    * arithmetic): a small corpus arrives as ONE parquet split, so all
    * the expression work upstream of the first exchange runs on one
    * core while the rest idle (round-6 measurement: the dd08 signature
    * pass spent 1.5-1.9 s single-task at sf0.1). When the scan has
    * fewer splits than the cluster's parallelism, fan out once with a
    * round-robin repartition (deterministic under retries via Spark's
    * sort-before-repartition default); at real scale the scan already
    * has more splits than cores and this is the identity — the
    * partitioning derives from input size, never a tuned constant.
    */
  private def fanOut(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame =
    fanOut(s, t(s, dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame =
    fanOut(s, t(s, dir, "embeddings"))
  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
}
