package graft

import graft.analytics.SimilarityQueries

/** Lloyd-refined IVF centroids (round-4): refinement must measurably
  * improve the index over first-K init — balance (list-size spread) and
  * fit (mean assignment cosine) — while staying deterministic.
  */
class KmeansIvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def assignStats(iters: Int): (Double, Double) = {
    val rows = SimilarityQueries.ivfAssign(spark, sf, kCentroids = 8,
      iters = iters).collect()
    val n = rows.map(_.getLong(1).toDouble)
    val total = n.sum
    val mean = total / n.length
    val std = math.sqrt(n.map(x => (x - mean) * (x - mean)).sum / n.length)
    val wavg = rows.map(r => r.getLong(1) * r.getDouble(2)).sum / total
    (std, wavg)
  }

  test("2 Lloyd iterations improve list balance AND mean assignment cosine over first-K") {
    val (stdBase, cosBase) = assignStats(iters = 0)
    val (stdTrained, cosTrained) = assignStats(iters = 2)
    assert(stdTrained < stdBase,
      s"list-size spread must shrink: $stdBase -> $stdTrained")
    assert(cosTrained > cosBase,
      s"mean assignment cosine must rise: $cosBase -> $cosTrained")
  }

  test("training is deterministic across runs and partitionings") {
    val a = SimilarityQueries.ivfAssign(spark, sf, 8).collect().toSet
    val b = SimilarityQueries.ivfAssign(spark, sf, 8).collect().toSet
    assert(a === b)
    // integer-exact mean updates make the centroids independent of the
    // physical partitioning (a plain double sum would not be): force a
    // different layout via the shuffle-partitions knob mid-train
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val c = SimilarityQueries.ivfAssign(spark, sf, 8).collect().toSet
      assert(c === a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("ivf search over trained centroids still finds brute-force top-1 for most queries") {
    // recall sanity at sf0.001 (cheap): exhaustive probe == brute force
    val d = "/root/testdata/sf0.001"
    val bf = SimilarityQueries.knnBruteForce(spark, d, nQueries = 10, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivfAll = SimilarityQueries.ivfSearch(spark, d, kCentroids = 8,
      nProbe = 8, nQueries = 10, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivfAll === bf, "probing ALL lists must equal brute force")
  }
}
