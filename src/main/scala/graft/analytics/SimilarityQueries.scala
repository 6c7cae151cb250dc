package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search operator family over `embeddings` (vec_id,
  * embedding ARRAY<FLOAT>, label): brute-force cosine top-k as the exact
  * baseline, IVF-style inverted-list assignment, and random-hyperplane
  * LSH as the scale path. Dot products/cosines are native codegen'd
  * Catalyst expressions (graft.plans.VecDot/VecCosine) — no UDF, no
  * per-element lambda interpretation.
  */
object SimilarityQueries {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  // dot/cosine are native codegen'd Catalyst expressions (graft.plans) —
  // the higher-order-function formulation (aggregate ∘ zip_with) runs
  // interpreted per element and was the measured hot spot of every
  // similarity query. Accumulation is in double over the raw float
  // vectors, so results equal the DuckDB CAST(... AS DOUBLE[]) oracle.
  private def dot(s: SparkSession, a: Column, b: Column): Column =
    graft.plans.VectorFunctions.vec_dot(s, a, b)
  private def cosine(s: SparkSession, a: Column, b: Column): Column =
    graft.plans.VectorFunctions.vec_cosine(s, a, b)

  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding").as("v"))

  /** Scale-safe exact top-k per query over scored (query_id, vec_id,
    * cos) rows: a bounded-buffer native aggregate
    * ([[graft.plans.TopKByScore]]) instead of a per-query row_number
    * window. The window shape shuffles EVERY scored row to one task per
    * query and sorts it there — at "100 queries × 10^9 vectors" that is
    * 100 single-task sorts over 10^10 rows. The aggregate's map-side
    * partial keep-k reduces each input partition to ≤ k pairs per query
    * before the shuffle, so the exchange carries nPartitions·k 16-byte
    * pairs per query and the final merge is a heap fold. Rank order
    * (cos DESC, vec_id ASC over the ROUNDED cosine) is byte-identical
    * to the window formulation, so the oracle is unchanged.
    */
  private def topK(s: SparkSession, scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.plans.TopKFunctions
        .topk_by_score(s, col("cos"), col("vec_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.score").as("cos"), (col("pos") + 1).cast("long").as("rank"))

  /** Exact brute-force top-k neighbors for a bounded query set. The
    * query side is broadcast (small by construction); the corpus side
    * streams — the right plan shape for "score 100 queries against 10^9
    * vectors". Ranks are made deterministic by (cos desc, vec_id).
    */
  def knnBruteForce(s: SparkSession, d: String, nQueries: Int, k: Int): DataFrame = {
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val corpus = e.filter(col("vec_id") >= nQueries)
    topK(s, corpus.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(cosine(s, col("qv"), col("v")), 4).as("cos")), k)
  }

  /** Nearest-centroid assignment as a PURE PROJECTION: the centroid set
    * is bounded (it IS the index parameter), so it rides into the plan
    * as K literal vectors and the argmax is `array_max` over K codegen'd
    * cosine structs — no crossJoin row blow-up, no window, no shuffle.
    * The previous formulation (crossJoin ×K + row_number window) shuffled
    * corpus×K FULL rows by vec_id — at 10^9 vectors × K=4096 that is the
    * whole corpus payload ×4096 through one exchange. Tie-break matches
    * the window order (cos DESC, centroid_id ASC) by maximizing
    * (cos, -centroid_id). For K beyond codegen comfort (~10^4+), the
    * same argmax runs as `topk_by_score(..., 1)` per vector instead —
    * still shuffle-free map-side.
    *
    * The bounded `collect` of K centroid rows is the same class as the
    * merge path's ≤ numBuckets stats collects: O(index params), never
    * O(data).
    */
  private[graft] def nearestCentroid(s: SparkSession, v: Column,
                                     cents: Seq[(Long, Array[Double])]): Column = {
    val scored = cents.map { case (id, cv) =>
      struct(round(cosine(s, typedLit(cv), v), 4).as("cos"),
        lit(-id).as("negid"))
    }
    array_max(array(scored: _*))
  }

  private def collectCentroids(s: SparkSession, d: String,
                               kCentroids: Int): Seq[(Long, Array[Double])] =
    embeddings(s, d).filter(col("vec_id") < kCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .toSeq.sortBy(_._1)

  /** Fixed-point scale for the Lloyd mean update: components are summed
    * as round(x·10^6) LONGS, so the per-list mean is exact integer
    * arithmetic — order-independent across partitionings AND engines
    * (a plain double sum's value depends on partial-aggregation order,
    * which would make the trained centroids — and every downstream
    * cosine — nondeterministic run to run).
    */
  private val KmeansFix = 1e6
  /** Lloyd iterations for the query-suite IVF entries (fixed —
    * determinism is part of the oracle contract).
    */
  private[analytics] val KmeansIters = 2
  /** Embedding dimensionality of the testdata corpus (the oracle SQL is
    * static text, so it cannot read the dim from data; the Spark side
    * derives it from the vectors and they must agree).
    */
  private[analytics] val EmbedDim = 64

  /** Seeded Lloyd refinement of the IVF centroids: init = first-K
    * vectors (deterministic), then `iters` iterations of
    *   assign (the shuffle-free [[nearestCentroid]] projection argmax)
    *   → per-list component means (one codegen'd HashAggregate of
    *     dim+1 longs per list — the same narrow-aggregate shape as the
    *     assign pass, so one Lloyd iteration costs one corpus map pass)
    *   → collect K·dim bounded sums to the driver (O(index params)).
    * An empty list keeps its previous centroid. Deterministic via fixed
    * init + fixed iteration count + integer-exact means — the DuckDB
    * oracle recomputes the identical iterations in SQL
    * ([[kmeansCentsSqlCtes]]), so the k-means path stays fully
    * oracle-checked. First-K init quality doesn't matter at test scale;
    * at 10^9 vectors the refinement is what keeps inverted lists
    * balanced (list skew = probe-cost skew).
    */
  private[graft] def trainCentroids(s: SparkSession, d: String,
      kCentroids: Int, iters: Int): Seq[(Long, Array[Double])] =
    // one training per (run, corpus, k, iters): s02 and s04 share the
    // identical centroid set, so the second caller reuses the collected
    // K-dim doubles instead of re-running two corpus passes — the same
    // run-scope share discipline as sharedJaccardPairs (released with
    // the session's run scope, so a data rewrite retrains)
    SessionCaches.memoValue(s, s"kmeans-cents|$d|$kCentroids|$iters") {
      trainCentroidsUncached(s, d, kCentroids, iters)
    }

  private def trainCentroidsUncached(s: SparkSession, d: String,
      kCentroids: Int, iters: Int): Seq[(Long, Array[Double])] =
    trainOnFrame(s, vecs(s, d), collectCentroids(s, d, kCentroids),
      iters)._1

  /** One (cid, n, component-sums) aggregation of `e` assigned to the
    * FIXED centroid set — the Lloyd inner step, also the epoch-side
    * pass of [[graft.operators.IvfCentroids.refreshEpoch]]. Sums are
    * the [[KmeansFix]]-scaled LONGS (exact, order-independent).
    */
  private[graft] def assignStats(s: SparkSession, e: DataFrame,
      cents: Seq[(Long, Array[Double])]): Map[Long, (Long, Array[Long])] = {
    val dim = cents.head._2.length
    val assigned = e
      .withColumn("win", nearestCentroid(s, col("v"), cents))
      .select((-col("win.negid")).as("cid"), col("v"))
    val sums = (0 until dim).map(i =>
      sum(round(element_at(col("v"), i + 1) * KmeansFix).cast("long"))
        .as(s"s_$i"))
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sums: _*).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Array.tabulate(dim)(i => r.getLong(i + 2))))
      .toMap
  }

  /** The exact centroid a (n, sums) statistic denotes — the SAME
    * division as the Lloyd update and the DuckDB oracle
    * (`s_i/(n*1000000.0)`), so refreshed centroids stay bit-identical
    * across engines.
    */
  private[graft] def statsMean(n: Long, sums: Array[Long]): Array[Double] =
    sums.map(_.toDouble / (n * KmeansFix))

  /** Seeded Lloyd over an arbitrary (…, v) frame from `init`,
    * returning the final centroids AND the final iteration's
    * sufficient statistics (n, scaled sums) per list — the state a
    * maintained centroid index persists
    * ([[graft.operators.IvfCentroids.trainWithStats]]): the final
    * centroid of a non-empty list is EXACTLY statsMean of its stats,
    * so downstream epoch folds extend the same integer arithmetic. An
    * empty list keeps its previous centroid with (0, zeros) stats.
    */
  private[graft] def trainOnFrame(s: SparkSession, e: DataFrame,
      init: Seq[(Long, Array[Double])], iters: Int)
      : (Seq[(Long, Array[Double])], Map[Long, (Long, Array[Long])]) = {
    var cents = init
    val dim = init.head._2.length
    var last = Map.empty[Long, (Long, Array[Long])]
    for (_ <- 0 until iters) {
      last = assignStats(s, e, cents)
      cents = cents.map { case (id, cv) =>
        (id, last.get(id).map { case (n, ss) => statsMean(n, ss) }
          .getOrElse(cv))
      }
    }
    val full = cents.map { case (id, _) =>
      id -> last.getOrElse(id, (0L, Array.fill(dim)(0L)))
    }.toMap
    (cents, full)
  }

  /** First-K (by vec_id) rows of a (vec_id, v) frame — the seeded init
    * for slice-trained centroid sets.
    */
  private[graft] def sliceCentroids(vecsDf: DataFrame,
      kCentroids: Int): Seq[(Long, Array[Double])] =
    vecsDf.select(col("vec_id"), col("v")).orderBy(col("vec_id"))
      .limit(kCentroids).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).toArray.map(_.doubleValue)))
      .toSeq.sortBy(_._1)

  /** Per-vector inverted-list assignment of a (vec_id, v) frame against
    * a FIXED centroid set — the projection-argmax shape shared by the
    * batch ops and the persisted-centroid epoch path
    * ([[graft.operators.IvfCentroids.assignEpoch]]): no retraining, no
    * shuffle, one codegen'd map pass over the vectors.
    */
  private[graft] def assignVectors(s: SparkSession, vecsDf: DataFrame,
      cents: Seq[(Long, Array[Double])]): DataFrame =
    vecsDf.withColumn("win", nearestCentroid(s, col("v"), cents))
      .select(col("vec_id"), (-col("win.negid")).as("list_id"),
        col("win.cos").as("cos"))

  /** IVF-style assignment: nearest of K Lloyd-trained centroids
    * (deterministic and oracle-expressible — [[trainCentroids]]). One
    * pass, no shuffle until the final per-list aggregate
    * ([[nearestCentroid]]).
    */
  def ivfAssign(s: SparkSession, d: String, kCentroids: Int,
                iters: Int = KmeansIters): DataFrame = {
    val cents = trainCentroids(s, d, kCentroids, iters)
    assignVectors(s, vecs(s, d), cents)
      .select(col("list_id").as("centroid_id"), col("cos"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("cos")), 4).as("avg_cos"))
  }

  /** Full IVF search — the ANN scale path end-to-end: corpus vectors are
    * assigned to inverted lists by the shuffle-free projection argmax
    * ([[nearestCentroid]]); each query probes only its nProbe nearest
    * lists (broadcast back over the corpus); exact cosine runs on the
    * probed lists alone. At 10^9 vectors × K=4096 lists × nProbe=64, the
    * scored fraction is nProbe/K ≈ 1.6% of a brute-force pass, the
    * corpus payload crosses ZERO exchanges, and the only shuffle is the
    * bounded topk_by_score partials. Recall vs [[knnBruteForce]] is
    * asserted in DedupSimilaritySpec.
    */
  def ivfSearch(s: SparkSession, d: String, kCentroids: Int, nProbe: Int,
                nQueries: Int, k: Int, iters: Int = KmeansIters): DataFrame = {
    val e = vecs(s, d)
    val cents = trainCentroids(s, d, kCentroids, iters)
    // corpus side: assignment is a projection (no shuffle, no ×K rows) —
    // the corpus is touched by exactly ONE map pass before the bounded
    // top-k partials
    val lists = e.filter(col("vec_id") >= nQueries)
      .withColumn("list_id", (-nearestCentroid(s, col("v"), cents)("negid")))
      .select(col("vec_id"), col("v"), col("list_id"))
    // query side: top-nProbe lists per query over K scored centroids —
    // bounded (nQueries × K rows), stays a window
    val centRows = cents.map { case (id, cv) =>
      struct(lit(id).as("centroid_id"), typedLit(cv).as("cv"))
    }
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("centroid_id"))
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(array(centRows: _*)).as("c"))
      .select(col("query_id"), col("qv"), col("c.centroid_id"),
        round(cosine(s, col("c.cv"), col("qv")), 4).as("qcos"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
    topK(s, lists.join(broadcast(probes), Seq("list_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(s, col("qv"), col("v")), 4).as("cos")), k)
  }

  /** Random-hyperplane LSH: sign bits from splitmix64-derived
    * hyperplanes → bucket; candidates share a bucket; exact cosine on
    * candidates only. The hyperplane matrix is deterministic from the
    * seed and lives in the plan as a literal (broadcast by value) — which
    * also makes the bucketing reproducible by the DuckDB oracle
    * ([[Hashing.bucketSql]]).
    */
  def lshBuckets(s: SparkSession, d: String, nPlanes: Int = 16,
                 dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = Hashing.hyperplanes(nPlanes, dim, seed)
    vecs(s, d).withColumn("bucket", Hashing.bucketCol(s, col("v"), planes))
  }

  /** ANN via LSH buckets: exact cosine within buckets only. 8 planes →
    * 256 buckets, sized to the test corpus; at scale nPlanes grows with
    * log2(corpus) to keep buckets bounded.
    */
  def annLsh(s: SparkSession, d: String, minCos: Double): DataFrame = {
    val b = lshBuckets(s, d, nPlanes = 8)
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round(cosine(s, col("x.v"), col("y.v")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  val queries: Map[String, Q] = Map(
    "s01_knn_bruteforce" -> ((s, d) => knnBruteForce(s, d, nQueries = 10, k = 5)),
    "s02_ivf_assign" -> ((s, d) => ivfAssign(s, d, kCentroids = 8)),
    // literal-hyperplane bucketing — oracle-checked (DuckDB recomputes
    // the sign bits); precision also asserted in DedupSimilaritySpec.
    "s03_ann_lsh" -> ((s, d) => annLsh(s, d, 0.3)),
    "s04_ivf_search" -> ((s, d) =>
      ivfSearch(s, d, kCentroids = 8, nProbe = 3, nQueries = 10, k = 5)),

    // STREAMING centroid maintenance: train on the even-id half,
    // persist centroids WITH their integer sufficient statistics, fold
    // the odd-id half as an arriving epoch (assign to current
    // centroids, add Long sums — no corpus pass, exact arithmetic).
    // Output is the refreshed state in the integer domain (n + summed
    // scaled components), so the DuckDB oracle matches hash-exactly.
    "s05_centroid_refresh" -> ((s, d) => {
      val dir = graft.FsUtil.scratchDir("s05-cents")
      val e = vecs(s, d)
      graft.operators.IvfCentroids.trainWithStats(s, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 0), 8, KmeansIters)
      val st = graft.operators.IvfCentroids.refreshEpoch(s, dir,
        e.filter(pmod(col("vec_id"), lit(2)) === 1))
      import s.implicits._
      st.map(x => (x.cid, x.n, x.sfix.sum))
        .toDF("centroid_id", "n_vecs", "sum_fix")
    })
  )

  /** DuckDB CTE chain recomputing [[trainCentroids]]' exact iterations:
    * ends in `cents$iters(cid, cv DOUBLE[])`. The mean update runs over
    * the same round(x·10^6)-as-BIGINT sums, so the centroid doubles are
    * bit-identical across engines (integer sums are order-independent;
    * the final s/(n·10^6) is one IEEE division of identical operands).
    */
  private def kmeansCentsSqlCtes(k: Int, iters: Int): String = {
    val dim = EmbedDim
    val chain = new StringBuilder
    chain ++=
      s"""cents0 AS (
         | SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         | FROM embeddings WHERE vec_id < $k)""".stripMargin
    for (t <- 1 to iters) {
      val sumCols = (0 until dim)
        .map(i => s"sum(CAST(round(v[${i + 1}]*1000000) AS BIGINT)) AS s_$i")
        .mkString(", ")
      val meanList = (0 until dim)
        .map(i => s"a.s_$i/(a.n*1000000.0)").mkString("[", ", ", "]")
      chain ++= s""",
         |asg$t AS (
         | SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cid,
         |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |     round(list_cosine_similarity(c.cv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
         |     c.cid) AS rn
         |  FROM embeddings e JOIN cents${t - 1} c ON true)
         | WHERE rn = 1),
         |sums$t AS (
         | SELECT cid, count(*) AS n, $sumCols FROM asg$t GROUP BY 1),
         |cents$t AS (
         | SELECT c.cid, CASE WHEN a.n IS NULL THEN c.cv ELSE $meanList END AS cv
         | FROM cents${t - 1} c LEFT JOIN sums$t a ON a.cid = c.cid)""".stripMargin
    }
    chain.toString
  }

  val oracles: Map[String, String] = Map(
    // NB: ranks order by the ROUNDED cosine + vec_id on both sides, so
    // sub-1e-4 float noise cannot flip a rank across engines.
    "s01_knn_bruteforce" ->
      """WITH s AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |    CAST(c.embedding AS DOUBLE[])), 4) AS cos
        | FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
        | WHERE q.vec_id < 10)
        |SELECT query_id, vec_id, cos, rank FROM (
        | SELECT query_id, vec_id, cos,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, vec_id) AS BIGINT) AS rank FROM s)
        |WHERE rank <= 5""".stripMargin,
    "s03_ann_lsh" -> {
      val planes = Hashing.hyperplanes(8, 64, 42L)
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  ${Hashing.bucketSql("CAST(embedding AS DOUBLE[])", planes)} AS bucket
         | FROM embeddings)
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         | round(list_cosine_similarity(x.v, y.v), 4) AS cos
         |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.3""".stripMargin
    },
    "s02_ivf_assign" ->
      s"""WITH ${kmeansCentsSqlCtes(8, KmeansIters)},
        |s AS (
        | SELECT v.vec_id, c.cid AS centroid_id,
        |  round(list_cosine_similarity(c.cv,
        |    CAST(v.embedding AS DOUBLE[])), 4) AS cos
        | FROM embeddings v JOIN cents$KmeansIters c ON true),
        |scored AS (SELECT vec_id, centroid_id, cos,
        |  row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cos DESC, centroid_id) AS rn FROM s)
        |SELECT centroid_id, count(*) AS n_vecs, round(avg(cos),4) AS avg_cos
        |FROM scored WHERE rn = 1 GROUP BY 1""".stripMargin,
    "s04_ivf_search" ->
      s"""WITH ${kmeansCentsSqlCtes(8, KmeansIters)},
        |cents AS (
        | SELECT cid AS centroid_id, cv FROM cents$KmeansIters),
        |lists AS (
        | SELECT vec_id, v, centroid_id AS list_id FROM (
        |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.centroid_id,
        |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |     round(list_cosine_similarity(c.cv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
        |     c.centroid_id) AS rn
        |  FROM embeddings e JOIN cents c ON true
        |  WHERE e.vec_id >= 10)
        | WHERE rn = 1),
        |probes AS (
        | SELECT query_id, qv, centroid_id AS list_id FROM (
        |  SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qv,
        |   c.centroid_id,
        |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |     round(list_cosine_similarity(c.cv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
        |     c.centroid_id) AS rn
        |  FROM embeddings e JOIN cents c ON true
        |  WHERE e.vec_id < 10)
        | WHERE rn <= 3)
        |SELECT query_id, vec_id, cos, rank FROM (
        | SELECT p.query_id, l.vec_id,
        |  round(list_cosine_similarity(p.qv, l.v), 4) AS cos,
        |  CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY
        |    round(list_cosine_similarity(p.qv, l.v), 4) DESC, l.vec_id) AS BIGINT) AS rank
        | FROM lists l JOIN probes p ON l.list_id = p.list_id)
        |WHERE rank <= 5""".stripMargin,

    "s05_centroid_refresh" -> centroidRefreshSql
  )

  /** DuckDB twin of the s05 maintained-centroid fold: Lloyd iterations
    * over the EVEN-id slice (first-8 even ids seed; each assignment
    * restricted to the slice), then the odd-id epoch assigned to the
    * final centroids and merged in the integer domain — the Long sums
    * and counts are engine-exact, so the refreshed state hashes
    * identically.
    */
  private def centroidRefreshSql: String = {
    val dim = EmbedDim
    val k = 8
    val iters = KmeansIters
    // per-list component sums for the mean update, plus the component
    // TOTAL as one aggregate (a 64-term `+` chain trips DuckDB's binder
    // recursion limit; integer addition commutes, so summing the
    // per-row component total is the identical value)
    val sumCols = (0 until dim)
      .map(i => s"sum(CAST(round(v[${i + 1}]*1000000) AS BIGINT)) AS s_$i")
      .mkString(", ") +
      ", CAST(sum(CAST(list_sum(list_transform(v, x -> round(x*1000000)))" +
      " AS BIGINT)) AS BIGINT) AS stot"
    val chain = new StringBuilder
    chain ++=
      s"""cents0 AS (
         | SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         | FROM embeddings WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT $k)""".stripMargin
    for (t <- 1 to iters) {
      val meanList = (0 until dim)
        .map(i => s"a.s_$i/(a.n*1000000.0)").mkString("[", ", ", "]")
      chain ++= s""",
         |asg$t AS (
         | SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cid,
         |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |     round(list_cosine_similarity(c.cv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
         |     c.cid) AS rn
         |  FROM embeddings e JOIN cents${t - 1} c ON true
         |  WHERE e.vec_id % 2 = 0)
         | WHERE rn = 1),
         |sums$t AS (
         | SELECT cid, count(*) AS n, $sumCols FROM asg$t GROUP BY 1),
         |cents$t AS (
         | SELECT c.cid, CASE WHEN a.n IS NULL THEN c.cv ELSE $meanList END AS cv
         | FROM cents${t - 1} c LEFT JOIN sums$t a ON a.cid = c.cid)""".stripMargin
    }
    val totalFix = "COALESCE(b.stot, 0)+COALESCE(e.stot, 0)"
    s"""WITH ${chain.toString},
       |ep AS (
       | SELECT vec_id, v, cid FROM (
       |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cid,
       |   row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |     round(list_cosine_similarity(c.cv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
       |     c.cid) AS rn
       |  FROM embeddings e JOIN cents$iters c ON true
       |  WHERE e.vec_id % 2 = 1)
       | WHERE rn = 1),
       |eps AS (
       | SELECT cid, count(*) AS n, $sumCols FROM ep GROUP BY 1)
       |SELECT c.cid AS centroid_id,
       | CAST(COALESCE(b.n, 0)+COALESCE(e.n, 0) AS BIGINT) AS n_vecs,
       | CAST($totalFix AS BIGINT) AS sum_fix
       |FROM cents$iters c
       |LEFT JOIN sums$iters b ON b.cid = c.cid
       |LEFT JOIN eps e ON e.cid = c.cid""".stripMargin
  }
}
