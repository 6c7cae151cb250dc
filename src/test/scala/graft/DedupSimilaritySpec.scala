package graft

import org.apache.spark.sql.functions._
import graft.analytics.{DedupQueries, SimilarityQueries, Tables}

/** Semantic invariants for the engine-hash dedup/similarity operators
  * that have no SQL oracle (the driver records rows-only for them).
  */
class DedupSimilaritySpec extends SparkSpec {
  val sf = "/root/testdata/sf0.01"

  test("dedup builders leave no cached RDDs after SessionCaches.release") {
    graft.analytics.SessionCaches.release(spark) // clean slate
    Seq("dd03_ngram_jaccard", "dd04_minhash_lsh", "dd05_simhash").foreach { n =>
      SparkEntry.queries(n)(spark, sf).count()
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        s"$n should persist its intermediates while materializing")
      graft.analytics.SessionCaches.release(spark)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$n left cached RDDs after release")
    }
  }

  test("dup clusters are transitive closures of the pair graph with min-id labels") {
    val docs = Tables.documents(spark, sf)
    val pairs = DedupQueries.ngramJaccardPairs(docs, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupQueries.dupClusters(spark, sf, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.analytics.SessionCaches.release(spark)
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every pair's endpoints share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // the label IS the member minimum (canonical keeper)
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label, s"cluster $label not labeled by min member")
    }
    // reference closure: union-find over the same pairs == engine clusters
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expect = clusters.keys.map(k => k -> find(k)).toMap
    assert(clusters == expect, "engine clusters differ from union-find closure")
  }

  test("minhash LSH recall: every exact-Jaccard≥0.9 pair is a candidate") {
    val docs = Tables.documents(spark, sf)
    val exact = DedupQueries.ngramJaccardPairs(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.minhashLshPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain high-Jaccard pairs")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("minhash estimate tracks exact Jaccard on candidates") {
    val docs = Tables.documents(spark, sf)
    val exact = DedupQueries.ngramJaccardPairs(docs, 0.0)
      .withColumnRenamed("jaccard", "exact_j")
    val est = DedupQueries.minhashLshPairs(docs)
    val joined = est.join(exact, Seq("doc_a", "doc_b")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      val x = r.getAs[Double]("exact_j")
      assert(math.abs(e - x) <= 0.35, s"estimate $e too far from exact $x")
    }
  }

  test("simhash pairs have verified hamming distance") {
    val docs = Tables.documents(spark, sf)
    val sh = DedupQueries.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupQueries.simhashPairs(docs, 3).collect()
    pairs.foreach { r =>
      val d = java.lang.Long.bitCount(sh(r.getLong(0)) ^ sh(r.getLong(1)))
      assert(d == r.getAs[Number]("hamming").intValue && d <= 3)
    }
  }

  test("ngram Jaccard hot-shingle cap: capped-set semantics == plain-Scala oracle") {
    import spark.implicits._
    // one boilerplate sentence in every doc (doc-frequency = 6) plus
    // per-doc payloads; docs 0 and 1 are genuine near-dups
    val boiler = "all rights reserved by the site operator"
    val texts = Seq(
      s"$boiler alpha beta gamma delta epsilon zeta eta theta",
      s"$boiler alpha beta gamma delta epsilon zeta eta iota",
      s"$boiler one two three four five six seven eight",
      s"$boiler red orange yellow green blue indigo violet pink",
      s"$boiler north south east west up down left right",
      s"$boiler cat dog fish bird mouse horse sheep goat")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    def scalaOracle(cap: Int): Map[(Long, Long), Double] = {
      val all = texts.zipWithIndex.map { case (t, i) => i.toLong -> shingleSet(t) }
      val freq = all.flatMap { case (_, s) => s.toSeq }
        .groupBy(identity).view.mapValues(_.size).toMap
      val capped = all.map { case (i, s) => i -> s.filter(freq(_) <= cap) }.toMap
      (for {
        a <- capped.keys; b <- capped.keys if a < b
        inter = (capped(a) & capped(b)).size
        if inter > 0
        j = math.rint(inter.toDouble / (capped(a).size + capped(b).size - inter) * 10000) / 10000
      } yield (a, b) -> j).toMap
    }
    def got(cap: Int): Map[(Long, Long), Double] =
      DedupQueries.ngramJaccardPairs(df, 0.0, maxDocFreq = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cap3 = got(3)
    assert(cap3 === scalaOracle(3))
    // the boilerplate shingles really were excluded: uncapped differs
    val uncapped = got(1000)
    assert(uncapped === scalaOracle(1000))
    assert(cap3 !== uncapped)
    // and the capped near-dup pair survives with a HIGHER jaccard than
    // boilerplate-only pairs
    assert(cap3((0L, 1L)) > cap3.getOrElse((2L, 3L), 0.0))
  }

  test("embedding near-dup: LSH-table candidates — exact precision, useful recall") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toSeq.sorted
    val exact = (for {
      i <- ids; j <- ids if i < j
      if math.rint(cos(vecs(i), vecs(j)) * 10000) / 10000 >= 0.4
    } yield (i, j)).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val got = DedupQueries.embeddingNearDupPairs(spark, sf, 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1: every returned pair truly exceeds the threshold
    assert((got -- exact).isEmpty, s"false positives: ${got -- exact}")
    // recall: 6 tables × 4 planes recovers most of the exact pair set
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH-table recall too low: $recall")
  }

  test("knn rank-1 is the true argmax neighbor") {
    val knn = SimilarityQueries.knnBruteForce(spark, sf, 10, 5)
    val top1 = knn.filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toMap
    assert(top1.size == 10)
    // recompute max cosine per query on the driver
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    (0L until 10L).foreach { q =>
      val best = vecs.filter(_._1 >= 10).maxBy { case (_, v) => cos(vecs(q), v) }
      val (gotId, gotCos) = top1(q)
      val bestCos = cos(vecs(q), best._2)
      assert(math.abs(gotCos - bestCos) < 1e-3,
        s"q$q: got ($gotId,$gotCos) best (${best._1},$bestCos)")
    }
  }

  test("ivf search: probe-limited top-k has useful recall vs brute force") {
    val bf = SimilarityQueries.knnBruteForce(spark, sf, nQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries
      .ivfSearch(spark, sf, kCentroids = 8, nProbe = 3, nQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.size === 50)
    val recall = (bf & ivf).size.toDouble / bf.size
    // probing 3 of 8 lists scores ~3/8 of the corpus; on this fixture
    // the measured recall is well above the scored fraction
    assert(recall >= 0.5, s"IVF recall@5 too low: $recall")
    // and with nProbe = K (exhaustive probing) IVF == brute force
    val full = SimilarityQueries
      .ivfSearch(spark, sf, kCentroids = 8, nProbe = 8, nQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === bf)
  }

  test("ann lsh precision: returned pairs truly exceed threshold") {
    val pairs = SimilarityQueries.annLsh(spark, sf, 0.3).collect()
    pairs.foreach(r => assert(r.getAs[Double]("cos") >= 0.3))
  }
}
