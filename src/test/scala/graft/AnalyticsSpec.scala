package graft

/** Every SparkEntry query must run clean on the smoke tier; entries the
  * fixture guarantees non-empty must return rows.
  */
class AnalyticsSpec extends SparkSpec {
  val sf = "/root/testdata/sf0.001"

  // sparse/threshold queries may legitimately be empty at the smallest sf
  val mayBeEmpty = Set("dd03_ngram_jaccard", "dd04_minhash_lsh",
    "dd05_simhash", "dd06_embedding_neardup", "s03_ann_lsh",
    "q04_anti_join", "q21_except_users", "q07_burst_hours",
    "dd02_exact_keeper")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty.contains(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or a documented rows-only reason") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the only sanctioned oracle-less entry: the HLL sketch (engine-
    // internal estimator). Everything else — minhash/simhash/LSH and the
    // multimodal frame stub included — uses portable hashes (Hashing)
    // and is oracle-checked.
    assert(noOracle.subsetOf(Set("q31_hll_distinct")),
      s"missing oracle for: $noOracle")
  }

  test("q31 HLL estimate within 5% of exact") {
    SparkEntry.queries("q31_hll_distinct")(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$approx vs $exact")
    }
  }

  test("mm02 frame extraction is deterministic and covers all bytes") {
    val a = SparkEntry.queries("mm02_frame_extract")(spark, sf).collect()
      .map(_.toString).sorted
    val b = SparkEntry.queries("mm02_frame_extract")(spark, sf)
      .repartition(7).collect().map(_.toString).sorted
    assert(a === b) // partitioning-invariant
    assert(a.nonEmpty)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
