package graft

/** Every SparkEntry query must run clean on the smoke tier; entries the
  * fixture guarantees non-empty must return rows.
  */
class AnalyticsSpec extends SparkSpec {
  val sf = "/root/testdata/sf0.001"

  // sparse/threshold queries may legitimately be empty at the smallest sf
  val mayBeEmpty = Set("dd03_ngram_jaccard", "dd04_minhash_lsh",
    "dd05_simhash", "dd06_embedding_neardup", "dd07_dup_clusters",
    "s03_ann_lsh", "q04_anti_join", "q21_except_users", "q07_burst_hours",
    "dd02_exact_keeper")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty.contains(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle — zero rows-only entries") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q31's sketch is folded into an engine-side within_5pct bound the
    // oracle recomputes, so even the HLL path is oracle-checked now.
    assert(noOracle.isEmpty, s"missing oracle for: $noOracle")
  }

  test("q34 repeat invocations reuse one scratch rollup and agree (no tmpfs leak)") {
    // the session-scoped scratch dir is reused across calls — the epoch
    // ledger makes the replayed upserts no-ops, so results must be
    // identical and no new dir may appear per call
    def dirs() = Option(new java.io.File("/dev/shm").listFiles())
      .map(_.count(_.getName.startsWith("graft-q34"))).getOrElse(0)
    val a = SparkEntry.queries("q34_user_rollup")(spark, sf)
      .collect().map(_.toString).sorted
    val nDirs = dirs()
    val b = SparkEntry.queries("q34_user_rollup")(spark, sf)
      .collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
    assert(dirs() == nDirs, "q34 created a new scratch dir on re-invocation")
  }

  test("q31 HLL estimate within 5% of exact") {
    SparkEntry.queries("q31_hll_distinct")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"HLL out of bound for ${r.getAs[String]("event_type")}")
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
