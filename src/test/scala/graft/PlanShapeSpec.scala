package graft

/** Plan-shape guard rails: regressions that only bite at scale — a
  * cartesian product or a struct-buffer SortAggregate sneaking into a
  * query — fail here at sf0.001 instead of in a 100 TB run.
  */
class PlanShapeSpec extends SparkSpec {
  val sf = "/root/testdata/sf0.001"

  test("no query plans a cartesian product") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("predicate pushdown and broadcast dim joins hold (PLANS.md claims)") {
    // q02: the equality filter must reach the parquet scan
    val q02 = SparkEntry.queries("q02_recent_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q02.contains("PushedFilters:") && q02.contains("EqualTo(event_type"),
      "q02 filter not pushed to the scan")
    assert(q02.contains("TakeOrderedAndProject"), "q02 lost top-k pushdown")
    // q03: the dimension side must broadcast (no shuffle join)
    val q03 = SparkEntry.queries("q03_join_segments")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q03.contains("BroadcastHashJoin"), "q03 dim join not broadcast")
  }

  test("ANN top-k is a bounded-buffer aggregate, not a per-query window funnel") {
    // s01/s04's final rank must NOT be a row_number window partitioned by
    // query_id (one task per query sorting all its scored rows — the
    // 10^9-vector scale-killer); it must be the map-side-combined
    // topk_by_score ObjectHashAggregate.
    Seq("s01_knn_bruteforce", "s04_ivf_search").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("topk_by_score"), s"$name lost the top-k aggregate")
      assert(plan.contains("partial_topk_by_score"),
        s"$name top-k has no map-side partial aggregation")
      assert(!plan.contains("row_number(") || name == "s04_ivf_search",
        s"$name still ranks via a window") // s04 keeps per-VECTOR assignment windows
    }
    val s01 = SparkEntry.queries("s01_knn_bruteforce")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s01.contains("Window"), "s01 should have no window at all")
    // s02: nearest-centroid assignment is a pure projection (argmax over
    // K literal-centroid cosine structs) — no window, no corpus×K blow-up
    val s02 = SparkEntry.queries("s02_ivf_assign")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!s02.contains("Window"), "s02 assignment regressed to a window")
  }

  test("aggregation-heavy queries stay hash-based (no SortAggregate)") {
    // every query except the deliberately-window/sort-based ones must
    // aggregate via HashAggregate (primitive buffers); max_by/max(struct)
    // formulations planize as SortAggregate — the measured-10× trap
    val exempt = Set(
      "q35_user_tiers_scalable" // exact percentile → ObjectHashAggregate
    )
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => exempt.contains(q._1))
      .foreach { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("SortAggregate"),
          s"$name plans a SortAggregate")
      }
  }
}
