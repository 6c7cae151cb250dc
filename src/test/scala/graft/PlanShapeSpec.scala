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
