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
