package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.LwwFunctions

/** graft.plans.LwwSeq: agreement with the max_by(struct) formulation it
  * replaces on the hot path, tie/null/empty-group semantics, SQL
  * registration, and — the reason it exists — the HashAggregate plan.
  */
class LwwAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("lww_seq == max_by(seq, struct(ts, seq)) on random data with ties and dups") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      (s"k${rnd.nextInt(40)}", ts(1700000000000L + rnd.nextInt(50) * 1000L), i.toLong)
    }
    // inject exact duplicates (same key, ts, seq)
    val df = (rows ++ rows.take(200)).toDF("k", "t", "s")
    val got = df.groupBy($"k")
      .agg(LwwFunctions.lww_seq(spark, $"t", $"s").as("w"))
      .as[(String, Long)].collect().toMap
    val want = df.groupBy($"k")
      .agg(max_by($"s", struct($"t", $"s")).as("w"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("null ts rows are ignored; all-null group → null; ties break on larger seq") {
    val df = Seq(
      ("a", ts(1000L), 1L), ("a", null.asInstanceOf[Timestamp], 99L),
      ("a", ts(1000L), 2L), // tie on ts → seq 2 wins
      ("b", null.asInstanceOf[Timestamp], 5L))
      .toDF("k", "t", "s")
    val got = df.groupBy($"k")
      .agg(LwwFunctions.lww_seq(spark, $"t", $"s").as("w"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got === Map("a" -> Some(2L), "b" -> None))
  }

  test("SQL registration + HashAggregate (not SortAggregate) plan") {
    LwwFunctions.register(spark)
    Seq(("a", ts(1L), 1L)).toDF("k", "t", "s").createOrReplaceTempView("lww_in")
    val q = spark.sql("SELECT k, lww_seq(t, s) AS w FROM lww_in GROUP BY k")
    assert(q.as[(String, Long)].collect() === Array(("a", 1L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }
}
