package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** topk_by_score == the row_number-window formulation on every input —
  * including score ties (id breaks them), duplicate rows, groups smaller
  * than k, and any physical partitioning (partial/final merge must be
  * order-insensitive).
  */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id", $"cos", $"rank")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"query_id")
      .agg(graft.plans.TopKFunctions.topk_by_score(spark, $"cos", $"vec_id", k).as("tk"))
      .select($"query_id", posexplode($"tk"))
      .select($"query_id", $"col.id".as("vec_id"), $"col.score".as("cos"),
        ($"pos" + 1).cast("long").as("rank"))

  test("property: agg top-k == window top-k under ties and repartitioning") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val genRows = Gen.listOfN(120, for {
      q <- Gen.choose(0L, 3L)
      id <- Gen.choose(0L, 40L)
      // coarse score grid forces plenty of exact ties
      s <- Gen.choose(0, 5).map(_ / 5.0)
    } yield (q, id, s))
    val prop = Prop.forAll(genRows, Gen.choose(1, 7), Gen.choose(1, 8)) {
      (rows, k, nPart) =>
        // distinct (q, id): a duplicate id within a group is the same
        // candidate row delivered twice — dedup as the queries do via
        // their join structure (ids are unique per query by construction)
        val df = rows.toDF("query_id", "vec_id", "cos")
          .dropDuplicates("query_id", "vec_id")
          .repartition(nPart)
        val a = aggTopK(df, k).collect().map(_.toString).sorted.toSeq
        val b = windowTopK(df, k).collect().map(_.toString).sorted.toSeq
        a == b
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(8).withInitialSeed(Seed(11L)), prop)
    assert(res.passed, res.toString)
  }

  test("beyond the ObjectHashAggregate fallback threshold (many groups per partition)") {
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold defaults
    // to 128 distinct keys per partition — 600 groups in ONE partition
    // forces the sort-based fallback path; results must be unchanged
    val df = spark.range(0, 600L * 40, 1, 1).select(
      (col("id") % 600).as("query_id"),
      (col("id") / 600).cast("long").as("vec_id"),
      (pmod(col("id") * 2654435761L, lit(1000)) / 1000.0).as("cos"))
    val a = aggTopK(df, 3).collect().map(_.toString).sorted.toSeq
    val b = windowTopK(df, 3).collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("NaN and -0.0 scores order like the window formulation (Spark sort order)") {
    // Spark sorts NaN as the largest double and normalizes -0.0 to 0.0;
    // the heap comparator must match or user SQL with odd scores diverges
    // from the documented window-equivalent semantics
    val df = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 5.0), (1L, 12L, 7.0),
      (1L, 13L, -0.0), (1L, 14L, 0.0)).toDF("query_id", "vec_id", "cos")
    val a = aggTopK(df, 3).collect().map(_.toString).sorted.toSeq
    val b = windowTopK(df, 3).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // insertion-order independence with a NaN present
    val a2 = aggTopK(df.orderBy($"vec_id".desc).coalesce(1), 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a2 == b)
  }

  test("empty groups and groups smaller than k") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.7)).toDF("query_id", "vec_id", "cos")
    val got = aggTopK(df, 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === Set((1L, 11L, 0.7, 1L), (1L, 10L, 0.5, 2L)))
    assert(aggTopK(df.filter($"cos" > 1.0), 5).count() === 0L)
  }
}
