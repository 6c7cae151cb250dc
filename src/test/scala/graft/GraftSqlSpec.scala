package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraftSql
import graft.model.CdcSchema
import graft.operators.MergeInto
import graft.table.LakeTable

/** The spark.sql surface: testdata views, lake views, and the native
  * functions reachable from plain SQL.
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("SQL over testdata views with native vector function == DataFrame API") {
    GraftSql.registerTestdata(spark, sf)
    val viaSql = spark.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(vec_cosine(a.embedding, b.embedding), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 5""".stripMargin).collect()
    assert(viaSql.length === 10)
    val e = spark.table("embeddings").select($"vec_id", $"embedding")
    val viaDf = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 5 && col("b.vec_id") < 5)
      .select(col("a.vec_id"), col("b.vec_id"),
        round(graft.plans.VectorFunctions.vec_cosine(spark,
          col("a.embedding"), col("b.embedding")), 4))
      .collect()
    assert(viaSql.map(_.toString).sorted === viaDf.map(_.toString).sorted)
  }

  test("topk_by_score from plain SQL == DataFrame window rank") {
    GraftSql.registerTestdata(spark, sf)
    val viaSql = spark.sql(
      """SELECT q.vec_id AS query_id, e.pos + 1 AS rank, e.col.id AS vec_id
        |FROM (
        |  SELECT a.vec_id,
        |    topk_by_score(round(vec_cosine(a.embedding, b.embedding), 4),
        |                  b.vec_id, 3) AS tk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 3 GROUP BY a.vec_id) q
        |LATERAL VIEW posexplode(q.tk) e""".stripMargin)
      .collect().map(_.toString).sorted
    val e = spark.table("embeddings").select($"vec_id", $"embedding")
    val scored = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .filter(col("a.vec_id") < 3)
      .select(col("a.vec_id").as("query_id"),
        round(graft.plans.VectorFunctions.vec_cosine(spark,
          col("a.embedding"), col("b.embedding")), 4).as("cos"),
        col("b.vec_id").as("cand"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"cand")
    val viaDf = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3).select($"query_id", $"rank".cast("long"), $"cand")
      .collect().map(_.toString).sorted
    assert(viaSql.toSeq === viaDf.toSeq)
  }

  test("SQL over lake views: live state, tombstones in raw, lww_seq in SQL") {
    val dir = tmpDir("sql-lake")
    LakeTable.create(dir, numBuckets = 4)
    val cols = CdcSchema.latest.fieldNames
    def ev(seq: Long, op: String, url: String, ts: Long, text: String) =
      (seq, op, url, new java.sql.Timestamp(ts), null: Array[Byte],
        text, "en", null.asInstanceOf[java.lang.Double])
    MergeInto.merge(spark, dir, Seq(
      ev(1, "I", "https://a/1", 1000L, "v1"),
      ev(2, "U", "https://a/1", 2000L, "v2"),
      ev(3, "I", "https://a/2", 1500L, "x1"),
      ev(4, "D", "https://a/3", 1800L, null),
      ev(0, "I", "https://a/3", 900L, "dead")).toDF(cols: _*), 0L)
    GraftSql.registerLake(spark, dir, "web")
    val live = spark.sql(
      "SELECT url, text FROM web_live ORDER BY url").collect()
    assert(live.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(
      ("https://a/1", "v2"), ("https://a/2", "x1")))
    val tombs = spark.sql(
      "SELECT count(*) FROM web_raw WHERE tombstone").head.getLong(0)
    assert(tombs === 1L)
    // the engine's LWW argmax straight from SQL
    val w = spark.sql(
      """SELECT url, lww_seq(warc_ts, seq) AS win FROM web_raw
        |GROUP BY url ORDER BY url""".stripMargin).collect()
    assert(w.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(
      ("https://a/1", 2L), ("https://a/2", 3L), ("https://a/3", 4L)))
    // the ingest metrics ledger is queryable (etl_runs analog)
    val m = spark.sql(
      "SELECT epochId, events, deletes FROM web_epochs").collect()
    assert(m.length === 1 && m(0).getLong(1) === 5L && m(0).getLong(2) === 1L)
  }

}
