package graft

import org.apache.spark.sql.functions._
import graft.sources.ResultExport

/** S11 file-export sink: multi-format fan-out + metadata manifest
  * (reference generic_analytics_flow.py:175–233), with CSV-unsafe
  * columns flattened losslessly.
  */
class ResultExportSpec extends SparkSpec {
  import spark.implicits._

  test("parquet/csv/json export round-trips; manifest describes results") {
    val out = tmpDir("export")
    val df = Seq((1L, "a,b\"c", Seq(1, 2), Array[Byte](1, 2, 3)),
        (2L, "plain", Seq(3), Array[Byte](4)))
      .toDF("id", "txt", "arr", "bin")
    val e = ResultExport.exportResult(df, out, "r1", Seq("parquet", "csv", "json"))
    assert(e.rows === 2L && e.columns === Seq("id", "txt", "arr", "bin"))
    ResultExport.writeManifest(out, Seq(e))

    val pq = spark.read.parquet(s"$out/r1")
    assert(pq.count() === 2L && pq.columns.toSeq === df.columns.toSeq)

    val csv = spark.read.option("header", "true").csv(s"$out/r1.csv")
      .orderBy($"id")
    val got = csv.collect()
    assert(csv.columns.toSeq === df.columns.toSeq)
    // quoted/comma text survives; arrays as JSON; binary as base64
    assert(got(0).getAs[String]("txt") === "a,b\"c")
    assert(got(0).getAs[String]("arr") === "[1,2]")
    assert(java.util.Base64.getDecoder.decode(got(0).getAs[String]("bin"))
      .toSeq === Seq[Byte](1, 2, 3))

    val js = spark.read.json(s"$out/r1.json")
    assert(js.count() === 2L)
    assert(js.select(sum(size($"arr"))).head.getLong(0) === 3L)

    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/metadata.json"))
    assert(manifest.contains("\"name\": \"r1\"") &&
      manifest.contains("\"rows\": 2") && manifest.contains("\"csv\""))
  }
}
