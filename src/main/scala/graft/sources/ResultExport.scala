package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result file-export sink + metadata manifest.
  *
  * Reference analog: the analytics flow's export step
  * (/root/reference/generic_analytics_flow.py:175–233) writes each
  * query's result as parquet / csv / json and a `metadata.json` manifest
  * describing what was exported. Same surface here, Spark-writer-backed:
  * formats fan out from one DataFrame; the manifest records name, row
  * count, schema and formats per result.
  *
  * CSV cannot carry nested/binary values, so [[csvSafe]] serializes
  * array/map/struct columns to JSON strings and binary to base64 —
  * lossless and re-parseable — rather than failing the export.
  *
  * CSV null contract: nulls are written as the `\N` sentinel
  * ([[CsvNullValue]]) so empty strings survive (Spark's default reads
  * unquoted empty AND quoted "" both as null). Re-read with
  *   .option("nullValue", ResultExport.CsvNullValue)
  *   .option("multiLine", "true")   // quoted embedded newlines
  * and `from_json`/`unbase64` on the flattened columns. The round-trip
  * is property-pinned in ResultExportRoundTripSpec; the format's one
  * irreducible caveat: a top-level STRING value that is exactly the
  * two-character sentinel reads back as null (use JSON/parquet when
  * that matters).
  */
object ResultExport {

  /** CSV null sentinel (the conventional `\N`). */
  val CsvNullValue: String = "\\N"

  final case class Entry(name: String, rows: Long,
                         columns: Seq[String], formats: Seq[String])

  /** Flatten CSV-unrepresentable columns to strings. */
  def csvSafe(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(f.name)).as(f.name)
        case BinaryType => base64(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Write `df` under `outDir/<name>[.fmt]` in each format; returns the
    * manifest entry. Formats: parquet | csv | json.
    */
  def exportResult(df: DataFrame, outDir: String, name: String,
             formats: Seq[String]): Entry = {
    val out = df.coalesce(1).persist()
    try {
      val rows = out.count()
      formats.foreach {
        case "parquet" =>
          out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")
        case "csv" =>
          csvSafe(out).write.mode(SaveMode.Overwrite)
            .option("header", "true")
            .option("nullValue", CsvNullValue)
            // Spark's csv WRITER trims cell whitespace by default —
            // lossy for strings with leading/trailing blanks
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .csv(s"$outDir/$name.csv")
        case "json" =>
          out.write.mode(SaveMode.Overwrite).json(s"$outDir/$name.json")
        case f => throw new IllegalArgumentException(s"unknown export format: $f")
      }
      Entry(name, rows, out.columns.toSeq, formats)
    } finally { out.unpersist(); () }
  }

  /** Write the `metadata.json` manifest next to the exported results. */
  def writeManifest(outDir: String, entries: Seq[Entry]): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = entries.sortBy(_.name).map { e =>
      s"""{"name": ${q(e.name)}, "rows": ${e.rows}, """ +
        s""""columns": [${e.columns.map(q).mkString(", ")}], """ +
        s""""formats": [${e.formats.map(q).mkString(", ")}]}"""
    }.mkString("[\n  ", ",\n  ", "\n]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/metadata.json"), body)
  }
}
