package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet
  * (plus csv/json when SPARK_GRAFT_EXPORT lists them — the reference's
  * multi-format export, S11), a metadata.json result manifest, and
  * oracle_sql.json for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val formats = ("parquet" +: sys.env.getOrElse("SPARK_GRAFT_EXPORT", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq).distinct
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val entries = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try Some(graft.sources.ResultExport.exportResult(
        fn(spark, sfDir), outDir, name, formats))
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        None
      }
      // drop the query's ANONYMOUS persisted intermediates (dedup
      // shingles/signatures) now that its result is on disk — no query
      // rides another's cached subplans by accident; the deliberately
      // run-scoped shares (the Jaccard pair graph) persist until the
      // final release below
      finally graft.analytics.SessionCaches.releaseAnonymous(spark)
    }
    graft.analytics.SessionCaches.release(spark)
    graft.sources.ResultExport.writeManifest(outDir, entries)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
