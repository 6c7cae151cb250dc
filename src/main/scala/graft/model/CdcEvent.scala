package graft.model

import org.apache.spark.sql.types._

/** Core data model of the CDC/incremental-ingest engine.
  *
  * A change event over a Common-Crawl-style web-page row, per
  * BASELINE.json `input_hint`: (url, warc_ts, html, text, lang) plus the
  * WAL bookkeeping columns the reference keeps implicitly in SQLite
  * (reference: message rows keyed by (message_id, platform, chat_id),
  * /root/reference/convoetl/loaders/sqlite.py:102–119; watermark =
  * MAX(message_id), sqlite.py:238–256).
  *
  *  - `seq`      global WAL position; strictly increasing at the source;
  *               the deterministic LWW tie-break (SURVEY §7.4).
  *  - `op`       'I' | 'U' | 'D'  (I and U are both upserts; D is a
  *               tombstone — reference analog INSERT OR REPLACE vs delete).
  *  - `warc_ts`  the last-writer-wins ordering field.
  *  - `extra_score` appears only mid-stream (additive schema evolution
  *               fixture, FIXTURES.md F1). Nullable.
  */
case class CdcEvent(
    seq: Long,
    op: String,
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    extra_score: Option[Double])

object CdcSchema {
  /** v1: the schema before mid-stream additive evolution. */
  val v1: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  /** v2: v1 + extra_score (additive, nullable — Iceberg-style add-column). */
  val v2: StructType = StructType(v1.fields :+
    StructField("extra_score", DoubleType, nullable = true))

  /** Latest feed schema. */
  val latest: StructType = v2
  val latestSchemaId: Int = 2

  /** Target lake-table row schema: latest feed columns + url_hash bucket
    * key + tombstone flag (deletes are retained so a late update older
    * than the tombstone cannot resurrect the row — SURVEY §7.4).
    */
  val tableSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("url_hash", LongType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("tombstone", BooleanType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("extra_score", DoubleType, nullable = true)))
}
