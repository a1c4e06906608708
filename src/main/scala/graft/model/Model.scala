package graft.model

/** Core data model of the extraction engine.
  *
  * Mirrors the reference's four abstractions (see
  * /root/reference/app/models/task.py:26-34 task row,
  * app/api/routes.py:84-108 document payload,
  * app/services/minio_service.py:87-147 result object) re-expressed as
  * fixed-schema Spark rows per SURVEY.md §1.2.
  */

/** One Common-Crawl-style page — the `input_hint` table shape.
  * `html` carries HTML bytes or a PDF payload (sniffed, not ext-dispatched:
  * the reference's extension switch at ocr_service.py:271-282 becomes
  * content sniffing on magic bytes).
  */
case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** The two columns the extract kernel actually reads — the kernel maps
  * over Dataset[PageRaw] so Parquet column pruning drops warc_ts/text/lang
  * at the scan (at 100 TB the pruned `text` column alone is ~40% of the
  * table bytes).
  */
case class PageRaw(url: String, html: Array[Byte])

/** Character-offset span into `Extracted.text` (one per kept block). */
case class Span(start: Long, end: Long, kind: String)

/** One extraction result row — replaces the reference's SQLite task row +
  * MinIO text object (task.py:26-34, minio_service.py:125-131).
  * `status` uses the reference's enum values (task.py:8-12):
  * processing/completed/failed/cancelled.
  * Per A9 (pdf_utils.py:150-158) a doc with failed pages is still
  * `completed`; failures appear only in the merged text footer and the
  * `n_failed_pages` counter.
  */
case class Extracted(
    url: String,
    status: String,
    text: String,
    spans: Seq[Span],
    error: String,
    n_pages: Int,
    n_failed_pages: Int,
    engine: String,
    bucket: Int
)

/** Per-bucket lineage row — replaces the SQLite status upsert
  * (task.py:39-58) as the resumability store. One row per completed
  * output bucket per input snapshot; a re-run anti-joins done buckets
  * and dynamic-partition-overwrites the remainder (idempotent, same
  * last-writer-wins semantics as INSERT OR REPLACE).
  */
case class PartitionLineage(
    snapshot_id: Long,
    bucket: Int,
    doc_count: Long,
    byte_count: Long,
    ok_count: Long,
    fail_count: Long,
    failure_samples: Seq[String],
    wall_ms: Long
)
