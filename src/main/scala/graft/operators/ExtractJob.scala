package graft.operators

import graft.kernel.ExtractKernel
import graft.model.{Extracted, Page, PageRaw, PartitionLineage}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship pipeline: pages → extract kernel (narrow, shuffle-free) →
  * bucket-grouped write (+ per-bucket lineage, resume anti-join).
  *
  * Spark restatement of the reference's upload→celery→worker lifecycle
  * (SURVEY.md §3.1): the Redis queue + worker pool becomes scan-partition
  * parallelism; the SQLite task upsert (task.py:39-58) becomes idempotent
  * dynamic-partition-overwrite keyed by a stable url-hash bucket; the
  * per-task retry ladder (ocr_task.py:13,92) becomes
  * spark.task.maxFailures at task granularity plus per-row error capture
  * at data granularity.
  *
  * Scale design (100 TB / 10^12 docs):
  *   - bucket = pmod(xxhash64(url), B) is STABLE across runs and cluster
  *     sizes → lineage and resume are cluster-size independent.
  *   - the kernel is a narrow mapPartitions over the scan: raw payload
  *     bytes never shuffle. The pipeline's only exchange moves EXTRACTED
  *     rows (5-20% of payload), inside writeExtracted. Filters on the
  *     pages scan (snapshot pruning, resume anti-join) push down to
  *     parquet; the scan reads only (url, html).
  *   - doc-size skew (a few huge payloads) is bounded by the 10 MB cap
  *     (config.py:15), so per-bucket cost is ~uniform once urls hash
  *     uniformly; host skew only matters for per-host aggregations, where
  *     metricsByHost() salts the hot keys.
  */
object ExtractJob {

  /** default bucket count — at 100 TB this would be O(100k); tests use
    * small values. Must be stable for a given output table.
    */
  val DefaultBuckets = 64

  def bucketCol(buckets: Int) =
    pmod(xxhash64(col("url")), lit(buckets.toLong)).cast("int")

  /** pages → extracted. Deliberately shuffle-free: the kernel is a narrow
    * typed mapPartitions directly over the scan partitions, so the raw
    * payload bytes (the dominant data volume — at 100 TB, ~all of it)
    * NEVER cross the wire. Bucket grouping happens after extraction, on
    * the much smaller extracted text, inside `writeExtracted`.
    *
    * (v1 repartitioned pages on bucket before the kernel; benchmarking
    * showed the payload shuffle, not the kernel, capped throughput — the
    * fix is the classic "push work below the exchange" move.)
    */
  def extract(
      spark: SparkSession,
      pages: Dataset[Page],
      buckets: Int = DefaultBuckets,
      profile: ExtractKernel.Profile = ExtractKernel.Standard): Dataset[Extracted] = {
    import spark.implicits._
    val b = buckets
    val prof = profile
    pages
      // project to the two kernel columns BEFORE the typed boundary:
      // Parquet column pruning then skips warc_ts/text/lang at the scan
      // (.explain shows ReadSchema: struct<url,html> — at 100 TB the
      // unread text column alone is a ~40% scan saving)
      .select(col("url"), col("html"))
      .as[PageRaw]
      .mapPartitions { it =>
        // kernel-side bucket MUST equal bucketCol: pmod(xxhash64(url), B).
        // XxHash.hashUtf8 reimplements Spark's xxhash64 (seed 42, UTF-8
        // bytes); equality is asserted in OperatorsSpec.
        val bucketOf = (p: PageRaw) =>
          java.lang.Math.floorMod(XxHash.hashUtf8(p.url), b.toLong).toInt
        ExtractKernel.run(bucketOf, prof)(it)
      }
  }

  /** Per-bucket lineage metrics (replaces the SQLite status table's
    * operational role — SURVEY.md §4.4). One row per bucket per snapshot.
    * failure_samples: bounded top-k of error strings per bucket.
    *
    * `status` carries the bucket's terminal state, mirroring the
    * reference's 4-state task enum (task.py:8-12): rows written here are
    * 'completed' (even when individual docs failed — doc failures are
    * data, A9); an explicitly cancelled run writes 'cancelled' marks via
    * `cancelledLineage` (routes.py:253 sets the same state); a crash
    * writes nothing — so resume can distinguish cancel from crash.
    */
  def lineage(extracted: Dataset[Extracted], snapshotId: Long): DataFrame = {
    extracted.toDF()
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(length(col("text")).cast("long")).as("byte_count"),
        sum(when(col("status") === "completed", 1L).otherwise(0L)).as("ok_count"),
        sum(when(col("status") =!= "completed", 1L).otherwise(0L)).as("fail_count"),
        slice(sort_array(collect_set(when(col("status") =!= "completed", col("error")))), 1, 5)
          .as("failure_samples")
      )
      .withColumn("snapshot_id", lit(snapshotId))
      .withColumn("wall_ms", lit(-1L)) // filled by the writer wrapper
      .withColumn("status", lit("completed"))
      .select("snapshot_id", "bucket", "doc_count", "byte_count",
        "ok_count", "fail_count", "failure_samples", "wall_ms", "status")
  }

  /** Lineage marks for buckets interrupted by an explicit cancel (A10):
    * zero-count rows with status='cancelled'. Written by the runner when a
    * job-group cancel lands mid-run; the resume filter ignores them (only
    * 'completed' buckets are skipped), so a rerun reprocesses exactly the
    * cancelled buckets — but an operator inspecting lineage can tell the
    * run was cancelled, not crashed.
    */
  def cancelledLineage(spark: SparkSession, bucketsTodo: Seq[Int],
      snapshotId: Long, wallMs: Long): DataFrame = {
    import spark.implicits._
    bucketsTodo
      .map(b => (snapshotId, b, 0L, 0L, 0L, 0L, Seq.empty[String], wallMs, "cancelled"))
      .toDF("snapshot_id", "bucket", "doc_count", "byte_count",
        "ok_count", "fail_count", "failure_samples", "wall_ms", "status")
  }

  /** Resume: drop pages whose bucket already has a lineage row for this
    * snapshot (broadcast anti-join — the done-bucket list is tiny relative
    * to the data; SURVEY.md §2 Table C "Joins").
    */
  def resumeFilter(
      spark: SparkSession,
      pages: Dataset[Page],
      lineageDf: DataFrame,
      snapshotId: Long,
      buckets: Int = DefaultBuckets): Dataset[Page] = {
    import spark.implicits._
    val forSnapshot = lineageDf.filter(col("snapshot_id") === snapshotId)
    // only COMPLETED buckets are skipped: 'cancelled' marks (A10) leave
    // their buckets eligible for the resume run
    val done = (if (forSnapshot.columns.contains("status"))
        forSnapshot.filter(col("status") === "completed")
      else forSnapshot)
      .select(col("bucket"))
      .distinct()
    pages
      .withColumn("__bucket", bucketCol(buckets))
      .join(broadcast(done), col("__bucket") === done("bucket"), "left_anti")
      .drop("__bucket")
      .as[Page]
  }

  /** Write extracted partitioned by bucket with dynamic partition
    * overwrite: re-running any subset of buckets replaces exactly those
    * partitions (the INSERT OR REPLACE analogue, task.py:52-55).
    *
    * The only shuffle of the whole pipeline happens here, on EXTRACTED
    * rows (typically 5-20% of the raw payload bytes): repartitioning on
    * the bucket column co-locates each output partition in one task so
    * the writer emits one file per bucket instead of tasks×buckets
    * fragments — at 100 TB, file-count control is what keeps the output
    * table listable.
    */
  def writeExtracted(extracted: Dataset[Extracted], outDir: String,
      writeParallelism: Int = 0): Unit = {
    // explicit partition count: a bare repartition(col) is AQE-coalescible
    // and a small extracted shuffle collapses to ~1 task that then writes
    // every bucket directory serially (measured 15 s of a 20 s run)
    val parallelism =
      if (writeParallelism > 0) writeParallelism
      else math.max(extracted.sparkSession.sparkContext.defaultParallelism, 1)
    extracted.toDF()
      .repartition(parallelism, col("bucket"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(outDir)
  }

  /** Snapshot id for an input: stable hash of the resolved input files
    * (the Iceberg snapshot-id stand-in; SURVEY.md §1.2 "Iceberg note").
    */
  def snapshotIdOf(spark: SparkSession, inputPath: String): Long = {
    val files = spark.read.parquet(inputPath).inputFiles.sorted
    files.foldLeft(17L)((acc, f) => acc * 31L + f.hashCode.toLong)
  }

  /** Per-host metrics with salting for the hot hosts: two-phase agg —
    * partial counts on (host, salt), then final on host — so a single hot
    * host (Common-Crawl reality) cannot pin one reducer (SURVEY.md §7.4
    * item 5). AQE skew handling complements this at shuffle level.
    */
  def metricsByHost(extracted: Dataset[Extracted], saltFanout: Int = 16): DataFrame = {
    val hostCol = regexp_extract(col("url"), "^https?://([^/]+)/", 1)
    extracted.toDF()
      .withColumn("host", hostCol)
      .withColumn("salt", pmod(xxhash64(col("url")), lit(saltFanout.toLong)))
      .groupBy(col("host"), col("salt"))
      .agg(
        count(lit(1)).as("c"),
        sum(when(col("status") === "completed", 1L).otherwise(0L)).as("ok"),
        sum(length(col("text")).cast("long")).as("chars"))
      .groupBy(col("host"))
      .agg(
        sum(col("c")).as("doc_count"),
        sum(col("ok")).as("ok_count"),
        sum(col("chars")).as("char_count"))
  }
}

/** Stable 64-bit hash of a UTF-8 string matching Spark's `xxhash64`
  * (seed 42) so the kernel-side bucket equals the Catalyst-side
  * `bucketCol` value. Implementation: XXH64 over the UTF-8 bytes, seed 42
  * — the same definition Spark's XxHash64 expression uses for
  * StringType input.
  */
object XxHash {
  private val PRIME1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val PRIME2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private val PRIME3 = 1609587929392839161L  // 0x165667B19E3779F9
  private val PRIME4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private val PRIME5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  def hashUtf8(s: String, seed: Long = 42L): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  def hashBytes(data: Array[Byte], seed: Long): Long = {
    val length = data.length
    var hash: Long = 0L
    var off = 0
    if (length >= 32) {
      var v1 = seed + PRIME1 + PRIME2
      var v2 = seed + PRIME2
      var v3 = seed
      var v4 = seed - PRIME1
      val limit = length - 32
      while (off <= limit) {
        v1 = round(v1, getLong(data, off))
        v2 = round(v2, getLong(data, off + 8))
        v3 = round(v3, getLong(data, off + 16))
        v4 = round(v4, getLong(data, off + 24))
        off += 32
      }
      hash = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      hash = mergeRound(hash, v1)
      hash = mergeRound(hash, v2)
      hash = mergeRound(hash, v3)
      hash = mergeRound(hash, v4)
    } else {
      hash = seed + PRIME5
    }
    hash += length
    while (off + 8 <= length) {
      hash ^= round(0L, getLong(data, off))
      hash = java.lang.Long.rotateLeft(hash, 27) * PRIME1 + PRIME4
      off += 8
    }
    if (off + 4 <= length) {
      hash ^= (getInt(data, off) & 0xFFFFFFFFL) * PRIME1
      hash = java.lang.Long.rotateLeft(hash, 23) * PRIME2 + PRIME3
      off += 4
    }
    while (off < length) {
      hash ^= (data(off) & 0xFFL) * PRIME5
      hash = java.lang.Long.rotateLeft(hash, 11) * PRIME1
      off += 1
    }
    fmix(hash)
  }

  private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * PRIME2, 31) * PRIME1

  private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * PRIME1 + PRIME4

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= PRIME2
    h ^= h >>> 29
    h *= PRIME3
    h ^= h >>> 32
    h
  }

  private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def getInt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)
}
