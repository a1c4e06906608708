package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic companion to Bench (guide §1.4/§1.5): per-query timings with
  * job/stage/task counts from a listener, and `.explain("formatted")`
  * dumps for plan evidence. NOT part of the driver contract — Bench.scala
  * is the frozen harness; this main exists so optimization work can see
  * where the per-query seconds go (at smoke scale most queries are
  * scheduling-overhead-bound, so job/stage counts are the first metric).
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR     input dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS       cores (default 32)
  *   SPARK_GRAFT_PLAN_DIR   if set, write <query>.txt explain files there
  *   SPARK_GRAFT_ONLY       comma-separated query subset
  *   SPARK_GRAFT_EXTRA_REPS best-of-N reps (default 2)
  *   SPARK_GRAFT_SINK       "noop" to time df.write.format("noop") (guide
  *                          §1.4: materializes EVERY column) instead of
  *                          the harness's agg(count) action
  *   SPARK_GRAFT_PLAN_EXTRA "1" to also dump plans for the touched but
  *                          non-benched queries (no timing)
  */
object BenchExtra {

  private final class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val s = graft.operators.GraftConf(SparkSession.builder()
      .master(s"local[$hi]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", hi.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val counter = new Counter
    s.sparkContext.addSparkListener(counter)

    // same raw-op substitutions as Bench (sketch queries time the raw
    // operator, ann_ivfpq times the retrieval leg over a prebuilt index)
    val ivfCellsMat = graft.operators.Similarity.annIvfCells(s, sfDir).localCheckpoint()
    val ivfProbesMat = graft.operators.Similarity.annIvfProbes(s, sfDir).localCheckpoint()
    val pqPairsMat = graft.operators.Pq.pqPairs(s, sfDir).localCheckpoint()
    val rawOps: Map[String, (SparkSession, String) => DataFrame] = Map(
      "dedup_minhash_lsh" -> ((ss, d) => graft.operators.Dedup.dedupMinhashLsh(ss, d)),
      "dedup_simhash" -> ((ss, d) => graft.operators.Dedup.dedupSimhash(ss, d)),
      "ann_lsh" -> ((ss, d) => graft.operators.Similarity.annLsh(ss, d)),
      "ann_ivf" -> ((ss, d) => graft.operators.Similarity.annIvf(ss, d)),
      "ann_ivfpq" -> ((ss, d) => graft.operators.Similarity.annIvfPqFrom(ss, d,
        ivfCellsMat, ivfProbesMat, pqPairsMat)))
    val secondary = Seq(
      "q1_pricing_summary", "q3_top_revenue", "q_window_topk",
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "ann_bruteforce", "ann_lsh", "ann_ivfpq", "text_stats", "text_quality",
      "para_scrub", "text_repetition", "text_pii", "text_chunks",
      "text_lm_score", "q_asof_join", "q_sessionize",
      "decontaminate", "substring_dedup", "substring_dedup_hashed",
      "corpus_pack", "bpe_pair_stats", "link_graph", "robots_filter")
      .filter(n => only.forall(_.contains(n)))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val noop = sys.env.get("SPARK_GRAFT_SINK").contains("noop")
    def consume(df: DataFrame): Unit =
      if (noop) df.write.format("noop").mode("overwrite").save()
      else { df.agg(count(lit(1))).collect(); () }
    def dumpPlan(name: String, df: DataFrame): Unit = planDir.foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"), plan): Unit
    }

    val rows = secondary.map { name =>
      val fn = rawOps.getOrElse(name, SparkEntry.queries(name))
      s.sparkContext.setJobDescription(s"warm:$name")
      consume(fn(s, sfDir))
      dumpPlan(name, fn(s, sfDir))
      counter.reset()
      s.sparkContext.setJobDescription(s"timed:$name")
      val (_, t1) = timed(consume(fn(s, sfDir)))
      val (j, st, tk) = (counter.jobs.get, counter.stages.get, counter.tasks.get)
      val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
      val more = (1 until reps).map(_ => timed(consume(fn(s, sfDir)))._2)
      (name, (t1 +: more).min, j, st, tk)
    }
    // touched-but-not-benched queries: plan evidence only (their
    // operators changed through the shared helpers this round)
    if (sys.env.get("SPARK_GRAFT_PLAN_EXTRA").contains("1"))
      Seq("dedup_ngram_jaccard", "dedup_clusters_lsh", "pipeline_corpus",
        "q_warc_source", "q_wet_sink").foreach { name =>
        dumpPlan(name, SparkEntry.queries(name)(s, sfDir))
      }
    println(f"${"query"}%-24s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    rows.foreach { case (n, t, j, st, tk) =>
      println(f"$n%-24s $t%8.3f $j%5d $st%7d $tk%6d")
    }
    println(f"TOTAL ${rows.map(_._2).sum}%.3f")
    s.stop()
  }
}
