package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ExtractJob, Relational, Similarity}
import graft.sources.PageSynth

/** Plan-shape regression tests: the properties that make the pipeline
  * scale are structural facts of the physical plan — assert them so a
  * future change can't silently reintroduce a payload shuffle or lose
  * column pruning.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("extract: no exchange before the kernel; scan reads only url+html") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_plan").toString
    PageSynth.pages(spark, sf0001).write.mode("overwrite").parquet(s"$tmp/pages")
    import spark.implicits._
    val pages = spark.read.parquet(s"$tmp/pages").as[graft.model.Page]
    val plan = physicalPlan(ExtractJob.extract(spark, pages, 64).toDF())
    assert(!plan.contains("Exchange"), s"payload shuffle reintroduced:\n$plan")
    assert(plan.contains("ReadSchema: struct<url:string,html:binary>"),
      s"column pruning lost:\n$plan")
  }

  test("q3: dimension joins are broadcast (no shuffle of the fact side for dims)") {
    val plan = physicalPlan(Relational.q3TopRevenue(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("broadcast dims: both dimension joins broadcast, no sort-merge join") {
    val plan = physicalPlan(Relational.qBroadcastDims(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q1: predicate pushed to parquet scan; partial aggregation before exchange") {
    val df = Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed down:\n$plan")
    // partial_sum before the exchange = map-side combine
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
  }

  test("topk: global sort+limit plans as TakeOrderedAndProject (no full sort)") {
    val plan = physicalPlan(Relational.qTopK(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("resume filter: the done-bucket side is broadcast, not shuffled") {
    import spark.implicits._
    val pages = PageSynth.pages(spark, sf0001)
    val extracted = ExtractJob.extract(spark, pages, 8)
    val lineageDf = ExtractJob.lineage(extracted, 1L)
    val plan = physicalPlan(
      ExtractJob.resumeFilter(spark, pages, lineageDf, 1L, 8).toDF())
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("ann: query side broadcast against the corpus scan") {
    val plan = physicalPlan(Similarity.annBruteForce(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }
}
