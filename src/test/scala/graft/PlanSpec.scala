package graft

import graft.etl.{Fixtures, Pipeline}
import graft.sources.Readers

/** Plan-shape regression tests: the scale story depends on these plan
  * properties, so they are pinned — a refactor that silently turns the
  * registry join into a shuffle or widens a pruned scan should fail CI,
  * not a 100 TB run.
  */
class PlanSpec extends SparkSpec {

  test("entity pipeline: registry join is broadcast, dedup is the only wide exchange") {
    val registry = spark.read.option("header", "true").csv(Fixtures.path("entidades.csv"))
    val survey = Readers.csv(spark, Fixtures.path("survey_2026.csv"))
    val result = Pipeline.run(survey, registry, Fixtures.config, 2026)
    val plan = result.valid.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "registry join must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no sort-merge in the identification phase")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges <= 1, s"expected at most the dedup exchange, got $hashExchanges:\n$plan")
  }

  test("aggregation scan prunes to referenced columns only") {
    val q = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.isDefined, s"no scan in plan:\n$plan")
    val cols = readSchema.get.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"),
      s"scan should read exactly the 4 referenced columns, got $cols")
  }

  test("stratified sample scan prunes to id + stratum columns") {
    val q = SparkEntry.queries("q52_stratified_sample")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.isDefined, s"no scan in plan:\n$plan")
    val cols = readSchema.get.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("doc_id", "lang"),
      s"sampling must not read the text column, got $cols")
  }

  test("contamination reads the training side exactly once") {
    val q = SparkEntry.queries("q51_contamination")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    val scans = "ReadSchema".r.findAllIn(plan).size
    assert(scans == 2, s"expected one scan per side (train + bench), got $scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "benchmark gram set must broadcast")
  }

  test("normalize runs as a native expression, not a UDF") {
    val q = SparkEntry.queries("q14_normalize_text")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("normalizetextexpr"), s"native expr missing:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "normalize must not fall back to a UDF node")
  }
}
