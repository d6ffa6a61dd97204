package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle") {
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Writers.writeBucketedTable(a, "bkt_a", "k", 8, sortCol = Some("k"))
    Writers.writeBucketedTable(b, "bkt_b", "k", 8, sortCol = Some("k"))
    // force the non-broadcast path: bucketing matters when both sides are
    // fact-sized (a broadcast would win on these tiny test tables).
    // Conf tweak on a CHILD session (shared catalog, private conf): the
    // shared session's planner settings must stay untouched — suites run
    // concurrently and PlanSpec asserts broadcast shapes on it.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = s2.table("bkt_a").join(s2.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected bucket-aligned join with no shuffle, got:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    assert(joined.count() == 1000)
  }

  test("dynamic partition overwrite replaces only the written year") {
    val root = java.nio.file.Files.createTempDirectory("graft-dyn").toString
    val y25 = Seq((1L, 2025), (2L, 2025)).toDF("id", "ano")
    val y26 = Seq((3L, 2026)).toDF("id", "ano")
    Writers.overwriteYearPartition(y25, root)
    Writers.overwriteYearPartition(y26, root)
    // 2025 still present after the 2026 write
    assert(spark.read.parquet(root).count() == 3)
    // re-run 2026 with different rows: only that partition replaced
    val y26b = Seq((4L, 2026), (5L, 2026)).toDF("id", "ano")
    Writers.overwriteYearPartition(y26b, root)
    val back = spark.read.parquet(root)
    assert(back.count() == 4)
    assert(back.filter($"ano" === 2025).count() == 2)
    assert(back.filter($"ano" === 2026).select("id").as[Long].collect().toSet == Set(4L, 5L))
  }
}
