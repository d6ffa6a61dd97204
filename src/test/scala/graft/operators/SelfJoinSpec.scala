package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SelfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("chunked pairs == naive pairs, incl. chunk-boundary groups") {
    val rnd = new scala.util.Random(17)
    // group sizes straddle the chunk size (3): 1..8 members
    val rows = (0 until 40).map(i => (s"g${rnd.nextInt(8)}", i.toLong, s"p$i"))
    val df = rows.toDF("g", "id", "payload")
    val chunked = SelfJoin.pairsWithinGroups(df, Seq("g"), "id", Seq("payload"), chunkSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = df.select($"g", $"id".as("id_a"))
    val b = df.select($"g", $"id".as("id_b"))
    val naive = a.join(b, "g").filter($"id_a" < $"id_b")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(chunked == naive)
    // payload carried from both sides
    val withP = SelfJoin.pairsWithinGroups(df, Seq("g"), "id", Seq("payload"), chunkSize = 3)
    assert(withP.columns.toSet.intersect(Set("payload_a", "payload_b")).size == 2)
  }

  test("join keys stay bounded by chunkSize even on one saturated group") {
    // 1000 rows in ONE group: the naive self-join would put 1M pair
    // candidates on a single key. Replicate the operator's chunk
    // assignment (rank by id within group) and assert no (group, chunk)
    // cell — i.e. no side of any join key — exceeds chunkSize rows.
    val chunkSize = 100
    val df = (0L until 1000L).map(i => ("hot", i)).toDF("g", "id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"id")
    val cellSizes = df
      .withColumn("__chunk", ((row_number().over(w) - 1) / chunkSize).cast("int"))
      .groupBy("g", "__chunk").count()
      .agg(max("count")).as[Long].head()
    assert(cellSizes <= chunkSize.toLong)
    // and the chunked operator still enumerates every pair exactly once
    val n = 1000L
    val got = SelfJoin.pairsWithinGroups(df, Seq("g"), "id", Seq.empty, chunkSize = chunkSize)
    assert(got.count() == n * (n - 1) / 2)
    assert(got.select("id_a", "id_b").distinct().count() == n * (n - 1) / 2)
  }

  test("null group keys never pair (contract unchanged by the r14 window rewrite)") {
    // pins the contract ADVICE r14 asked to settle: the window assigns
    // null-key rows chunk ids (partitionBy groups NULLs together), but
    // the a×b equi-join on the group columns drops them — same
    // observable behavior as the pre-r14 groupBy(max)+join shape.
    val df = Seq(
      (Option("g"), 1L), (Option("g"), 2L),
      (Option.empty[String], 10L), (Option.empty[String], 11L),
      (Option.empty[String], 12L)).toDF("g", "id")
    val got = SelfJoin.pairsWithinGroups(df, Seq("g"), "id", Seq.empty, chunkSize = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
