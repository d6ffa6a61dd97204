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
}
