package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof all-pairs self-join within groups.
  *
  * The naive `a.join(b, groupKey).filter(a.id < b.id)` is quadratic on
  * the hottest group AND concentrates that work in one shuffle partition
  * — runtime then depends on whether AQE happens to split the skewed key
  * (measured 25s vs 175s run-to-run on the MinHash bench). Here each
  * group's members are chunked by rank; the join key becomes
  * (group, chunkA, chunkB), so no key ever exceeds `chunkSize` rows per
  * side and the worst-case per-task output is chunkSize². Every
  * unordered pair lands in exactly one chunk cell — no dedup needed,
  * nothing dropped.
  */
object SelfJoin {

  /** All pairs (id_a < id_b) sharing every `groupCols` value, carrying
    * `payload` from both sides as `<payload>_a` / `<payload>_b`.
    */
  def pairsWithinGroups(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      payloadCols: Seq[String],
      chunkSize: Int = 500): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    val chunked = df
      .withColumn("__chunk", ((row_number().over(w) - 1) / chunkSize).cast("int"))
    val maxChunk = chunked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__chunk")).as("__maxc"))
    val withN = chunked.join(maxChunk, groupCols)

    // member of chunk c participates as the "a" side in cells (c, c..maxc)
    // and as the "b" side in cells (0..c, c): each unordered chunk pair
    // (ci <= cj) is enumerated exactly once.
    val a = withN
      .withColumn("__cj", explode(sequence(col("__chunk"), col("__maxc"))))
      .select(
        groupCols.map(col) ++ Seq(col("__chunk").as("__ci"), col("__cj"),
          col(idCol).as("id_a")) ++ payloadCols.map(c => col(c).as(s"${c}_a")): _*)
    val b = withN
      .withColumn("__ci", explode(sequence(lit(0), col("__chunk"))))
      .select(
        groupCols.map(col) ++ Seq(col("__ci"), col("__chunk").as("__cj"),
          col(idCol).as("id_b")) ++ payloadCols.map(c => col(c).as(s"${c}_b")): _*)

    a.join(b, groupCols ++ Seq("__ci", "__cj"))
      .filter(col("id_a") < col("id_b"))
      .drop("__ci", "__cj")
  }
}
