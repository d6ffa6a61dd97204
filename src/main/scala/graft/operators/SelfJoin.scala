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
    *
    * Rows with a NULL group key never pair (spec-pinned, r15 — ADVICE
    * r14 asked for the contract to be settled): the r14 window rewrite
    * does assign them chunk ids (`Window.partitionBy` groups NULLs
    * together), but the a×b equi-join on `groupCols` below drops them
    * exactly as the pre-r14 using-column join did — null keys do not
    * equal each other in a join. So the observable contract is
    * UNCHANGED by the rewrite, for internal callers (which only pass
    * generated non-null bucket keys) and external ones alike.
    */
  def pairsWithinGroups(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      payloadCols: Seq[String],
      chunkSize: Int = 500): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    // The group's last chunk id comes from a COUNT window over the same
    // partitioning (chunk ids are contiguous from 0, so it is
    // ceil(n/chunkSize) - 1 == max(__chunk)) — same exchange, same sort,
    // zero extra passes; the former groupBy(max) + join shape re-ran the
    // whole window subtree per join side and built one more broadcast
    // per call (optimization guide §2.4: operations keyed the same way
    // share one exchange).
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val withN = df
      .withColumn("__chunk", ((row_number().over(w) - 1) / chunkSize).cast("int"))
      .withColumn("__maxc",
        (((count(lit(1)).over(wAll) - 1) / chunkSize).cast("int")))

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
