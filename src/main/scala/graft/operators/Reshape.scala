package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide->long reshaping (SURVEY.md §2.9, M1-M4).
  *
  * The reference's load loops iterate (row, question-column) pairs in
  * Python (etl_ui.py:458-470,522-566,589-600,644-658). Here each melt is
  * Spark's native `unpivot` — a narrow transformation (no shuffle): each
  * input row expands to k output rows inside the same partition, so it
  * scales linearly and stays in whole-stage codegen.
  */
object Reshape {

  /** Unpivot `valueCols` of `df` into (`varName`, `valName`) long rows,
    * carrying `ids`. Values are cast to `valueType` first (unpivot
    * requires a common type; the reference's cells are all strings until
    * coerced).
    */
  def unpivot(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      varName: String,
      valName: String,
      valueType: String = "string"): DataFrame =
    df.unpivot(
      ids.map(col).toArray,
      valueCols.map(c => col(c).cast(valueType).as(c)).toArray,
      varName,
      valName)

  /** M1-style unpivot dropping null measures (the reference only loads
    * non-null cells).
    */
  def unpivotNonNull(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      varName: String,
      valName: String,
      valueType: String = "string"): DataFrame =
    unpivot(df, ids, valueCols, varName, valName, valueType)
      .filter(col(valName).isNotNull)
}
