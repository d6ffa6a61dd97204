package graft

/** Session conf every graft entry point shares. */
object Sessions {

  /** Optimizer rules excluded in graft sessions.
    *
    * `EliminateWindowPartitions` strips foldable window partition keys,
    * turning `Window.partitionBy(lit(0))` back into a partition-less
    * window. The library uses the constant key deliberately (see
    * [[graft.operators.SurrogateKeys.dense]]): it executes identically —
    * one exchange, all rows in one task — but *declares* the single
    * partition, so Spark's "No Partition Defined" runtime warning (which
    * reads as an unintended scale hazard in bench logs) does not fire
    * for windows whose single-task shape is a documented design
    * decision. PlanSpec's detector treats constant specs exactly like
    * empty ones, so the exclusion cannot hide a real fact-path
    * regression.
    */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"
}
