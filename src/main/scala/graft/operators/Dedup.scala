package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication with quarantine semantics (SURVEY.md §2.6).
  *
  * The reference never silently drops duplicates: it splits them out for
  * human review (etl_ui.py:109-117). Both variants are a single
  * `row_number` window — one shuffle on the dedup key, no driver loop —
  * so they scale to arbitrarily many rows per key and arbitrarily many
  * keys (skew on one key means one hot partition; see salted variants in
  * the scale notes).
  */
object Dedup {

  /** `ranked` is the cached intermediate when `cacheRanked` was set —
    * release it via [[Split.unpersist]] once both outputs are consumed.
    */
  final case class Split(
      kept: DataFrame, duplicates: DataFrame,
      ranked: Option[DataFrame] = None) {
    def unpersist(): Unit = ranked.foreach(_.unpersist())
  }

  private val RN = "__graft_rn"

  private def split(
      df: DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec,
      cacheRanked: Boolean): Split = {
    val rankedRaw = df.withColumn(RN, row_number().over(w))
    // both outputs read the ranked frame; caching it means one window
    // execution instead of one per consumer (a 4M-row run spent ~70s on
    // repeated windows without it)
    val ranked = if (cacheRanked) rankedRaw.persist() else rankedRaw
    Split(
      kept = ranked.filter(col(RN) === 1).drop(RN),
      duplicates = ranked.filter(col(RN) > 1).drop(RN),
      ranked = if (cacheRanked) Some(ranked) else None)
  }

  /** W1: keep the first-arriving row per key (arrival order = `orderCol`,
    * typically the ingest row_id); the rest become the duplicates frame.
    * (Reference: `duplicated(subset=key, keep="first")`, etl_ui.py:110.)
    */
  def keepFirst(df: DataFrame, key: Seq[Column], orderCol: Column,
      cacheRanked: Boolean = false): Split =
    split(df, Window.partitionBy(key: _*).orderBy(orderCol.asc), cacheRanked)

  /** W2: keep the "best" row per key — highest completeness then longest
    * duration, nulls losing (reference sorts with NA -> -1,
    * etl_ui.py:201-213).
    */
  def keepBest(df: DataFrame, key: Seq[Column], quality: Seq[Column], tieBreak: Column,
      cacheRanked: Boolean = false): Split =
    split(df, Window.partitionBy(key: _*)
      .orderBy(quality.map(_.desc_nulls_last) :+ tieBreak.asc: _*), cacheRanked)

  /** Exact full-row (or column-subset) dedup for large corpora: one
    * hash-shuffle groupBy, keeping the minimum-id row per group. Unlike
    * `dropDuplicates` the survivor is deterministic (`idCol` must be
    * unique). Null dedup keys form their own group, like any other.
    *
    * Plan shape: the survivor row rides a `min(struct(id, payload))`
    * aggregate — partial-aggregatable (hot keys combine map-side, never
    * materialize one window partition) and, critically, ONE scan of the
    * input. The previous groupBy + semi-join-back form referenced the
    * input subtree twice, so an expensive uncached upstream (the curate
    * pipeline's annotate kernels) executed twice per doc — caught by
    * the composed-plan audit (PlanSpec). The id leads the struct, so
    * comparison never reaches the payload fields; payload types must
    * still be orderable for the aggregate to analyze, so frames with
    * MapType payload fall back to the two-scan semi-join form (maps
    * can't ride a min) — callers with expensive upstreams and map
    * columns should persist before deduping.
    *
    * NULL ids never survive — in EITHER form. The semi-join form drops
    * them structurally (null never equals the winner id; a min over ids
    * ignores nulls), and the one-scan form filters them up front so the
    * two paths cannot diverge (struct ordering sorts nulls FIRST, so an
    * unfiltered null-id row would win the min there and only there —
    * caught by the r7 ADVICE pass). `idCol` is a row identity; rows
    * without one are not identifiable and are treated as such.
    */
  def exactByColumns(df: DataFrame, cols: Seq[String], idCol: String): DataFrame = {
    val payload = df.columns.filterNot(c => cols.contains(c) || c == idCol)
    val orderable = df.schema.fields.forall(f =>
      f.name == idCol || cols.contains(f.name) ||
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    if (orderable) {
      val w = (Iterator("__w") ++ Iterator.from(0).map(i => s"__w$i"))
        .find(n => !df.columns.contains(n)).get
      df.filter(col(idCol).isNotNull)
        .groupBy(cols.map(col): _*)
        .agg(min(struct((idCol +: payload).map(col): _*)).as(w))
        .select(df.columns.map { c =>
          if (cols.contains(c)) col(c) else col(w)(c).as(c)
        }: _*)
    } else {
      val keep = df.groupBy(cols.map(col): _*).agg(min(col(idCol)).as(idCol))
      val tagged = keep.select(
        (cols :+ idCol).map(c => col(c).as(s"__keep_$c")): _*)
      val cond = (cols.map(c => col(c) <=> col(s"__keep_$c")) :+
        (col(idCol) === col(s"__keep_$idCol"))).reduce(_ && _)
      df.join(tagged, cond, "left_semi")
    }
  }

  /** Skew-aware keep-first: same result as [[keepFirst]].kept, without a
    * per-key window. An aggregation (partial combine on the map side)
    * finds each key's winning orderCol, then a semi-join recovers the
    * winning rows — a hot key costs a partial-aggregated shuffle instead
    * of materializing its entire group in one window partition. Use when
    * one key can hold a significant fraction of all rows.
    *
    * PRECONDITION (no tieBreakCol): `orderCol` must be unique within each
    * key (e.g. the ingest row_id) — ties at the minimum would all survive,
    * diverging from the window variant which keeps exactly one row. When
    * orderCol can tie, pass a unique `tieBreakCol`: the winner is then
    * min-by (orderCol, tieBreakCol), still one aggregation + semi-join.
    */
  def keepFirstSkewAware(
      df: DataFrame, key: Seq[String], orderCol: String,
      tieBreakCol: Option[String] = None): DataFrame =
    tieBreakCol match {
      case None =>
        val winners = df.groupBy(key.map(col): _*)
          .agg(min(col(orderCol)).as(orderCol))
        df.join(winners, key :+ orderCol, "left_semi")
      case Some(tb) =>
        // min over a struct is lexicographic: min orderCol, then min
        // tieBreakCol — exactly one unique winner per key.
        val winners = df.groupBy(key.map(col): _*)
          .agg(min(struct(col(orderCol), col(tb))).as("__w"))
          .select((key.map(col) :+ col(s"__w.$tb").as(tb)): _*)
        df.join(winners, key :+ tb, "left_semi")
    }
}
