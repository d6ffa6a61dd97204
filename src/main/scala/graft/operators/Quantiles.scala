package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics (T87, r11) — the per-domain
  * length/score percentile row every data card and curation threshold
  * decision reads (CCNet's head/middle/tail cuts, the q100 bucket
  * boundaries, "p99 document length" capacity planning). Spark's own
  * `percentile` aggregate buffers every group value in executor
  * memory (OOM at corpus-sized groups) and `percentile_approx` is a
  * sketch no other engine replays bit-for-bit — this operator computes
  * EXACT discrete quantiles (`percentile_disc` semantics: the smallest
  * value whose cumulative count reaches `ceil(q * n)`) with nothing
  * but a sort-based window, so it scales to groups of any size and
  * replays exactly in any engine.
  *
  * Rank arithmetic is INTEGER end-to-end: `q` is frozen to micro-units
  * (`round(q * 1e6)` — quantiles with more than six decimals are
  * nobody's release report), and the target rank is
  * `(q_micro * n + 999999) DIV 1000000` = `ceil(q * n)` computed
  * without ever touching a double — the cross-engine discipline every
  * exact fold in this family follows (a double `ceil(0.9 * n)` can
  * land one row off the integer answer depending on rounding).
  *
  * Plan shape: ONE exchange (hash by key for the window sort), then a
  * codegen'd explode×filter that keeps exactly |qs| rows per key — the
  * row amplification lives inside a filter that never materializes.
  * Parallelism is bounded by key count (each key's sort is one task):
  * right for domain-grain cards with thousands of keys; for FEW-KEY
  * corpora use [[exactQuantilesScalable]] — bit-equal answers with no
  * single-task stage (r12) — or the approx twin below.
  *
  * Nulls in the value column are excluded (the `percentile_disc`
  * convention); a key whose values are all null produces no rows.
  *
  * Output: `keyCol`, `quantile` (double, the micro-unit value divided
  * back — bit-identical cross-engine), `n` (group count), `value`
  * (the input column's own type).
  */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: ${qs.mkString(", ")}")
    val qMicro = qs.map(q => math.round(q * 1e6))
    require(qMicro.distinct.size == qMicro.size,
      s"quantiles collide at micro-unit precision: ${qs.mkString(", ")}")
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(valueCol))
    df.select(col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__qm", explode(typedLit(qMicro)))
      // integral DIV: ceil(q * n) with no double in the loop
      .where(col("__rn") === expr("(__qm * __n + 999999) DIV 1000000"))
      .select(
        col(keyCol),
        (col("__qm") / lit(1000000.0)).as("quantile"),
        col("__n").as("n"),
        col(valueCol).as("value"))
  }

  /** The FEW-KEY exact path (r12, VERDICT r11 #3) — bit-equal to
    * [[exactQuantiles]] behind the same surface, with no single-task
    * sort anywhere: [[exactQuantiles]]' per-key window serializes a
    * whole key into one task, so a one-domain corpus runs its entire
    * sort on one core. This twin decomposes the rank into exact pieces
    * every stage of which is parallel:
    *
    *  1. `groupBy(key, value).count()` — ties collapse map-side; the
    *     counts frame is bounded by |distinct (key, value)| (for
    *     discrete values like document lengths it is dimension-sized
    *     REGARDLESS of corpus size; for continuous values it stays
    *     corpus-sized, which the next stages tolerate);
    *  2. `repartitionByRange(key, value)` — each output partition is a
    *     value-CONTIGUOUS slice of one or more keys, and partition ids
    *     order by value within a key (the RangePartitioner contract;
    *     exactness never depends on where the sampled boundaries land);
    *  3. a window over `(key, partition)` — the local cumulative count
    *     sorts only its own slice, in parallel across slices;
    *  4. per-(key, partition) totals (a dimension-sized frame: at most
    *     shuffle-partitions rows per key) give each slice its exclusive
    *     prefix offset and each key its total `n` — window sorts over
    *     this TINY frame only;
    *  5. global rank of a value = slice offset + local cumulative; the
    *     target rank is the same integer micro-unit `ceil(q * n)`, and
    *     the answer row is the one whose rank interval
    *     `(cum - cnt, cum]` covers it — exactly one per (key, q).
    *
    * Price vs the window twin: two extra exchanges of the COUNTS frame
    * (range + hash) plus a broadcast of the offsets — the right trade
    * the moment any key is big enough to care; keep [[exactQuantiles]]
    * for many-small-keys cards where one exchange wins. Same contract:
    * `percentile_disc` semantics, nulls excluded, null keys are real
    * groups (the offsets join is null-safe), identical output schema.
    */
  def exactQuantilesScalable(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double]): DataFrame =
    scalableRank(
      df.select(col(keyCol), col(valueCol))
        .where(col(valueCol).isNotNull)
        .groupBy(col(keyCol), col(valueCol))
        .agg(count(lit(1)).as("__cnt")),
      keyCol, valueCol, qs, totalName = "n")

  /** The weighted twin's scalable form (T91 x T90): [[
    * exactQuantilesWeighted]]'s answer with [[exactQuantilesScalable]]'s
    * plan — the mass per (key, value) replaces the tie count and the
    * same range-partitioned rank decomposition runs unchanged, so a
    * one-domain token-mass percentile never serializes into one task.
    * Bit-equal to the window form (spec-pinned; q124 replays q123's
    * SQL). Same contract: integral weights, zero/null mass excluded.
    */
  def exactQuantilesWeightedScalable(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: String,
      qs: Seq[Double]): DataFrame =
    scalableRank(
      df.select(col(keyCol), col(valueCol), col(weightCol).cast("long").as("__wt"))
        .where(col(valueCol).isNotNull && col("__wt").isNotNull && col("__wt") > 0)
        .groupBy(col(keyCol), col(valueCol))
        .agg(sum(col("__wt")).as("__cnt")),
      keyCol, valueCol, qs, totalName = "total_weight")

  /** Shared range-partitioned rank decomposition over a (key, value,
    * mass) frame whose rows are unique per (key, value): stages 2-5 of
    * [[exactQuantilesScalable]]'s doc. The rank multiply widens to
    * DECIMAL(38,0) (the weighted total is token mass — past the long
    * horizon at ~35 TB/key; for the unweighted twin the widening is
    * free insurance).
    */
  private def scalableRank(
      masses: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double],
      totalName: String): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: ${qs.mkString(", ")}")
    val qMicro = qs.map(q => math.round(q * 1e6))
    require(qMicro.distinct.size == qMicro.size,
      s"quantiles collide at micro-unit precision: ${qs.mkString(", ")}")
    val ranged = masses
      .repartitionByRange(col(keyCol), col(valueCol))
      .withColumn("__part", spark_partition_id())
    val bySlice = Window.partitionBy(col(keyCol), col("__part"))
      .orderBy(col(valueCol))
    val local = ranged.withColumn("__lcum", sum(col("__cnt")).over(bySlice))
    // dimension-sized: <= shuffle-partitions rows per key; its windows
    // sort slices-per-key rows, never corpus rows
    val byKey = Window.partitionBy(col("__k"))
    val byKeyParts = byKey.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col(keyCol).as("__k"), col("__part").as("__p"))
      .agg(sum(col("__cnt")).as("__psum"))
      .select(col("__k"), col("__p"),
        coalesce(sum(col("__psum")).over(byKeyParts), lit(0L)).as("__off"),
        sum(col("__psum")).over(byKey).as("__n"))
    // the broadcast is bounded by construction at every call site: the
    // direct scalable twins carry the documented FEW-KEY contract (the
    // many-keys path is the window twin), and quantilesOfHist dispatches
    // away past DefaultMaxBroadcastKeys (r13, VERDICT r12 #1) — so the
    // offsets frame stays |few keys| x |shuffle partitions| rows here
    local
      .join(broadcast(offsets),
        col(keyCol) <=> col("__k") && col("__part") === col("__p"))
      .withColumn("__cum", col("__off") + col("__lcum"))
      .withColumn("__qm", explode(typedLit(qMicro)))
      .withColumn("__r",
        expr("(CAST(__qm AS DECIMAL(38,0)) * __n + 999999) DIV 1000000"))
      .where(col("__cum") - col("__cnt") < col("__r") && col("__r") <= col("__cum"))
      .select(
        col(keyCol),
        (col("__qm") / lit(1000000.0)).as("quantile"),
        col("__n").as(totalName),
        col(valueCol).as("value"))
  }

  /** WEIGHTED exact quantiles (T91, r12) — `percentile_disc` over a
    * weighted empirical distribution: the smallest value whose
    * cumulative WEIGHT reaches `ceil(q * total_weight)`. This is the
    * card statistic the unweighted form cannot express: "the p90
    * document length by TOKEN MASS" weights each doc by its token
    * count, so a million tiny docs stop drowning out the handful of
    * giants that actually dominate training compute.
    *
    * Weights are integral by contract (token counts, byte sizes — the
    * cast to long is explicit); rows with null values or null/<= 0
    * weights are excluded (zero mass is unselectable by definition,
    * negative mass is meaningless). The rank multiply widens to
    * DECIMAL(38,0) BEFORE `q_micro * total_weight`: total weight is a
    * TOKEN count, which passes the ~9.2e12 long-multiply horizon at
    * ~35 TB of text per key — exactly the overflow class the r11
    * dataCardDiff advice caught; the quotient lands back in a long.
    *
    * Plan shape: one (key, value) aggregate (ties collapse map-side)
    * + one window exchange — the weighted twin of [[exactQuantiles]]'
    * shape with the tie-collapse made explicit (a RANGE-frame window
    * over raw rows would give equal-value rows identical cumulative
    * weights and the rank-interval pick would fire once per tied row).
    *
    * Output: `keyCol`, `quantile`, `total_weight`, `value`.
    */
  def exactQuantilesWeighted(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: ${qs.mkString(", ")}")
    val qMicro = qs.map(q => math.round(q * 1e6))
    require(qMicro.distinct.size == qMicro.size,
      s"quantiles collide at micro-unit precision: ${qs.mkString(", ")}")
    val byKey = Window.partitionBy(col(keyCol))
    // default RANGE frame (unbounded preceding .. current) — identical
    // in Spark and DuckDB, and exact here because values are distinct
    // per key after the tie-collapse aggregate
    val cumByValue = byKey.orderBy(col(valueCol))
    df.select(col(keyCol), col(valueCol), col(weightCol).cast("long").as("__wt"))
      .where(col(valueCol).isNotNull && col("__wt").isNotNull && col("__wt") > 0)
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("__wt")).as("__w"))
      .withColumn("__cum", sum(col("__w")).over(cumByValue))
      .withColumn("__tw", sum(col("__w")).over(byKey))
      .withColumn("__qm", explode(typedLit(qMicro)))
      .withColumn("__r",
        expr("(CAST(__qm AS DECIMAL(38,0)) * __tw + 999999) DIV 1000000"))
      .where(col("__cum") - col("__w") < col("__r") && col("__r") <= col("__cum"))
      .select(
        col(keyCol),
        (col("__qm") / lit(1000000.0)).as("quantile"),
        col("__tw").as("total_weight"),
        col(valueCol).as("value"))
  }

  /** Persistable value-histogram artifact (T92, r12) — the index form
    * of exact quantiles, completing the family symmetry: every other
    * standing statistic has a fold-maintained artifact (manifest,
    * data-card index, eval grams) while percentiles still rescanned
    * the corpus. The artifact is the EXACT value distribution — one
    * `(key, value, mass)` row per distinct (key, value), mass = tie
    * count (or summed integral weight) — which is everything any exact
    * quantile ever needs, and it merges EXACTLY (masses are sums:
    * commutative, associative), so nightly maintenance is
    * [[histAppend]] at O(batch) + an artifact-sized re-aggregate, and
    * [[quantilesOfHist]] reads any quantile set off the artifact
    * without touching the corpus. Artifact size: |distinct (key,
    * value)| — dimension x value-domain for discrete values like
    * document lengths (INDEPENDENT of corpus row count), corpus-sized
    * only for continuous values (where the quantile itself is the
    * wrong artifact — persist a rounded/bucketed value instead, the
    * caller's modeling call).
    *
    * The schema is self-describing (no meta row: nothing is frozen —
    * the shingle-width class of parameter does not exist here); what
    * `mass` MEANS (rows vs token weight) is the caller's contract,
    * exactly as for [[exactQuantilesWeighted]].
    */
  def histIndex(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val massed = weightCol match {
      case None =>
        df.select(col(keyCol), col(valueCol))
          .where(col(valueCol).isNotNull)
          .groupBy(col(keyCol), col(valueCol))
          .agg(count(lit(1)).as("mass"))
      case Some(w) =>
        df.select(col(keyCol), col(valueCol), col(w).cast("long").as("__wt"))
          .where(col(valueCol).isNotNull && col("__wt").isNotNull && col("__wt") > 0)
          .groupBy(col(keyCol), col(valueCol))
          .agg(sum(col("__wt")).as("mass"))
    }
    massed
  }

  /** Grow the artifact with a batch: union + re-aggregate — exact
    * (append == rebuild over the union, spec-pinned), O(batch) + an
    * artifact-sized exchange. Null-key groups merge null-safely (the
    * groupBy treats null as a real key on both sides).
    */
  def histAppend(
      index: DataFrame,
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: Option[String] = None): DataFrame =
    histMerge(Seq(index, histIndex(df, keyCol, valueCol, weightCol)),
      keyCol, valueCol)

  /** Exact merge of histogram artifacts (shards, per-day partials):
    * masses sum. Commutative and associative, so any merge tree gives
    * the same artifact.
    */
  def histMerge(
      indexes: Seq[DataFrame],
      keyCol: String,
      valueCol: String): DataFrame = {
    require(indexes.nonEmpty, "need at least one histogram artifact")
    indexes.reduce(_.unionByName(_))
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("mass")).as("mass"))
  }

  /** The number of distinct keys up to which [[quantilesOfHist]] takes
    * the [[exactQuantilesScalable]] decomposition, whose slice-offsets
    * frame is broadcast (it is |keys| x |shuffle partitions| rows —
    * tiny under a few-key/dimension-grain artifact, a driver/executor
    * OOM at, say, 10^6 keys x 200 partitions). Past the bound the
    * dispatch switches to the per-key window twin, which at many small
    * keys is ALSO the better plan (each key's value domain sorts in
    * its own task; there is nothing to broadcast) — the IvfIndex
    * >64k-cell discipline: the decision collects at most `bound + 1`
    * keys, never an unbounded frame.
    */
  val DefaultMaxBroadcastKeys: Int = 65536

  /** Exact quantiles read OFF the artifact — the corpus is never
    * touched: the plan starts at an artifact-sized columnar scan.
    * `totalName` labels the total column for the caller's mass
    * semantics (`n` for row counts, pass `total_weight` for weighted
    * artifacts — matching the direct operators' output schemas so
    * oracles replay verbatim).
    *
    * Twin dispatch (r13, VERDICT r12 #1): up to `maxBroadcastKeys`
    * distinct keys this is [[exactQuantilesScalable]]'s
    * range-partitioned rank decomposition (no single-task stage even
    * when one key holds the whole corpus's value domain); past it —
    * where that twin's broadcast offsets frame would grow toward
    * |keys| x |partitions| rows — it is the per-key window form
    * ([[exactQuantilesWeighted]] over the masses, a no-op re-aggregate
    * on already-unique (key, value) rows), whose parallelism is the
    * key count itself. The two forms are bit-equal by the same
    * percentile_disc-by-cumulative-mass law q123/q124 share an oracle
    * for; QuantilesSpec pins equality across this boundary.
    */
  def quantilesOfHist(
      index: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double],
      totalName: String = "n",
      maxBroadcastKeys: Int = DefaultMaxBroadcastKeys): DataFrame = {
    // clamp before the +1 so maxBroadcastKeys = Int.MaxValue (a caller
    // forcing the scalable form) cannot overflow into a negative limit.
    // The probe collects at most bound+1 key values — the same order of
    // driver memory as the broadcast the caller's bound asserts is
    // safe, so raising the bound raises both consistently (a bound you
    // cannot afford to probe is a bound you cannot afford to broadcast)
    val bound = math.min(math.max(maxBroadcastKeys, 0), Int.MaxValue - 1)
    val nKeys = index.select(col(keyCol)).distinct()
      .limit(bound + 1).collect().length
    if (nKeys <= bound)
      // same malformed-artifact hygiene as the window twin (ADVICE r13
      // #4): exactQuantilesWeighted filters null values and null/<= 0
      // masses before ranking, so the scalable branch must too — the
      // bit-equality law across the dispatch boundary holds for ANY
      // artifact, not just histIndex-produced ones (whose rows already
      // satisfy the filter, making this a no-op on the honest path)
      scalableRank(
        index.select(col(keyCol), col(valueCol), col("mass").cast("long").as("__cnt"))
          .where(col(valueCol).isNotNull && col("__cnt").isNotNull && col("__cnt") > 0),
        keyCol, valueCol, qs, totalName)
    else
      exactQuantilesWeighted(index, keyCol, valueCol, "mass", qs)
        .withColumnRenamed("total_weight", totalName)
  }

  /** Fixed-width BINNED distribution artifact (T95, r13) — the
    * CONTINUOUS twin of [[histIndex]]: the exact histogram artifact is
    * dimension-sized only for discrete values (its own doc punts
    * continuous columns to "persist a rounded/bucketed value instead,
    * the caller's modeling call") and [[graft.streaming.HistGate]]'s
    * typed maxRows cap makes that punt a hard stop the moment a
    * quality score or chars-per-token ratio flows in. This operator
    * makes the bucketing call a FIRST-CLASS artifact with a typed
    * contract instead of a per-caller convention: `bin = floor(value /
    * width)` (IEEE double division + floor — bit-identical in every
    * engine, no formatting or rounding mode anywhere), one `(key, bin,
    * mass, bin_width)` row per occupied bin, masses exact counts (or
    * summed integral weights). The artifact is bounded by |keys| x
    * |occupied value range / width| REGARDLESS of corpus size or value
    * cardinality — the property the discrete artifact loses on
    * continuous columns.
    *
    * What the read gives up is bounded and stated: [[quantilesOfBinned]]
    * returns the BIN covering the exact `percentile_disc` rank, so the
    * true quantile value v* satisfies `value_low <= v* < value_high`
    * (binning is monotone, so rank `ceil(q * n)` lands in the same bin
    * under both orderings — QuantilesSpec pins the law against
    * [[exactQuantiles]] on random doubles). Error is at most `width`,
    * chosen by the caller, and the masses themselves stay EXACT — the
    * artifact also answers "what fraction of docs score below 0.5"
    * with no error at bin boundaries.
    *
    * `bin_width` rides IN the artifact (constant column — free under
    * parquet dictionary encoding at dimension scale): the width is the
    * shingle-width class of frozen parameter, so [[binnedAppend]] /
    * [[binnedMerge]] / [[quantilesOfBinned]] READ it from the artifact
    * and a batch can never silently bin on a different grid
    * (mixed-width unions fail typed instead). Values that are null,
    * NaN, or infinite are excluded like nulls everywhere in this
    * family (they have no bin on the real line; spec-pinned).
    *
    * Scale shape: identical to [[histIndex]] — one map-side-combining
    * aggregate over the batch; append is O(batch) + an artifact-sized
    * exchange; merge is any tree. Streaming: the artifact IS a hist
    * artifact over the bin column, so `HistGate` composes with a
    * pre-binned column today and the cap becomes a real bound.
    */
  def binnedIndex(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      width: Double,
      weightCol: Option[String] = None): DataFrame = {
    requireBinWidth(width)
    val v = col(valueCol).cast("double")
    val finite = v.isNotNull && !isnan(v) &&
      v =!= lit(Double.PositiveInfinity) && v =!= lit(Double.NegativeInfinity)
    val projected = df.where(finite).select(
      Seq(col(keyCol), floor(v / lit(width)).cast("long").as("bin")) ++
        weightCol.map(col): _*)
    histIndex(projected, keyCol, "bin", weightCol)
      .withColumn("bin_width", lit(width))
  }

  /** Grow the binned artifact with a batch of RAW continuous rows: the
    * grid width comes from the artifact itself (never a parameter — a
    * caller cannot drift the bin grid between nightly runs), the batch
    * bins on it, and masses merge exactly. Append == rebuild over the
    * union, spec-pinned; O(batch) + an artifact-sized exchange.
    */
  def binnedAppend(
      index: DataFrame,
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: Option[String] = None): DataFrame =
    binnedMerge(
      Seq(index, binnedIndex(df, keyCol, valueCol, binWidthOf(index), weightCol)),
      keyCol)

  /** Exact merge of binned artifacts (shards, per-day partials): masses
    * sum; any merge tree gives the same artifact. All inputs must share
    * one bin grid — a mixed-width union would silently interleave two
    * incompatible grids, so it fails typed BEFORE any aggregation.
    */
  def binnedMerge(indexes: Seq[DataFrame], keyCol: String): DataFrame = {
    require(indexes.nonEmpty, "need at least one binned artifact")
    val union = indexes.reduce(_.unionByName(_))
    binWidthOf(union) // typed single-grid check (bounded collect)
    union
      .groupBy(col(keyCol), col("bin"), col("bin_width"))
      .agg(sum(col("mass")).as("mass"))
      .select(col(keyCol), col("bin"), col("mass"), col("bin_width"))
  }

  /** Quantiles read off the binned artifact — the corpus is never
    * touched, and the answer names the bin plus its value interval:
    * `keyCol`, `quantile`, `totalName`, `bin`, `value_low`,
    * `value_high`, with the exact-quantile guarantee `value_low <= v*
    * < value_high`. Rides [[quantilesOfHist]]'s twin dispatch
    * unchanged (bounded key probe, window form past the broadcast
    * bound). The grid width is read from the artifact.
    */
  def quantilesOfBinned(
      index: DataFrame,
      keyCol: String,
      qs: Seq[Double],
      totalName: String = "n",
      maxBroadcastKeys: Int = DefaultMaxBroadcastKeys): DataFrame = {
    val width = binWidthOf(index)
    quantilesOfHist(index.select(col(keyCol), col("bin"), col("mass")),
        keyCol, "bin", qs, totalName, maxBroadcastKeys)
      .withColumnRenamed("value", "bin")
      .withColumn("value_low", col("bin").cast("double") * lit(width))
      .withColumn("value_high", (col("bin") + lit(1L)).cast("double") * lit(width))
  }

  /** The artifact's frozen grid width: exactly one distinct
    * `bin_width` value, read with a bounded collect (at most 2 rows
    * ever reach the driver — the gate-cap discipline). An EMPTY
    * artifact has no width and fails typed: build the artifact from at
    * least one finite value before appending to it (the degenerate
    * case is visible on the first read, never silent).
    */
  private def binWidthOf(index: DataFrame): Double = {
    val ws = index.select(col("bin_width")).distinct().limit(2).collect()
    require(ws.length == 1,
      if (ws.isEmpty)
        "empty binned artifact: no bin_width to read — build it from at least one finite value"
      else
        s"mixed bin grids in one artifact family: widths ${ws.map(_.get(0)).mkString(", ")}")
    val w = ws.head.getDouble(0)
    requireBinWidth(w)
    w
  }

  private def requireBinWidth(width: Double): Unit =
    require(width > 0.0 && !width.isNaN && !width.isInfinite,
      s"bin width must be a positive finite double: $width")

  /** The sketch twin for few-key / latency-bound paths:
    * `percentile_approx` under the hood, same output surface. NOT
    * cross-engine replayable (sketch internals differ by engine) —
    * QuantilesSpec pins it within `accuracy` of [[exactQuantiles]]
    * instead.
    */
  def approxQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      qs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: ${qs.mkString(", ")}")
    val filtered = df.select(col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
    filtered
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(
          col(valueCol),
          typedLit(qs),
          lit(accuracy)).as("__vals"))
      .select(
        col(keyCol), col("n"),
        posexplode(col("__vals")).as(Seq("__i", "value")))
      .select(
        col(keyCol),
        element_at(typedLit(qs), col("__i") + 1).as("quantile"),
        col("n"),
        col("value"))
  }
}
