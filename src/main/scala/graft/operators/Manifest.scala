package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delivery manifests — the cheap integrity layer of a training-data
  * release: one row per shard/partition/domain with a row count, a byte
  * count, and two order-independent content checksums. A consumer (or
  * tomorrow's pipeline run) recomputes the manifest over what it
  * received and [[diff]]s against the published one — detecting drift,
  * truncation, duplication, or corruption WITHOUT the id-level
  * full-outer join [[DatasetDiff]] pays. The two tools are a ladder:
  * manifest diff says WHICH groups changed for the cost of two
  * dimension-sized aggregates; DatasetDiff then says which ROWS, run
  * only on the groups that mismatched.
  *
  * Checksums are commutative folds of a per-row
  * [[TextDedup.md5TokenHash]] over a canonical row string, so the
  * manifest is independent of row order, partitioning, and engine —
  * any SQL engine with `md5` replays it bit-for-bit (the q24
  * portable-hash discipline). Two folds on purpose:
  *
  *  - `xor_hash` (`bit_xor`): overflow-free, but an EVEN number of
  *    copies of the same row cancels to a no-op;
  *  - `sum_hash` (`sum`): catches exactly that duplication (every copy
  *    adds hash mass), at the price of a long-overflow bound — row
  *    hashes are < 2^32, so the sum is exact below 2^31 rows PER
  *    GROUP (~2.1 B; shard- and domain-sized groups sit far under it).
  *
  * Together with `n_rows` a change that fools one fold still moves
  * another; a collision must fool all three simultaneously.
  *
  * Canonicalization is STRICT, unlike [[DatasetDiff]]'s tolerant
  * `concat_ws` null-skip: each column is cast to string and
  * null-coalesced to a `\u0000` sentinel BEFORE joining on `\u0001`,
  * so `(null, "x")` and `("x", null)` hash differently — a null
  * shifting content across columns is exactly the corruption a
  * transit checksum exists to catch. Null GROUP keys keep Spark's
  * groupBy semantics (one manifest row for the null group) so no row
  * is silently outside the manifest. Honest limit shared with every
  * separator-joined canonicalization ([[DatasetDiff]] included): a
  * value that itself contains the `\u0001` separator can alias a
  * column boundary — fixable only by length-prefixing, which would
  * cost SQL replayability; accepted, because transit corruption does
  * not manufacture adversarial separators.
  *
  * Plan shape at 100 TB: the row hash is computed scan-side; the only
  * exchange is the dimension-sized partial-aggregated groupBy (pinned
  * by PlanSpec), and [[diff]] joins two MANIFEST-sized frames — the
  * corpus itself never moves.
  */
object Manifest {

  /** Engine-portable row hash: first-8-hex-digit md5 of the strict
    * canonical string of `cols` (null -> `\u0000` sentinel, joined on
    * `\u0001`), in [0, 2^32).
    */
  def rowHash(cols: Seq[Column]): Column =
    TextDedup.md5TokenHash(
      concat_ws("\u0001", cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** The manifest: one row per `groupCol` value with `n_rows`,
    * `n_bytes` (sum of `sizeExpr` — pass e.g. `length(col("text"))`,
    * or octet_length of a binary payload), `sum_hash` and `xor_hash`
    * over [[rowHash]] of `hashCols`.
    */
  def build(
      df: DataFrame,
      groupCol: String,
      hashCols: Seq[String],
      sizeExpr: Column): DataFrame = {
    require(hashCols.nonEmpty, "need at least one column to checksum")
    val h = rowHash(hashCols.map(col))
    df.select(col(groupCol), h.as("__h"), sizeExpr.cast("long").as("__sz"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__sz")).as("n_bytes"),
        sum(col("__h")).as("sum_hash"),
        bit_xor(col("__h")).as("xor_hash"))
  }

  /** Additive consolidation of per-batch manifests — the index
    * family's append/mergeMany discipline applied to delivery
    * accounting: every fold in the manifest is commutative AND
    * associative (counts and sums add, xor xors), so the manifest of
    * a union IS the fold-merge of the parts, exactly — no
    * approximation, nothing frozen, no corpus rescan. A nightly turn
    * manifests its batch ([[build]] over the batch alone) and merges
    * it into the standing manifest: O(batch) + a |groups|-sized
    * aggregate, where rebuilding would rescan the whole corpus.
    * Spec-pinned merge == rebuild bit-for-bit.
    *
    * Caveat inherited from the union semantics: merging manifests of
    * OVERLAPPING corpora double-counts the overlap (exactly as a
    * union would) — the dedup gates upstream exist to make batches
    * disjoint before they reach accounting.
    */
  def merge(manifests: Seq[DataFrame], groupCol: String): DataFrame = {
    require(manifests.nonEmpty, "need at least one manifest to merge")
    // by-name union: a manifest reopened from storage may present its
    // columns in any order, and a positional union would silently fold
    // n_bytes into sum_hash
    manifests.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_bytes")).as("n_bytes"),
        sum(col("sum_hash")).as("sum_hash"),
        bit_xor(col("xor_hash")).as("xor_hash"))
  }

  /** Group-level integrity report: `expected` vs `actual` manifests
    * (both [[build]] outputs over the same group column), full-outer
    * on the group — `missing` (expected only), `extra` (actual only),
    * `mismatch` (both present, any of rows/bytes/checksums differ),
    * `match`. Carries both row counts so a report reader sees the
    * size delta without a second query. Joins two manifest-sized
    * frames — never the corpora.
    */
  def diff(expected: DataFrame, actual: DataFrame, groupCol: String): DataFrame = {
    val cols = Seq("n_rows", "n_bytes", "sum_hash", "xor_hash")
    def side(df: DataFrame, tag: String) = df.select(
      col(groupCol).as(s"__g_$tag") +: cols.map(c => col(c).as(s"${c}_$tag")): _*)
    val same = cols.map(c => col(s"${c}_exp") <=> col(s"${c}_act")).reduce(_ && _)
    // null-safe group join: [[build]] gives the null group its own
    // manifest row, so the diff must compare it as ONE row too — a
    // plain equality join would split it into missing + extra
    side(expected, "exp")
      .join(side(actual, "act"), col("__g_exp") <=> col("__g_act"), "full_outer")
      .select(coalesce(col("__g_exp"), col("__g_act")).as(groupCol),
        when(col("n_rows_act").isNull, lit("missing"))
          .when(col("n_rows_exp").isNull, lit("extra"))
          .when(same, lit("match"))
          .otherwise(lit("mismatch")).as("status"),
        col("n_rows_exp"), col("n_rows_act"))
  }

  /** Recompute-and-compare in one call: the consumer-side check of a
    * published manifest against the data as received.
    */
  def check(
      expected: DataFrame,
      df: DataFrame,
      groupCol: String,
      hashCols: Seq[String],
      sizeExpr: Column): DataFrame =
    diff(expected, build(df, groupCol, hashCols, sizeExpr), groupCol)

  /** Durable delivery pair, write side: the data partitioned by the
    * group column under `path/data` plus its manifest under
    * `path/manifest`, in one call — so a release NEVER ships without
    * its integrity record, and the partition layout makes a
    * group-level re-pull cheap when [[readVerified]] rejects one.
    * The manifest doubles as the schema record for the group column:
    * [[readVerified]] pins the reopened partition column to the
    * manifest's group type, so numeric-LOOKING string groups (a
    * zero-padded shard id "01", a "1e3" bucket label) round-trip
    * verbatim instead of being rewritten by partition-directory type
    * inference.
    */
  def writeWithManifest(
      df: DataFrame,
      path: String,
      groupCol: String,
      hashCols: Seq[String],
      sizeExpr: Column): Unit = {
    df.write.mode("overwrite").partitionBy(groupCol).parquet(s"$path/data")
    build(df, groupCol, hashCols, sizeExpr)
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Durable delivery pair, read side: reopen `path/data`, recompute
    * its manifest, and FAIL TYPED if any group mismatches the
    * published one — naming the offending groups and statuses, so the
    * operator knows exactly which partitions to re-pull. The
    * verification pays one full scan of the delivery; that is the
    * contract (verify once at ingest), not a per-query tax — pass the
    * returned frame on and never re-verify. Returns the data frame
    * on success.
    */
  def readVerified(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      groupCol: String,
      hashCols: Seq[String],
      sizeExpr: Column): DataFrame = {
    val expected = spark.read.parquet(s"$path/manifest")
    // Partition-directory type inference would rewrite numeric-LOOKING
    // string group values (shard "01" -> int 1, label "1e3" -> double),
    // so diff would report an intact delivery as missing+extra — a
    // fail-closed false alarm on exactly the zero-padded shard ids
    // this class exists for. The manifest carries the writer's group
    // type; re-reading with a user-specified schema makes the raw
    // directory value parse under the DECLARED type (SPARK-26188
    // semantics: no infer-then-cast), so string groups round-trip
    // verbatim. The schema-only first read costs a footer, not a scan.
    val inferred = spark.read.parquet(s"$path/data").schema
    val groupType = expected.schema(groupCol).dataType
    val pinned = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == groupCol) f.copy(dataType = groupType) else f))
    val data = spark.read.schema(pinned).parquet(s"$path/data")
    val bad = diff(expected, build(data, groupCol, hashCols, sizeExpr), groupCol)
      .filter(col("status") =!= "match")
      .limit(20).collect()
    require(bad.isEmpty,
      s"delivery at $path failed manifest verification: " +
        bad.map(r => s"${r.get(0)}=${r.getString(1)}").mkString(", ") +
        " — re-pull the named groups")
    data
  }
}
