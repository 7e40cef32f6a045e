package graft.ops

import graft.api
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling for large-scale training-data pipelines:
  * the pre-ingest data-quality summary (shape stats + a sketch per
  * profiled column) computed in a SINGLE scan of the fact table.
  *
  * Design for 100 TB:
  *  - ONE aggregation pass, no matter how many columns are profiled —
  *    every per-column summary (exact count/nulls/min/max, HLL distinct,
  *    KLL quantiles, frequent-items top values) is one more aggregate
  *    expression in the same ObjectHashAggregate stage, so profiling N
  *    columns costs one table scan plus O(N) small mergeable states.
  *  - The output row carries the SKETCHES, not just readouts: profiles
  *    are therefore mergeable — union daily/partition profile rows and
  *    re-aggregate with `hll_merge_agg`/`kll_merge_agg`/`ss_merge_agg`
  *    to get the exact profile of the union without rescanning (see
  *    [[merge]]). Readouts (`hll_estimate`, `kll_quantile`, `ss_topk`)
  *    are derived from the sketch columns by the caller.
  *  - No distinct-Expand: exact `countDistinct` is deliberately NOT
  *    offered here — mixed into a sketch aggregation it makes stage 1
  *    group by (key) and allocate a sketch buffer per distinct key
  *    (docs/ROUND3_NOTES.md lesson 23). The HLL column is the scalable
  *    distinct answer; callers wanting exactness run their own
  *    single-purpose pass.
  *
  * Reference analog: the stats-getter surface of the reference's filter
  * (/root/reference/src/cqf/u64_cqf.rs:101-107) generalized to whole
  * tables; the `table_profile` gate query oracles one instantiation.
  */
object ProfileOps {

  /** Which columns get which summaries. A column may appear in several
    * roles (e.g. numeric + id). Sketch sizing: `hllP` = HLL precision
    * (2^p registers), `kllK` = KLL compactor width, `ssK` = number of
    * Misra-Gries counters (top values are EXACT while a column's
    * cardinality stays below `ssK`). */
  final case class ProfileSpec(
      idCols: Seq[String] = Nil,
      numCols: Seq[String] = Nil,
      catCols: Seq[String] = Nil,
      hllP: Int = 14,
      kllK: Int = 256,
      ssK: Int = 256) {
    require(idCols.nonEmpty || numCols.nonEmpty || catCols.nonEmpty,
      "profile spec names no columns")
    require(allCols.map(ProfileOps.stem).distinct.size == allCols.size,
      s"profiled columns collide after dot->underscore flattening: $allCols")
    def allCols: Seq[String] = (idCols ++ numCols ++ catCols).distinct
  }

  /** Output-name stem for a profiled column: nested-field dots flatten to
    * underscores. profile() CAN alias an output literally "payload.score_
    * nulls", but merge() could never re-resolve it — col() would parse the
    * dot as struct access on the profile row — so the flat name is the
    * contract for both. */
  private def stem(c: String): String = c.replace('.', '_')

  /** Single-row profile frame: `n_rows` plus, per profiled column,
    * `<c>_nulls` (every role), `<c>_min`/`<c>_max`/`<c>_kll` (numeric),
    * `<c>_hll` (id), `<c>_ss` (categorical). One fact scan. */
  def profile(df: DataFrame, spec: ProfileSpec): DataFrame = {
    graft.GraftFunctions.registerAll(df.sparkSession)
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
      spec.allCols.map(c =>
        (count(lit(1)) - count(col(c))).as(s"${stem(c)}_nulls")) ++
      spec.numCols.flatMap(c => Seq(
        min(col(c)).as(s"${stem(c)}_min"),
        max(col(c)).as(s"${stem(c)}_max"),
        api.kll_agg(col(c), spec.kllK).as(s"${stem(c)}_kll"))) ++
      spec.idCols.map(c => api.hll_agg(col(c), spec.hllP).as(s"${stem(c)}_hll")) ++
      spec.catCols.map(c => api.ss_agg(col(c), spec.ssK).as(s"${stem(c)}_ss"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Merge many profile rows (same spec) into one — the union profile
    * without rescanning any data. Exact stats merge exactly (sums,
    * min/max); sketches merge through their `*_merge_agg` aggregates
    * (associative and commutative, any grouping of partial profiles
    * gives the same answer). */
  def merge(profiles: DataFrame, spec: ProfileSpec): DataFrame = {
    graft.GraftFunctions.registerAll(profiles.sparkSession)
    val aggs =
      Seq(sum(col("n_rows")).as("n_rows")) ++
      spec.allCols.map(c => sum(col(s"${stem(c)}_nulls")).as(s"${stem(c)}_nulls")) ++
      spec.numCols.flatMap(c => Seq(
        min(col(s"${stem(c)}_min")).as(s"${stem(c)}_min"),
        max(col(s"${stem(c)}_max")).as(s"${stem(c)}_max"),
        api.kll_merge_agg(col(s"${stem(c)}_kll")).as(s"${stem(c)}_kll"))) ++
      spec.idCols.map(c =>
        api.hll_merge_agg(col(s"${stem(c)}_hll")).as(s"${stem(c)}_hll")) ++
      spec.catCols.map(c =>
        api.ss_merge_agg(col(s"${stem(c)}_ss")).as(s"${stem(c)}_ss"))
    profiles.agg(aggs.head, aggs.tail: _*)
  }
}
