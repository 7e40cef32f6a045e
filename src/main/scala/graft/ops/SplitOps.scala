package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines —
  * assignment is a PURE FUNCTION of a caller-chosen stable key, via the
  * library's invertible Wang mix ([[graft.sketch.WangHash]], bits=64).
  *
  * Why not `randomSplit`/`sample`: their assignment depends on the seed
  * AND the physical partitioning, so a repartition, a re-read with
  * different splits, or a grown corpus silently reassigns rows between
  * train and test. Hash-of-key assignment is reproducible across runs,
  * cluster sizes, partitionings, and engines (the gate oracle replays
  * the full mix in DuckDB integer arithmetic), and appending new data
  * never moves old rows.
  *
  * At 100 TB this is a map-only operation: one expression per row, no
  * shuffle, no state — the split label is computable at scan time
  * wherever the row lands, and the Wang mix compiles into whole-stage
  * codegen (WangHashExpr.doGenCode: one static call of ~15 ALU ops), so
  * the whole decision fuses into the scan stage with no boxing.
  *
  * Null keys REJECT at runtime (assert_true) rather than silently
  * vanishing: a null key has no stable identity to split on — a
  * null-keyed row would otherwise get a NULL label and match no
  * split's filter, disappearing from the dataset without an error.
  * Filter or coalesce nulls explicitly before splitting.
  *
  * Leakage note: split on the key whose GROUPS must not straddle splits
  * — the dedup cluster representative (near-duplicate documents), the
  * user/session id (per-entity features), not the row id — otherwise
  * near-copies of a training row land in test. [[DedupOps.dedupByPairs]]
  * output composes directly: split on `component`.
  *
  * Bucketing uses the TOP 31 bits of the 64-bit hash (logical shift
  * right 33), which keeps every intermediate non-negative — the same
  * value whether the hash word is read signed (Spark Long) or unsigned
  * (the oracle's HUGEINT replay) — and avoids any low-bit structure.
  */
object SplitOps {

  /** Deterministic bucket in [0, nBuckets): (wang64(key) >>> 33) mod n.
    * The draw is 31 bits, so the modulo bias between buckets is bounded
    * by nBuckets/2^31 — under 5e-4 at the 2^20 cap (and 5e-8 for the
    * typical 100-bucket split). */
  def hashBucket(key: Column, nBuckets: Int): Column = {
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"nBuckets must be in [1, 2^20], got $nBuckets — the bucket draw " +
        "is 31 hash bits, and larger counts make the modulo bias " +
        "(nBuckets/2^31) a visible skew")
    pmod(hashHi(key, 0L), lit(nBuckets))
  }

  /** Split label by integer weights over 100 * sum-normalized buckets —
    * e.g. `Seq("train" -> 98, "valid" -> 1, "test" -> 1)`. Buckets =
    * sum of weights; each label owns a contiguous bucket range, so the
    * assignment is total (every row gets exactly one label) and stable
    * under appends. */
  def splitLabel(key: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate split labels in $weights")
    val total = weights.map(_._2).sum
    require(total <= 4096,
      s"weights sum to $total — keep the bucket space small (<= 4096); " +
        "the label lookup embeds one array slot per bucket")
    // ONE bucket evaluation + a literal label-per-bucket array lookup:
    // a when-chain over the ranges would repeat the hash expression in
    // every comparison and lean on subexpression elimination
    val labels = weights.flatMap { case (label, w) => Seq.fill(w)(lit(label)) }
    element_at(array(labels: _*),
      (hashBucket(key, total) + 1L).cast("int"))
  }

  /** Deterministic Bernoulli-by-key sample: keeps a row iff the top 31
    * hash bits fall under `fraction` of the 2^31 range. Same key → same
    * decision, forever — a reproducible subsample for eval sets or
    * profiling that never drifts as the corpus grows.
    *
    * `seed` decorrelates INDEPENDENT decisions on the same key (it XORs
    * into the key before hashing): a 10% profiling sample with seed A is
    * uniform within every split of a seed-B splitLabel; two decisions
    * with the SAME seed are nested (fraction 0.05 ⊂ fraction 0.10),
    * which is itself useful for growable samples. */
  def hashSample(key: Column, fraction: Double, seed: Long = 0L): Column = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    val threshold = math.round(fraction * (1L << 31)).toLong
    hashHi(key, seed) < lit(threshold)
  }

  /** Per-source mixture sampling — the corpus-mixing op of a training
    * recipe ("keep 100% of books, 30% of web, 5% of logs"): keep each
    * row with its source's fraction, decided by the same key hash as
    * [[hashSample]], so the mix is reproducible and append-stable.
    * Sources absent from `fractions` keep `defaultFraction`. */
  def mixtureSample(key: Column, source: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Long = 0L): Column = {
    require((defaultFraction +: fractions.values.toSeq)
        .forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0, 1], got $fractions / $defaultFraction")
    def thr(f: Double) = lit(math.round(f * (1L << 31)).toLong)
    val threshold = fractions.foldLeft(thr(defaultFraction)) {
      case (acc, (src, f)) => when(source === lit(src), thr(f)).otherwise(acc)
    }
    hashHi(key, seed) < threshold
  }

  /** Deterministic per-group cap — "at most `n` rows per source", the
    * stratified capping op of a training recipe: within each group, keep
    * the `n` rows whose seeded key hash ranks smallest (ties broken by
    * the key), so the kept set is a pure function of the (key, group)
    * assignment — reproducible across runs, partitionings, and engines,
    * and GROWABLE: raising `n` only ever adds rows (the hash order is
    * fixed), it never swaps earlier picks, and a group's picks change
    * under appends only where a new row out-ranks an old one.
    *
    * Like [[PackOps.packSpans]], `key` must be UNIQUE per row — two rows
    * sharing a key tie exactly and their relative rank (hence which
    * PAYLOAD survives at the cap boundary) is not defined.
    *
    * Scale note: ranking shuffles the WHOLE group to one task's sort —
    * for groups of millions of rows use [[capPerGroupBounded]], which
    * pre-filters by hash threshold so the per-task work is O(margin * n)
    * regardless of group size. This plain form is one exchange and
    * exact with no preconditions. */
  def capPerGroup(df: DataFrame, key: Column, group: Column, n: Long,
      seed: Long = 0L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val wOrd = Window.partitionBy(group).orderBy(hashHi(key, seed), key)
    df.withColumn("_graft_rk", row_number().over(wOrd))
      .where(col("_graft_rk") <= n)
      .drop("_graft_rk")
  }

  /** [[capPerGroup]] with a bounded shuffle — the 100 TB form. A first
    * pass counts each group (map-side partial aggregate, one tiny
    * shuffle; the per-group counts broadcast back), then rows enter the
    * rank window only if their hash falls under `margin * n / total` of
    * the hash range — expected survivors `margin * n` per group, so the
    * window sort is O(margin * n) PER TASK no matter how hot the group
    * (the plain form would sort a billion-row group in one task).
    *
    * The prefilter cannot change the answer, only starve it (Chernoff
    * lower tail: survivors are Binomial with mean margin*n, so
    * P(< n) <= e^-(margin-1-ln margin)n — under e^-1.6n at margin 4):
    * the kept rows are the n smallest hashes,
    * which survive any threshold that admits >= n rows. Two guarantees
    * close the starvation hole completely:
    *
    *  - every group's MINIMUM-hash row is admitted unconditionally (the
    *    count pass records min(hash) per group for free), so no group
    *    can vanish from the output — the min-hash row is rank 1, always
    *    part of the answer, and n = 1 therefore NEVER starves;
    *  - partial starvation (1 <= survivors < min(n, total)) is REJECTED
    *    LOUDLY in-query: a count-over-partition in the same window pass
    *    asserts every group still supplies min(n, total) rows — never a
    *    silently short sample; re-run with a larger margin if it fires
    *    (the admitted min-hash row guarantees the assert has a row to
    *    run on even when the threshold admits nothing else).
    *
    * Groups with total <= n skip the prefilter entirely (threshold =
    * full range) and keep every row.
    *
    * Group cardinality (distinct groups, not rows) must fit a broadcast
    * — true for source/domain/language-style strata; for million-way
    * groups fall back to [[capPerGroup]]. */
  def capPerGroupBounded(df: DataFrame, key: Column, group: Column,
      n: Long, seed: Long = 0L, margin: Double = 4.0): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(margin >= 1.0, s"margin must be >= 1, got $margin")
    val cols = df.columns
    val totals = df.groupBy(group.as("_graft_g"))
      .agg(count(lit(1)).as("_graft_total"),
        min(hashHi(key, seed)).as("_graft_minh"))
    val maxT = lit(1L << 31)
    // null-safe equality: a null group is a group (both groupBy above and
    // the plain form's Window.partitionBy treat it as one) — a plain ===
    // join would silently drop null-group rows instead
    val joined = df.join(broadcast(totals), group <=> col("_graft_g"))
    val threshold = when(col("_graft_total") <= n, maxT)
      .otherwise(least(maxT,
        ceil(lit(margin * n * (1L << 31).toDouble) / col("_graft_total"))
          .cast("long")))
    // min-hash row admitted unconditionally: no group can vanish, and
    // the starvation assert below always has a row to evaluate on
    val surv = joined.where(hashHi(key, seed) < threshold ||
      hashHi(key, seed) === col("_graft_minh"))
    val w = Window.partitionBy(group)
    val wOrd = w.orderBy(hashHi(key, seed), key)
    surv
      .withColumn("_graft_rk", row_number().over(wOrd))
      .withColumn("_graft_nsurv", count(lit(1)).over(w))
      .where(col("_graft_rk") <= n)
      // starvation guard: assert_true is null when the group supplied
      // enough survivors, so the filter is the identity on healthy
      // groups and a runtime error on a starved one
      .where(assert_true(
        col("_graft_nsurv") >= least(lit(n), col("_graft_total")),
        lit("SplitOps.capPerGroupBounded: prefilter starved a group " +
          "below min(n, total) — raise margin")).isNull)
      .select(cols.map(col): _*)
  }

  /** Top 31 bits of wang64(key ^ premix(seed)) — non-negative under
    * signed AND unsigned readings, so oracle replays agree bit-for-bit.
    * The seed is PRE-MIXED through the hash at plan time: raw small
    * seeds (1, 2, ...) differ in one or two low bits, and the Wang
    * mix's avalanche leaves measurable correlation between such xors
    * (~11% overlap deficit between two 25% samples, 5-sigma visible at
    * 60k keys — pinned in SplitOpsSpec); premixed constants differ in
    * ~32 random bits, where the decisions test independent. seed=0 is
    * the identity (no xor), keeping the unseeded forms bit-compatible. */
  private def hashHi(key: Column, seed: Long): Column = {
    // fail LOUDLY on null keys: assert_true returns null when the
    // predicate holds and raises otherwise, so the when() below is the
    // identity on non-null keys and a runtime error on null ones —
    // never a silent NULL decision that drops the row from every split
    val checked = when(
      assert_true(key.isNotNull,
        lit("SplitOps: null key — split/sample assignment needs a " +
          "stable non-null key; filter or coalesce nulls explicitly"))
        .isNull,
      key)
    val k = if (seed == 0L) checked
      else checked.bitwiseXOR(lit(graft.sketch.WangHash.hash(seed, 64)))
    shiftrightunsigned(graft.api.wang_hash(k), 33)
  }
}
