package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic event-stream operator a
  * training/analytics pipeline runs before any per-session feature
  * extraction: consecutive events of one entity belong to the same
  * session while the gap between them stays within `gapSeconds`; a
  * larger gap starts a new session.
  *
  * Spark-first shape: one window (partition by entity, order by event
  * time) carrying a lag-difference flag and its running sum — Catalyst
  * plans ONE exchange + sort reused by both window passes, so the cost
  * at 100 TB is a single shuffle of the event table keyed by entity.
  * Order-dependent by nature, so per-entity skew cannot be salted away
  * (the standard sessionization trade-off: one hot entity's events
  * sort within one task); entities are users/devices, whose per-key
  * event counts are bounded in practice.
  *
  * Determinism: timestamps are compared in exact integer MICROSECONDS
  * (`unix_micros`), and `tieBreak` totals the order for same-microsecond
  * events — bit-identical session assignment on any engine (the gate
  * query's DuckDB oracle replays the same definition with epoch_us). */
object SessionOps {

  /** Adds `session_idx` (0-based per entity, in time order) to `df`.
    * A session breaks where the gap to the previous event EXCEEDS
    * `gapSeconds` (strictly greater — a gap of exactly `gapSeconds`
    * stays in-session).
    *
    * Skew: one adversarially hot entity (a bot, a shared device id) puts
    * its ENTIRE event history into one task — for such workloads use
    * [[sessionizeDayBounded]], which bounds per-task work to one
    * entity-day at the documented cost of splitting midnight-crossing
    * sessions. */
  def sessionize(df: DataFrame, entity: Column, ts: Column,
      gapSeconds: Long, tieBreak: Column): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    // unix_micros requires TIMESTAMP; parquet event times are usually
    // TIMESTAMP_NTZ. The cast applies the session zone, but gaps and
    // spans are DIFFERENCES, so a fixed offset cancels (run under a
    // DST-free session zone — Verify pins UTC — for exact parity with
    // naive-timestamp oracles)
    val us = unix_micros(ts.cast("timestamp"))
    // null event times are dropped, not ordered: engines disagree on
    // null placement (Spark orders NULLS FIRST, DuckDB NULLS LAST), so
    // keeping them would silently break the cross-engine-identical
    // session assignment this operator promises
    val defined = df.where(ts.isNotNull)
    val w = Window.partitionBy(entity).orderBy(us.asc, tieBreak.asc)
    val prev = lag(us, 1).over(w)
    val newSession =
      when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    defined.withColumn("__session_new", newSession)
      .withColumn("session_idx",
        sum(col("__session_new")).over(w) - 1L)
      .drop("__session_new")
  }

  /** Skew-bounded sessionization for ADVERSARIAL keys: windows partition
    * by (entity, UTC day) instead of entity alone, so a hot entity's
    * history spreads across one task per day — per-task work is bounded
    * by one entity-day however hot the key, which is the guarantee plain
    * [[sessionize]] cannot give (order-dependence makes per-key salting
    * impossible there).
    *
    * The documented trade-off: a session crossing a day boundary SPLITS
    * into one session per day (the first event after midnight starts a
    * new session even when its gap is within `gapSeconds`). For human
    * entities with night gaps the two operators agree almost everywhere;
    * for bots that never pause, this variant is the one that finishes.
    * Day bucketing is exact integer arithmetic on epoch microseconds
    * (floor-division, correct for pre-1970 timestamps too) — engine-
    * agnostic like the rest of the module.
    *
    * Output: `session_day` (epoch days) and `session_idx` (0-based per
    * (entity, day)); a global session key is (entity, session_day,
    * session_idx). */
  def sessionizeDayBounded(df: DataFrame, entity: Column, ts: Column,
      gapSeconds: Long, tieBreak: Column): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    require(gapSeconds < 86400L,
      s"gapSeconds must be under a day for day-bounded sessions, got $gapSeconds")
    val us = unix_micros(ts.cast("timestamp"))
    // floor division (pmod idiom): integer `div` truncates toward zero,
    // which would round pre-epoch timestamps into the WRONG day, so the
    // positive remainder is subtracted first. Integral `div` (not `/`,
    // which is double Divide + cast — exact only below 2^53) keeps the
    // day computation structurally exact over the full epoch-us range.
    val day = call_function("div",
      us - pmod(us, lit(86400000000L)), lit(86400000000L))
    // materialize the day ONCE and partition both window passes by the
    // materialized COLUMN: partitioning by the raw expression makes each
    // Window node project its own fresh partition attribute, which
    // EnsureRequirements cannot prove equal — the plan then pays one
    // exchange+sort PER PASS (and a third for any downstream groupBy on
    // the same keys) instead of sharing one, tripling the shuffled bytes
    // of the operator's only shuffle
    val defined = df.where(ts.isNotNull).withColumn("session_day", day)
    val w = Window.partitionBy(entity, col("session_day"))
      .orderBy(us.asc, tieBreak.asc)
    val prev = lag(us, 1).over(w)
    val newSession =
      when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    defined
      .withColumn("__session_new", newSession)
      .withColumn("session_idx", sum(col("__session_new")).over(w) - 1L)
      .drop("__session_new")
  }

  /** Per-entity session statistics: session count, total events, the
    * largest session's event count, and the longest session span in
    * microseconds. One extra aggregation over [[sessionize]]'s output. */
  def sessionStats(df: DataFrame, entity: Column, ts: Column,
      gapSeconds: Long, tieBreak: Column): DataFrame = {
    val sess = sessionize(df, entity, ts, gapSeconds, tieBreak)
      .select(entity.as("entity"),
        unix_micros(ts.cast("timestamp")).as("us"), col("session_idx"))
    sess.groupBy(col("entity"), col("session_idx"))
      .agg(count(lit(1)).as("n_ev"), (max(col("us")) - min(col("us"))).as("span_us"))
      .groupBy(col("entity"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_session_events"),
        max(col("span_us")).as("max_session_span_us"))
  }
}
