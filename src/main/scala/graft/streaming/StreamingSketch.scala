package graft.streaming

import graft.sketch.Cqf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the sketches.
  *
  * The TypedImperativeAggregates are streaming-compatible by construction
  * (mergeable state), so the primary path is just `readStream -> groupBy ->
  * agg(cqf_agg(...))` in update/complete mode, or watermarked windows for
  * append mode. For custom state lifecycles (e.g. emit-on-change,
  * TTL-expired sketches), [[cqfStateFn]] maintains a serialized CQF per key
  * through mapGroupsWithState.
  */
object StreamingSketch {

  /** Watermarked sliding-window sketch aggregation (append-capable). */
  def windowedAgg(df: DataFrame, ts: Column, watermarkDelay: String,
      windowDur: String, groupCols: Seq[Column], agg: Column): DataFrame = {
    // withWatermark takes a column NAME, so an arbitrary event-time
    // EXPRESSION (e.g. an NTZ column cast to TIMESTAMP) must be
    // materialized under a private name first — ts.toString of a cast
    // would parse as an unresolvable attribute
    val tsCol = "__graft_event_ts"
    df.withColumn(tsCol, ts)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDur) +: groupCols): _*)
      .agg(agg.as("sketch"))
  }

  /** Per-key CQF maintained as explicit group state: input rows are
    * (key, tokens); emits (key, distinct, total) after each update.
    * State is the serialized kernel — exactly the checkpoint format. */
  def cqfStateFn(quotientBits: Int = 10)
      : (String, Iterator[(String, Array[Long])], GroupState[Array[Byte]]) => (String, Long, Long) =
    (key, rows, state) => {
      val cqf =
        if (state.exists) Cqf.deserialize(state.get)
        else Cqf(quotientBits, 64)
      rows.foreach { case (_, keys) =>
        // keys stay Long end-to-end: narrowing 64-bit ids to Int would
        // crash under ANSI (CAST_OVERFLOW) or alias ids mod 2^32
        var i = 0
        while (i < keys.length) { cqf.insert(keys(i)); i += 1 }
      }
      state.update(cqf.serialize())
      (key, cqf.distinctCount, cqf.totalCount)
    }

  /** Convenience: run a per-group streaming sketch agg in update mode. */
  def perGroupUpdate(df: DataFrame, group: Column, agg: Column): DataFrame =
    df.groupBy(group).agg(agg.as("sketch"))

  /** Streaming exact-dedup state: per content fingerprint, track the
    * canonical representative (min doc id — deterministic regardless of
    * within-batch iterator order, unlike literal first-arrival) and the
    * copy count; emits (kept_id, n_dups) after each update. The
    * continuous-ingestion form of DedupOps.exactDedup: state is 1 id +
    * 1 long per distinct content, never the text. */
  def dedupStateFn
      : (Long, Iterator[(Long, Long)], GroupState[(Long, Long)]) => (Long, Long) =
    (_, rows, state) => {
      var kept = Long.MaxValue
      var n = 0L
      if (state.exists) { val (k, c) = state.get; kept = k; n = c }
      rows.foreach { case (_, id) =>
        n += 1
        if (id < kept) kept = id
      }
      state.update((kept, n))
      (kept, n)
    }
}
