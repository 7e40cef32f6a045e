package graft.streaming

import graft.sketch.Cqf
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured Streaming surface for the sketches.
  *
  * The TypedImperativeAggregates are streaming-compatible by construction
  * (mergeable state), so the primary path is just `readStream -> groupBy ->
  * agg(cqf_agg(...))` in update/complete mode, or watermarked windows for
  * append mode. For custom state lifecycles (emit-on-change, TTL-expired
  * sketches), [[cqfStateFn]] maintains a serialized CQF per key through
  * mapGroupsWithState — pass a `ttl` AND configure the matching
  * `GroupStateTimeout` on the mapGroupsWithState call to expire idle keys.
  */
object StreamingSketch {

  /** Watermarked windowed sketch aggregation (append-capable). Tumbling
    * by default; pass `slideDur` for overlapping sliding windows (each
    * event then lands in windowDur/slideDur windows). */
  def windowedAgg(df: DataFrame, ts: Column, watermarkDelay: String,
      windowDur: String, groupCols: Seq[Column], agg: Column,
      slideDur: Option[String] = None): DataFrame = {
    // withWatermark takes a column NAME, so an arbitrary event-time
    // EXPRESSION (e.g. an NTZ column cast to TIMESTAMP) must be
    // materialized under a private name first — ts.toString of a cast
    // would parse as an unresolvable attribute
    val tsCol = "__graft_event_ts"
    val win = slideDur.fold(window(col(tsCol), windowDur))(
      s => window(col(tsCol), windowDur, s))
    df.withColumn(tsCol, ts)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((win +: groupCols): _*)
      .agg(agg.as("sketch"))
  }

  /** Watermarked SESSION-window aggregation (append-capable): the
    * streaming form of [[graft.ops.SessionOps.sessionize]]. Events for
    * the same entity within `gap` of each other merge into one session
    * ([start = first event, end = last event + gap)); the engine keeps
    * one state row per OPEN session and the watermark both bounds that
    * state and drives emission — a session is emitted exactly once, when
    * the watermark passes its end, so the shape survives an unbounded
    * stream (complete mode would re-emit all history per trigger).
    *
    * Boundary semantics MATCH the batch operator: session_window merges
    * on touch (an event exactly `gap` after its predecessor extends the
    * session), the same rule as the batch `diff > gap` split — so the
    * two operators induce identical session partitions on any input,
    * exact-boundary data included (StreamingSketchSpec pins this with
    * an empirical agreement test). */
  def sessionWindowAgg(df: DataFrame, ts: Column, watermarkDelay: String,
      gap: String, entity: Column, aggs: Seq[Column]): DataFrame = {
    val tsCol = "__graft_event_ts"
    df.withColumn(tsCol, ts)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), entity)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-key CQF maintained as explicit group state: input rows are
    * (key, tokens); emits (key, distinct, total) after each update.
    * State is the serialized kernel — exactly the checkpoint format.
    * With `ttl` set (and a ProcessingTimeTimeout configured on the
    * mapGroupsWithState call), a key idle past the TTL fires a timeout
    * invocation: the final snapshot is emitted once more and the state
    * removed, bounding state size on unbounded key spaces. */
  def cqfStateFn(quotientBits: Int = 10, ttl: Option[String] = None)
      : (String, Iterator[(String, Array[Long])], GroupState[Array[Byte]]) => (String, Long, Long) =
    (key, rows, state) => {
      if (state.hasTimedOut) {
        // timeout invocation: empty iterator, state guaranteed present —
        // flush the final snapshot and expire (updating instead would
        // resurrect the state the engine just declared idle)
        val (d, t) = Cqf.deserialize(state.get).distinctAndTotal
        state.remove()
        (key, d, t)
      } else {
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
        // setTimeoutDuration requires a timeout-configured call site —
        // a ttl without one fails loudly here rather than silently
        // never expiring anything
        ttl.foreach(state.setTimeoutDuration)
        val (d, t) = cqf.distinctAndTotal
        (key, d, t)
      }
    }

  /** Streaming exact-dedup state: per content fingerprint, track the
    * canonical representative and the copy count; emits
    * (fp, kept_id, n_dups) after each update — the fingerprint rides
    * along so multi-batch update-mode rows supersede each other by key
    * downstream. The winner is min(doc_id) — the same canonical-
    * representative convention as the batch DedupOps.exactDedup, chosen
    * because it is batch-order-independent (literal first-arrival
    * depends on how a reprocessed stream happens to batch). NOTE the
    * flip side: a later batch carrying a smaller id re-emits the same
    * fp with a NEW kept_id, superseding the earlier row — consumers
    * must key on fp, not treat kept ids as append-only. State is 1 id +
    * 1 count per distinct content, never the text; with `ttl` set (and
    * a ProcessingTimeTimeout configured), idle fingerprints flush and
    * expire — after which a re-arriving duplicate is re-admitted, the
    * standard bounded-state dedup trade-off. */
  def dedupStateFn(ttl: Option[String] = None)
      : (Long, Iterator[(Long, Long)], GroupState[(Long, Long)]) => (Long, Long, Long) =
    (key, rows, state) => {
      if (state.hasTimedOut) {
        val (k, c) = state.get
        state.remove()
        (key, k, c)
      } else {
        var kept = Long.MaxValue
        var n = 0L
        if (state.exists) { val (k, c) = state.get; kept = k; n = c }
        rows.foreach { case (_, id) =>
          n += 1
          if (id < kept) kept = id
        }
        state.update((kept, n))
        ttl.foreach(state.setTimeoutDuration)
        (key, kept, n)
      }
    }
}
