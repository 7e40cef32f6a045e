package graft.streaming

import graft.GraftFunctions
import graft.api
import graft.sketch.Cqf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming compatibility: the same UDAFs maintain sketches incrementally
  * over a stream, matching the batch build on the same data; custom state
  * via mapGroupsWithState holds serialized kernels. */
class StreamingSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("streaming cqf_agg in update mode == batch build") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Seq[Int])]
    val df = stream.toDF().toDF("source", "tokens")
    val query = df.groupBy($"source")
      .agg(api.cqf_agg($"tokens", 8, 64).as("sk"))
      .writeStream.format("memory").queryName("cqf_stream")
      .outputMode(OutputMode.Complete()).start()

    val batch1 = Seq(("web", Seq(1, 2, 2, 3)), ("code", Seq(5, 5)))
    val batch2 = Seq(("web", Seq(2, 7)), ("code", Seq(5)), ("web", Seq(1)))
    stream.addData(batch1: _*)
    query.processAllAvailable()
    stream.addData(batch2: _*)
    query.processAllAvailable()

    val streamed = spark.sql("SELECT source, sk FROM cqf_stream").collect()
      .map(r => r.getString(0) -> Cqf.deserialize(r.getAs[Array[Byte]](1)).keyIterator.toList)
      .toMap
    query.stop()

    val batch = (batch1 ++ batch2).toDF("source", "tokens")
      .groupBy($"source").agg(api.cqf_agg($"tokens", 8, 64).as("sk"))
      .collect()
      .map(r => r.getString(0) -> Cqf.deserialize(r.getAs[Array[Byte]](1)).keyIterator.toList)
      .toMap
    assert(streamed == batch)
    assert(streamed("web").toMap == Map(1L -> 2L, 2L -> 3L, 3L -> 1L, 7L -> 1L))
  }

  test("mapGroupsWithState maintains per-key CQF state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Array[Long])]
    val fn = StreamingSketch.cqfStateFn(8)
    val query = stream.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
      .toDF("key", "distinct", "total")
      .writeStream.format("memory").queryName("cqf_state")
      .outputMode(OutputMode.Update()).start()

    stream.addData(("a", Array(1L, 2L, 2L)), ("b", Array(9L)))
    query.processAllAvailable()
    stream.addData(("a", Array(2L, 3L, 1L << 40)))
    query.processAllAvailable()
    val rows = spark.sql("SELECT * FROM cqf_state").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    query.stop()
    // last emission per key reflects cumulative state
    assert(rows.contains(("a", 4L, 6L)), rows.mkString(",")) // incl. the 2^40 id (Long keys survive)
    assert(rows.contains(("b", 1L, 1L)))
  }

  test("dedup state carries the fp key and supersedes the winner across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Long)] // (fp, doc_id)
    val query = stream.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        StreamingSketch.dedupStateFn())
      .toDF("fp", "kept_id", "n_dups")
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode(OutputMode.Update()).start()

    stream.addData((7L, 100L), (8L, 5L))
    query.processAllAvailable()
    // batch 2: same content fp=7 arrives with a SMALLER id — the update
    // row must re-emit fp=7 with the new min-id winner so a consumer
    // keyed on fp supersedes the earlier (100, 1) row
    stream.addData((7L, 50L), (7L, 200L))
    query.processAllAvailable()
    val rows = spark.sql("SELECT * FROM dedup_state").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    query.stop()
    assert(rows.contains((7L, 100L, 1L)), rows.mkString(",")) // batch-1 emission
    assert(rows.contains((7L, 50L, 3L)), rows.mkString(","))  // superseding update
    assert(rows.contains((8L, 5L, 1L)))
    // keyed on fp, the LAST emission per fp is the batch answer
    val last = rows.groupBy(_._1).map { case (fp, rs) => fp -> rs.last }
    assert(last(7L) === ((7L, 50L, 3L)))
  }

  test("session windows: gap merge, sketch agg inside, watermark-driven append emission") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("user_id", "ts", "event_type")
    val agg = StreamingSketch.sessionWindowAgg(
      df, col("ts"), "1 hour", "30 minutes", col("user_id"),
      Seq(api.cqf_agg(col("event_type"), 8, 64).as("sk"),
        count(lit(1)).as("n_events")))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"),
        api.cqf_distinct(col("sk")).as("types"), col("n_events"))
    val query = agg.writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append()).start()

    // user 1: events at t=0 and t=29min merge (29 < gap 30); the event
    // at t=59min sits EXACTLY gap after t=29 — session_window merges on
    // touch (next <= prev end), so it STAYS in the session, the same
    // boundary rule as the batch operator's `diff > gap` split (pinned
    // here empirically: sessions are identical on exact-boundary data)
    stream.addData((1L, ts(0), "click"), (1L, ts(29), "view"),
      (1L, ts(59), "click"), (2L, ts(10), "buy"))
    query.processAllAvailable()
    // advance event time far enough that wm = max - 1h passes every
    // earlier session end (last event + gap)
    stream.addData((2L, ts(300), "view"))
    query.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sess_stream").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000, r.getLong(3), r.getLong(4)))
      .toSet
    query.stop()
    assert(rows === Set(
      (1L, 0L, 89L, 2L, 3L),   // one session: [0, 59+30), 2 types, 3 events
      (2L, 10L, 40L, 1L, 1L)), // user 2's closed session
      s"emitted sessions wrong: $rows")
    // the t=300 session is still open (wm = 300 - 60 = 240 < end 330):
    // append mode must NOT have emitted it
    assert(!rows.exists(r => r._2 == 300L))

    // agreement pin: the batch operator keeps the exact-boundary event
    // in-session too (diff > gap starts new; diff == gap stays) — the
    // two operators induce the same session partition
    val batch = Seq((1L, ts(0)), (1L, ts(29)), (1L, ts(59)))
      .toDF("user_id", "ts")
    val sessions = graft.ops.SessionOps.sessionize(batch, col("user_id"),
        col("ts"), gapSeconds = 1800L, tieBreak = col("ts"))
      .select(col("session_idx")).distinct().count()
    assert(sessions === 1L,
      "batch gap rule (diff > gap) must keep the exact-boundary event in-session")
  }

  test("timeout invocation flushes the final snapshot and expires the state") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    // cqf: stored sketch with {1:2, 9:1}
    val cqf = Cqf(8, 64)
    cqf.insert(1L); cqf.insert(1L); cqf.insert(9L)
    val s1 = TestGroupState.create[Array[Byte]](
      Optional.of(cqf.serialize()), GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out1 = StreamingSketch.cqfStateFn(8, ttl = Some("10 seconds"))(
      "k", Iterator.empty, s1)
    assert(out1 === (("k", 2L, 3L))) // final snapshot, not zeros
    assert(s1.isRemoved, "timed-out sketch state must expire, not resurrect")
    // dedup: stored (kept, n)
    val s2 = TestGroupState.create[(Long, Long)](
      Optional.of((42L, 7L)), GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out2 = StreamingSketch.dedupStateFn(ttl = Some("10 seconds"))(
      99L, Iterator.empty, s2)
    assert(out2 === ((99L, 42L, 7L)))
    assert(s2.isRemoved)
    // non-timeout invocation with a ttl registers the timeout
    val s3 = TestGroupState.create[(Long, Long)](
      Optional.empty[(Long, Long)], GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out3 = StreamingSketch.dedupStateFn(ttl = Some("10 seconds"))(
      5L, Iterator((5L, 11L)), s3)
    assert(out3 === ((5L, 11L, 1L)))
    assert(s3.getTimeoutTimestampMs.isPresent,
      "ttl must arm the processing-time timeout")
  }
}
