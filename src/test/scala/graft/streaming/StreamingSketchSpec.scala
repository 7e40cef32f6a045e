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
}
