package graft.ops

import graft.GraftFunctions
import graft.sketch.WangHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the span layout must equal a from-first-principles
  * replay of the concat-and-chunk rule, cover every token exactly once,
  * stay invariant under partitioning, reject corrupt counts loudly, and
  * keep the whole operator at ONE exchange. */
class PackOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pack-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private val SeqLen = 100L
  private val NShards = 4

  // ids 0..599 with token counts 0..36 cycling — includes zero-token
  // docs and doc 599 overridden to 350 tokens (spans 4+ sequences)
  private def corpus: DataFrame =
    spark.range(0, 600)
      .select($"id", when($"id" === 599, 350L).otherwise($"id" % 37).as("n"))

  private def packed: Array[(Long, Long, Long, Long, Long, Long)] =
    PackOps.packSpans(corpus, $"id", $"n", SeqLen, NShards)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  /** First-principles replay: shard by the kernel hash, order by id,
    * cumulate, chop every SeqLen tokens. */
  private def replay: Seq[(Long, Long, Long, Long, Long, Long)] = {
    val docs = (0L until 600L).map(id =>
      (id, if (id == 599) 350L else id % 37))
    docs.groupBy { case (id, _) => (WangHash.hash(id, 64) >>> 33) % NShards }
      .toSeq.flatMap { case (shard, ds) =>
        var off = 0L
        ds.sortBy(_._1).flatMap { case (id, n) =>
          val spans = if (n == 0) Seq.empty else
            ((off / SeqLen) to ((off + n - 1) / SeqLen)).map { s =>
              val from = math.max(off, s * SeqLen)
              val to = math.min(off + n, (s + 1) * SeqLen)
              (id, shard, s, from - off, from - s * SeqLen, to - from)
            }
          off += n
          spans
        }
      }
  }

  test("span layout equals the first-principles replay exactly") {
    assert(packed.toSet == replay.toSet)
    assert(packed.length == replay.length, "no duplicate span rows")
  }

  test("spans tile each document and each sequence without gaps") {
    val byDoc = packed.groupBy(_._1)
    // every non-zero doc covered 0..n in doc_from order, one seq step apart
    for ((id, spans) <- byDoc) {
      val n = if (id == 599) 350L else id % 37
      val sorted = spans.sortBy(_._4)
      assert(sorted.map(_._6).sum == n, s"doc $id spans sum to n")
      assert(sorted.head._4 == 0L, s"doc $id starts at offset 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 + a._6 == b._4, s"doc $id contiguous doc offsets")
          assert(b._3 == a._3 + 1, s"doc $id spans adjacent sequences")
        case _ =>
      }
    }
    // every sequence filled to exactly SeqLen except each shard's last
    val bySeq = packed.groupBy(s => (s._2, s._3))
    val lastSeq = packed.groupBy(_._2).map { case (sh, ss) => sh -> ss.map(_._3).max }
    for (((shard, seq), spans) <- bySeq) {
      val fill = spans.map(_._6).sum
      if (seq < lastSeq(shard)) assert(fill == SeqLen, s"seq ($shard,$seq) full")
      else assert(fill > 0 && fill <= SeqLen, s"last seq ($shard,$seq) partial")
      // within-sequence tiling: the stream is contiguous, so position 0
      // of every existing sequence is covered and spans are adjacent
      val bySeqFrom = spans.sortBy(_._5)
      assert(bySeqFrom.head._5 == 0L, s"seq ($shard,$seq) starts at 0")
      bySeqFrom.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 + a._6 == b._5, s"seq ($shard,$seq) tiles")
        case _ =>
      }
    }
  }

  test("layout is invariant under input partitioning") {
    val a = packed.toSet
    val b = PackOps.packSpans(corpus.repartition(13, $"n"), $"id", $"n",
        SeqLen, NShards)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(a == b)
  }

  test("zero-token docs pack nothing; null and negative counts reject") {
    // multiples of 37 have n = 0 (599 % 37 = 7, so the override is safe)
    assert(!packed.exists(s => s._1 % 37 == 0),
      "zero-token docs must not appear in the packed output")
    val nullDf = Seq((1L, Some(5L)), (2L, None)).toDF("id", "n")
    val e1 = intercept[Exception] {
      PackOps.packSpans(nullDf, $"id", $"n", SeqLen, NShards).collect()
    }
    assert(e1.getMessage.contains("token count"),
      s"null count must reject loudly, got: ${e1.getMessage}")
    val negDf = Seq((1L, 5L), (2L, -3L)).toDF("id", "n")
    val e2 = intercept[Exception] {
      PackOps.packSpans(negDf, $"id", $"n", SeqLen, NShards).collect()
    }
    assert(e2.getMessage.contains("token count"))
  }

  test("duplicate ids reject loudly (ambiguous packing order)") {
    // same silent-corruption class as a null count: two rows with one id
    // make every later offset in the shard order-dependent
    val dupDf = Seq((1L, 5L), (2L, 7L), (1L, 9L)).toDF("id", "n")
    val e = intercept[Exception] {
      PackOps.packSpans(dupDf, $"id", $"n", SeqLen, NShards).collect()
    }
    assert(e.getMessage.contains("duplicate id"),
      s"duplicate id must reject loudly, got: ${e.getMessage}")
  }

  test("packSummary keeps ONE exchange (groupBy reuses shard partitioning)") {
    val plan = PackOps.packSummary(corpus, $"id", $"n", SeqLen, NShards)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"))
  }

  test("summary checksums match the replay aggregate") {
    val got = PackOps.packSummary(corpus, $"id", $"n", SeqLen, NShards)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = replay.groupBy(s => (s._2, s._3)).map { case (k, ss) =>
      k -> ((ss.size.toLong, ss.map(_._6).sum, ss.map(_._1).reduce(_ ^ _)))
    }
    assert(got == want)
  }
}
