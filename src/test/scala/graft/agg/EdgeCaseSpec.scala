package graft.agg

import graft.GraftFunctions
import graft.api
import graft.sketch.Cqf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases the 100TB pipeline will hit: empty groups, null rows/arrays,
  * arrays containing nulls, empty merge inputs, zero-row tables. */
class EdgeCaseSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }
  override def afterAll(): Unit = spark.stop()
  import spark.implicits._

  test("aggregates over zero rows yield valid empty sketches") {
    val empty = Seq.empty[(Long, Seq[Int])].toDF("k", "tokens")
    val r = empty.agg(
        api.cqf_agg(col("tokens"), 8).as("cqf"),
        api.hll_agg(col("k")).as("hll"),
        api.cms_agg(col("k")).as("cms"),
        api.bloom_agg(col("k")).as("bloom"),
        api.td_agg(col("k")).as("td"),
        api.kll_agg(col("k")).as("kll"))
      .select(
        api.cqf_total($"cqf"), api.hll_estimate($"hll"),
        api.cms_total($"cms"), api.bloom_might_contain($"bloom", lit(1L)),
        api.kll_n($"kll"))
      .head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 0L)
    assert(!r.getBoolean(3))
    assert(r.getLong(4) == 0L)
  }

  test("null rows and null array elements are skipped, not counted") {
    val schema = StructType(Seq(
      StructField("g", StringType),
      StructField("tokens", ArrayType(IntegerType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("a", Seq[Any](1, null, 2)),
      org.apache.spark.sql.Row("a", null),
      org.apache.spark.sql.Row("a", Seq[Any](2)))
    val df = spark.createDataFrame(rows, schema)
    val sk = df.groupBy($"g").agg(api.cqf_agg(col("tokens"), 8).as("sk"))
      .select(api.cqf_total($"sk"), api.cqf_count($"sk", lit(2))).head()
    assert(sk.getLong(0) == 3L) // 1, 2, 2 — nulls skipped
    assert(sk.getLong(1) == 2L)
  }

  test("merge_agg over zero sketch rows yields a valid empty sketch") {
    val empty = Seq.empty[Array[Byte]].toDF("sk")
    val out = empty.agg(api.cqf_merge_agg($"sk").as("m"))
      .select(api.cqf_total($"m")).head()
    assert(out.getLong(0) == 0L)
  }

  test("probes return null on null sketch input (null-intolerant)") {
    val df = Seq((1, Option.empty[Array[Byte]])).toDF("id", "sk")
    val r = df.select(api.cqf_count($"sk", lit(1L))).head()
    assert(r.isNullAt(0))
  }

  test("probes distinguish sparse sketches with identical shape (cache regression)") {
    // regression: three groups whose sketches have IDENTICAL length and
    // occupancy (same key count, different keys) — a sampled-fingerprint
    // probe cache collided on these (mostly-zero payloads) and returned
    // the wrong group's counts (caught at sf0.001)
    val df = Seq(
      ("g1", Seq(1, 1, 1)), ("g2", Seq(2, 2, 2)), ("g3", Seq(3, 3, 3))
    ).toDF("g", "tokens")
    val rows = df.groupBy($"g").agg(api.cqf_agg(col("tokens"), 8).as("sk"))
      .select($"g",
        api.cqf_count($"sk", lit(1)), api.cqf_count($"sk", lit(2)),
        api.cqf_count($"sk", lit(3)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("g1") == ((3L, 0L, 0L)), rows)
    assert(rows("g2") == ((0L, 3L, 0L)), rows)
    assert(rows("g3") == ((0L, 0L, 3L)), rows)
  }

  test("cqf over negative and extreme long keys stays exact") {
    val keys = Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 42L, -42L, Long.MinValue)
    val sk = keys.toDF("k").agg(api.cqf_agg($"k", 8, 64).as("sk"))
    val bytes = sk.head().getAs[Array[Byte]](0)
    val cqf = Cqf.deserialize(bytes)
    assert(cqf.count(Long.MinValue) == 2L)
    assert(cqf.count(Long.MaxValue) == 1L)
    assert(cqf.count(-1L) == 1L)
    assert(cqf.count(7L) == 0L)
    assert(cqf.keyIterator.map(_._1).toSet == keys.toSet)
  }

  test("single-element and empty token arrays") {
    val df = Seq(
      ("a", Seq(5)),
      ("a", Seq.empty[Int]),
      ("b", Seq.empty[Int])).toDF("g", "tokens")
    val out = df.groupBy($"g").agg(api.cqf_agg(col("tokens"), 8).as("sk"))
      .select($"g", api.cqf_total($"sk")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 0L))
  }
}
