package graft.ops

import graft.GraftFunctions
import graft.api
import graft.ops.ProfileOps.ProfileSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ProfileOps behavior: one-pass profiles report exact shape stats,
  * in-bound estimator sketches, and merge losslessly across splits. */
class ProfileOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-profile-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private val spec = ProfileSpec(
    idCols = Seq("doc_id"), numCols = Seq("n_chars"), catCols = Seq("lang"))

  test("one-pass profile: exact fields match direct aggregation") {
    val p = ProfileOps.profile(docs, spec).collect()(0)
    val d = docs.agg(
      count(lit(1)), count(col("n_chars")), count(col("lang")),
      min(col("n_chars")), max(col("n_chars"))).collect()(0)
    assert(p.getAs[Long]("n_rows") === d.getLong(0))
    assert(p.getAs[Long]("n_chars_nulls") === d.getLong(0) - d.getLong(1))
    assert(p.getAs[Long]("lang_nulls") === d.getLong(0) - d.getLong(2))
    assert(p.getAs[Long]("n_chars_min") === d.getLong(3))
    assert(p.getAs[Long]("n_chars_max") === d.getLong(4))
  }

  test("profile readouts: hll within 5%, ss exact below k, kll rank in bound") {
    val p = ProfileOps.profile(docs, spec).localCheckpoint()
    val exactDist = docs.agg(countDistinct(col("doc_id"))).collect()(0).getLong(0)
    val est = p.select(api.hll_estimate(col("doc_id_hll"))).collect()(0).getLong(0)
    assert(math.abs(est - exactDist) <= math.max(3L, (exactDist * 5 + 99) / 100),
      s"hll estimate $est vs exact $exactDist")
    // lang cardinality << ssK=256: the summary must be exact per value
    val exactLang = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = p.select(col("lang_ss")).collect()(0).getAs[Array[Byte]](0)
    val fi = graft.sketch.FrequentItems.deserialize(sk)
    assert(fi.offset === 0L, "cardinality below k must never evict")
    exactLang.foreach { case (lang, cnt) =>
      assert(fi.estimateBytes(lang.getBytes("UTF-8")) === cnt,
        s"ss estimate for $lang")
    }
    // kll p50: rank of the reported value within 3% of the median
    val e50 = p.select(api.kll_quantile(col("n_chars_kll"), lit(0.5)))
      .collect()(0).getDouble(0)
    val Array(n, r50) = docs.agg(
      count(col("n_chars")), sum(when(col("n_chars") <= e50, 1L).otherwise(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(math.abs(r50 * 100L - n * 50L) <= n * 3L, s"p50 rank $r50 of $n")
  }

  test("split profiles merge to the whole-table profile without rescanning") {
    val whole = ProfileOps.profile(docs, spec).localCheckpoint()
    val parts = (0 until 3).map(i =>
      ProfileOps.profile(docs.where(pmod(col("doc_id"), lit(3)) === i), spec))
    val merged = ProfileOps.merge(parts.reduce(_ unionAll _), spec)
      .localCheckpoint()
    def longs(df: DataFrame) = df.select(col("n_rows"),
      col("n_chars_nulls"), col("lang_nulls"),
      col("n_chars_min"), col("n_chars_max")).collect()(0).toSeq
    assert(longs(merged) === longs(whole))
    // HLL register-max merge is exact: estimates must agree exactly
    def hllEst(df: DataFrame) =
      df.select(api.hll_estimate(col("doc_id_hll"))).collect()(0).getLong(0)
    assert(hllEst(merged) === hllEst(whole))
    // ss below capacity: merged counts stay exact per value
    val exactLang = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fi = graft.sketch.FrequentItems.deserialize(
      merged.select(col("lang_ss")).collect()(0).getAs[Array[Byte]](0))
    assert(fi.offset === 0L)
    exactLang.foreach { case (lang, cnt) =>
      assert(fi.estimateBytes(lang.getBytes("UTF-8")) === cnt)
    }
    // kll merged quantile still rank-bounded on the whole table
    val e50 = merged.select(api.kll_quantile(col("n_chars_kll"), lit(0.5)))
      .collect()(0).getDouble(0)
    val Array(n, r50) = docs.agg(
      count(col("n_chars")), sum(when(col("n_chars") <= e50, 1L).otherwise(0L)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(math.abs(r50 * 100L - n * 50L) <= n * 3L, s"merged p50 rank $r50 of $n")
  }

  test("null columns are counted, not aggregated") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "en"), (2L, null, "de"), (3L, 30L, null),
      (4L, null, null), (5L, 50L, "en"))
      .toDF("id", "size", "tag")
    val p = ProfileOps.profile(df, ProfileSpec(
      idCols = Seq("id"), numCols = Seq("size"), catCols = Seq("tag")))
      .collect()(0)
    assert(p.getAs[Long]("n_rows") === 5L)
    assert(p.getAs[Long]("size_nulls") === 2L)
    assert(p.getAs[Long]("tag_nulls") === 2L)
    assert(p.getAs[Long]("size_min") === 10L)
    assert(p.getAs[Long]("size_max") === 50L)
    val fi = graft.sketch.FrequentItems.deserialize(
      p.getAs[Array[Byte]]("tag_ss"))
    assert(fi.estimateBytes("en".getBytes("UTF-8")) === 2L)
    assert(fi.estimateBytes("de".getBytes("UTF-8")) === 1L)
  }

  test("nested struct fields profile and MERGE under flattened output names") {
    import spark.implicits._
    // merge() re-resolves profile outputs by name: an output literally
    // named "payload.score_nulls" would parse as struct access and fail —
    // nested specs must flatten to payload_score_* in BOTH directions
    val df = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "a"), (4L, 40L, "c"))
      .toDF("id", "score", "tag")
      .select(col("id"), struct(col("score"), col("tag")).as("payload"))
    val spec = ProfileSpec(idCols = Seq("id"), numCols = Seq("payload.score"),
      catCols = Seq("payload.tag"))
    val whole = ProfileOps.profile(df, spec)
    val cols = whole.columns.toSet
    assert(cols.contains("payload_score_min") && cols.contains("payload_tag_ss"),
      s"flattened names missing: $cols")
    val parts = (0 until 2).map(i =>
      ProfileOps.profile(df.where(pmod(col("id"), lit(2)) === i), spec))
    val merged = ProfileOps.merge(parts.reduce(_ unionAll _), spec).collect()(0)
    assert(merged.getAs[Long]("n_rows") === 4L)
    assert(merged.getAs[Long]("payload_score_min") === 10L)
    assert(merged.getAs[Long]("payload_score_max") === 40L)
    val fi = graft.sketch.FrequentItems.deserialize(
      merged.getAs[Array[Byte]]("payload_tag_ss"))
    assert(fi.estimateBytes("a".getBytes("UTF-8")) === 2L)
    // "payload.score" and "payload_score" would collide post-flattening
    intercept[IllegalArgumentException] {
      ProfileSpec(numCols = Seq("payload.score", "payload_score"))
    }
  }
}
