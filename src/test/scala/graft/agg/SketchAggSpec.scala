package graft.agg

import graft.GraftFunctions
import graft.api
import graft.sketch._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Spark end-to-end tests (SURVEY.md §5.2-3): sketch aggregates over a
  * deterministic synthesized token table; results must equal kernel-built
  * results, be invariant to repartitioning (merge-order invariance), and
  * the explode-free array update must equal explode-based exact SQL.
  */
class SketchAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  /** Deterministic F1-shaped token table (FIXTURES.md): zipf-ish tokens,
    * skewed source. */
  private def tokenDf(nDocs: Int, seed: Long = 42L): DataFrame = {
    val rnd = new Random(seed)
    val sources = Array("web", "books", "code", "wiki")
    val rows = (0 until nDocs).map { i =>
      val src = if (rnd.nextDouble() < 0.5) "web" else sources(1 + rnd.nextInt(3))
      val n = 1 + rnd.nextInt(64)
      val toks = Array.fill(n)((math.pow(rnd.nextDouble(), 2.5) * 5000).toInt)
      (f"doc_$i%09d", toks, n, src)
    }
    rows.toDF("doc_id", "tokens", "n_tok", "source")
  }

  test("cqf_agg over tokens array: exact counts, explode-free == explode SQL") {
    val df = tokenDf(2000).cache()
    df.createOrReplaceTempView("seqs")
    val skDf = df.groupBy($"source".as("src"))
      .agg(api.cqf_agg(col("tokens"), 10, 64).as("sk"))
    import spark.implicits._
    val sketches = skDf.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    // exact oracle via explode
    val oracle = spark.sql(
      """SELECT source, token, count(*) AS c
        |FROM (SELECT source, explode(tokens) AS token FROM seqs)
        |GROUP BY source, token""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    oracle.foreach { case ((src, tok), c) =>
      val cqf = Cqf.deserialize(sketches(src))
      assert(cqf.count(tok.toLong) == c, s"source=$src token=$tok")
    }
    // probe expression path
    val probed = skDf.select($"src", api.cqf_count($"sk", lit(7)).as("c7")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    probed.foreach { case (src, c7) =>
      assert(c7 == oracle.getOrElse((src, 7), 0L), s"cqf_count probe $src")
    }
  }

  test("repartitioning does not change any sketch-derived result") {
    val df = tokenDf(1500)
    def results(d: DataFrame): Map[String, (Long, Long, Long)] =
      d.groupBy($"source").agg(
          api.cqf_agg(col("tokens"), 8).as("cqf"),
          api.hll_agg(col("tokens"), 12).as("hll"),
          api.cms_agg(col("tokens"), 5, 1024).as("cms"))
        .select($"source",
          api.cqf_count($"cqf", lit(3)),
          api.hll_estimate($"hll"),
          api.cms_estimate($"cms", lit(3)))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val base = results(df.repartition(1))
    for (n <- Seq(3, 7, 16)) {
      assert(results(df.repartition(n)) == base, s"repartition($n) changed results")
    }
  }

  test("two-stage salted build: cqf_agg partials + cqf_merge_agg == direct") {
    val df = tokenDf(1200)
    val direct = df.groupBy($"source")
      .agg(api.cqf_agg(col("tokens"), 8).as("sk"))
      .select($"source", api.cqf_total($"sk").as("t"), api.cqf_distinct($"sk").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twoStage = df
      .withColumn("salt", pmod(hash($"doc_id"), lit(8)))
      .groupBy($"source", $"salt")
      .agg(api.cqf_agg(col("tokens"), 8).as("partial"))
      .groupBy($"source")
      .agg(api.cqf_merge_agg($"partial").as("sk"))
      .select($"source", api.cqf_total($"sk").as("t"), api.cqf_distinct($"sk").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoStage == direct)
  }

  test("hll_agg estimate within bound of true distinct") {
    val df = tokenDf(3000)
    df.createOrReplaceTempView("seqs2")
    val truth = spark.sql(
      """SELECT source, count(DISTINCT token) AS d
        |FROM (SELECT source, explode(tokens) AS token FROM seqs2) GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = df.groupBy($"source").agg(api.hll_agg(col("tokens"), 14).as("sk"))
      .select($"source", api.hll_estimate($"sk")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (src, d) =>
      val e = est(src)
      assert(math.abs(e - d).toDouble / d <= 3 * 1.04 / math.sqrt(1 << 14),
        s"source=$src true=$d est=$e")
    }
  }

  test("td/kll quantiles over a double column within rank tolerance") {
    val rnd = new Random(1)
    val values = Seq.fill(20000)(math.exp(rnd.nextGaussian()))
    val df = values.toDF("v")
    val row = df.agg(
        api.td_agg(col("v"), 100.0).as("td"),
        api.kll_agg(col("v"), 200).as("kll"))
      .select(
        api.td_quantile($"td", lit(0.5)),
        api.kll_quantile($"kll", lit(0.5)),
        api.kll_n($"kll"))
      .head()
    val sorted = values.sorted
    def rankOf(x: Double): Double = sorted.count(_ <= x).toDouble / sorted.size
    assert(math.abs(rankOf(row.getDouble(0)) - 0.5) < 0.03, s"td median ${row.getDouble(0)}")
    assert(math.abs(rankOf(row.getDouble(1)) - 0.5) < 0.03, s"kll median ${row.getDouble(1)}")
    assert(row.getLong(2) == values.size)
  }

  test("bloom_agg: no false negatives through SQL surface") {
    val df = (1 to 5000).map(i => i.toLong * 7).toDF("k")
    val sk = df.agg(api.bloom_agg(col("k"), 1 << 17, 5).as("b"))
    val joined = df.crossJoin(sk)
      .select(api.bloom_might_contain($"b", $"k").as("hit"))
      .agg(sum(when($"hit", 0).otherwise(1)))
      .head().getLong(0)
    assert(joined == 0L, "bloom false negative")
  }

  test("cqf_items generator enumerates (hash,key,count) matching exact counts") {
    val df = tokenDf(800)
    df.createOrReplaceTempView("seqs3")
    val sk = df.groupBy($"source").agg(api.cqf_agg(col("tokens"), 10).as("sk"))
    sk.createOrReplaceTempView("sks")
    val items = spark.sql(
      """SELECT source, key, count FROM sks
        |LATERAL VIEW cqf_items(sk) t AS hash, key, count""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oracle = spark.sql(
      """SELECT source, token, count(*) AS c
        |FROM (SELECT source, explode(tokens) AS token FROM seqs3)
        |GROUP BY source, token""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    assert(items == oracle)
  }

  test("string keys: cqf/hll/cms/bloom accept strings consistently") {
    val df = Seq.tabulate(3000)(i => s"user_${i % 400}").toDF("u")
    val row = df.agg(
        api.cqf_agg(col("u"), 10).as("cqf"),
        api.hll_agg(col("u"), 12).as("hll"),
        api.cms_agg(col("u"), 5, 1024).as("cms"),
        api.bloom_agg(col("u")).as("bloom"))
      .select(
        api.cqf_count($"cqf", lit("user_3")),
        api.hll_estimate($"hll"),
        api.cms_estimate($"cms", lit("user_3")),
        api.bloom_might_contain($"bloom", lit("user_3")),
        api.bloom_might_contain($"bloom", lit("nope_xyz")))
      .head()
    assert(row.getLong(0) == 3000 / 400 + (if (3 < 3000 % 400) 1 else 0))
    assert(math.abs(row.getLong(1) - 400).toDouble / 400 < 0.1)
    assert(row.getLong(2) >= row.getLong(0))
    assert(row.getBoolean(3))
    assert(!row.getBoolean(4)) // overwhelmingly likely at this fill
  }

  test("sketch set ops through SQL: union/intersect/diff") {
    val a = (1 to 100).map(_.toLong).toDF("k").agg(api.cqf_agg(col("k"), 8).as("s"))
    val b = (51 to 150).map(_.toLong).toDF("k").agg(api.cqf_agg(col("k"), 8).as("s"))
    val both = a.crossJoin(b.withColumnRenamed("s", "s2"))
    val r = both.select(
      api.cqf_total(api.cqf_union($"s", $"s2")),
      api.cqf_distinct(api.cqf_intersect($"s", $"s2")),
      api.cqf_distinct(api.cqf_diff($"s", $"s2"))).head()
    assert(r.getLong(0) == 200)
    assert(r.getLong(1) == 50)
    assert(r.getLong(2) == 50)
  }

  test("cqf_set_count overwrites / inserts through the SQL surface") {
    val sk = (1 to 10).map(_.toLong).toDF("k").agg(api.cqf_agg(col("k"), 8).as("s"))
    val r = sk.select(
      api.cqf_count(api.cqf_set_count($"s", lit(5L), lit(42)), lit(5L)),
      api.cqf_count(api.cqf_set_count($"s", lit(999L), lit(7)), lit(999L)),
      api.cqf_total(api.cqf_set_count($"s", lit(5L), lit(42)))).head()
    assert(r.getLong(0) == 42L)
    assert(r.getLong(1) == 7L)
    assert(r.getLong(2) == 9 + 42L)
  }

  test("sketch aggregates work as window functions") {
    val df = tokenDf(300)
    val w = Window.partitionBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rows = df.select($"source", $"doc_id",
        api.hll_estimate(api.hll_agg(col("tokens"), 12).over(w)).as("d"))
      .collect()
    val bySource = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    // every row in a source sees the same whole-partition estimate
    bySource.foreach { case (src, ds) => assert(ds.size == 1, s"source $src") }
  }

  test("grouping sets / rollup compose with sketch aggregates") {
    val df = tokenDf(600)
    val rows = df.rollup($"source").agg(api.hll_agg(col("tokens"), 12).as("sk"))
      .select($"source", api.hll_estimate($"sk").as("d"))
      .collect()
    val bySource = rows.filter(_.get(0) != null).map(_.getLong(1))
    val total = rows.filter(_.get(0) == null).head.getLong(1)
    assert(total <= bySource.sum)
    assert(total > 0)
  }

  test("ss_agg over tokens array: shuffle-invariant bounds; SQL surface; two-stage merge") {
    val df = tokenDf(4000).cache()
    // exact truth per token across all docs
    val truth = df.select(explode($"tokens").as("t")).groupBy($"t")
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val n = truth.values.sum

    def check(bytes: Array[Byte]): Unit = {
      val f = FrequentItems.deserialize(bytes)
      assert(f.total == n)
      assert(f.offset <= 2L * n / f.k + 1)
      val present = f.entries.map(e => e._1 -> e._2).toMap
      truth.foreach { case (key, t) =>
        present.get(key) match {
          case Some(c) => assert(c <= t && c + f.offset >= t, s"key $key")
          case None => assert(t <= f.offset, s"absent key $key true=$t off=${f.offset}")
        }
      }
    }
    // direct aggregate (array child, explode-free)
    check(df.agg(api.ss_agg($"tokens", 128).as("sk")).head().getAs[Array[Byte]](0))
    // repartitioned (different partial-merge tree): invariants must hold
    check(df.repartition(13).agg(api.ss_agg($"tokens", 128).as("sk"))
      .head().getAs[Array[Byte]](0))
    // two-stage salted build through ss_merge_agg
    check(df.withColumn("salt", pmod(xxhash64($"doc_id"), lit(7)))
      .groupBy($"salt").agg(api.ss_agg($"tokens", 128).as("partial"))
      .agg(api.ss_merge_agg($"partial").as("sk"))
      .head().getAs[Array[Byte]](0))
    // SQL-text surface: registry resolution + ss_topk/ss_estimate probes
    df.createOrReplaceTempView("ss_v")
    val row = spark.sql(
      """SELECT ss_total(sk) total, ss_offset(sk) off, size(ss_topk(sk, 5)) topn,
        |       ss_topk(sk, 1)[0].lb lb0, ss_topk(sk, 1)[0].ub ub0,
        |       ss_estimate(sk, 0) est0
        |FROM (SELECT ss_agg(tokens, 128) sk FROM ss_v)""".stripMargin).head()
    assert(row.getLong(0) == n)
    assert(row.getInt(2) == 5)
    assert(row.getLong(3) <= row.getLong(4))
    // token 0 is the zipf mode: its estimate must be >= its true count
    assert(row.getLong(5) >= truth.getOrElse(0L, 0L))
    // string keys through the aggregate carry the original text back out
    val top = spark.sql(
      """SELECT ss_topk(ss_agg(source, 8), 1)[0].key_str FROM ss_v""").head().getString(0)
    assert(top == "web", s"dominant source should be web, got $top")
    // raw BINARY keys are opaque: key_str must stay null (no mojibake),
    // while the canonical long key still identifies the entry
    val binRow = spark.sql(
      """SELECT ss_topk(ss_agg(encode(source, 'utf-8'), 8), 1)[0] FROM ss_v""").head()
    assert(binRow.getStruct(0).isNullAt(1), "binary keys must not render as key_str")
    df.unpersist()
  }

  test("kmv_agg: shuffle-invariant state; exact below k; SQL surface; two-stage merge") {
    val df = tokenDf(3000).cache()
    val exactDistinct = df.select(explode($"tokens")).distinct().count()
    // state is a pure function of the distinct key set: direct, shuffled
    // and two-stage salted builds must be BYTE-identical, not just close
    val direct = df.agg(api.kmv_agg($"tokens", 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    val shuffled = df.repartition(13).agg(api.kmv_agg($"tokens", 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    val twoStage = df.withColumn("salt", pmod(xxhash64($"doc_id"), lit(7)))
      .groupBy($"salt").agg(api.kmv_agg($"tokens", 256).as("partial"))
      .agg(api.kmv_merge_agg($"partial").as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, shuffled))
    assert(java.util.Arrays.equals(direct, twoStage))
    // packed-token path: byte-identical to the array<int> build
    val packed = df.agg(
        api.kmv_agg_packed(api.pack_ints($"tokens"), 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, packed), "kmv_agg_packed != kmv_agg")
    val s = KmvSketch.deserialize(direct)
    assert(!s.isExact) // ~4000 distinct tokens >> 256
    assert(math.abs(s.estimate - exactDistinct) <=
      4.0 / math.sqrt(254.0) * exactDistinct)
    // SQL-text surface: probes + exact mode below capacity
    df.createOrReplaceTempView("kmv_v")
    val row = spark.sql(
      """SELECT kmv_distinct(sk) est, kmv_size(sk) sz, kmv_is_exact(sk) ex,
        |       size(kmv_sample(sk, 7)) sn,
        |       kmv_jaccard(sk, sk) selfj,
        |       kmv_distinct(kmv_union(sk, sk)) uest
        |FROM (SELECT kmv_agg(n_tok, 1024) sk FROM kmv_v)""".stripMargin).head()
    assert(row.getBoolean(2), "64 distinct n_tok values must stay exact at k=1024")
    assert(row.getLong(0) == row.getLong(1), "exact mode: estimate == size")
    assert(row.getLong(0) ==
      df.select($"n_tok").distinct().count())
    assert(row.getInt(3) == 7)
    assert(row.getDouble(4) == 1.0, "self-jaccard must be exactly 1")
    assert(row.getLong(5) == row.getLong(0), "union is idempotent")
    // string keys carry original text out through the sample
    val topStr = spark.sql(
      """SELECT kmv_sample(kmv_agg(source, 16), 16) FROM kmv_v""").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(topStr.size == 4)
    assert(topStr.map(_.getString(1)).toSet == Set("web", "books", "code", "wiki"))
    // raw BINARY keys are opaque: key_str must stay null (no mojibake)
    val binRow2 = spark.sql(
      """SELECT kmv_sample(kmv_agg(encode(source, 'utf-8'), 16), 1)[0] FROM kmv_v""").head()
    assert(binRow2.getStruct(0).isNullAt(1), "binary keys must not render as key_str")
    // sketch_meta dispatches the new kind
    val meta = spark.sql(
      """SELECT sketch_meta(kmv_agg(tokens, 256)) FROM kmv_v""").head().getStruct(0)
    assert(meta.getString(0) == "kmv")
    df.unpersist()
  }
}
