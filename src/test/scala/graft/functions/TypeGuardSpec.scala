package graft.functions

import graft.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Analysis-time type discipline of the SQL probe surface, and totality
  * of the merge paths over the zero-length "no sketch" image. */
class TypeGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-typeguard-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def viewed(): Unit = {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("id", "x").createOrReplaceTempView("tg")
  }

  test("td_quantile / kll_rank accept plain SQL numeric literals") {
    viewed()
    // 0.5 parses as DECIMAL(1,1) and 25 as INT — the pre-fix probes cast
    // the argument straight to java.lang.Double and threw per-row on
    // BOTH of SQL's natural spellings
    val r = spark.sql(
      """SELECT td_quantile(td, 0.5) AS q, td_cdf(td, 25) AS c,
        |       kll_quantile(kl, 0.5) AS kq, kll_rank(kl, 25) AS kr
        |FROM (SELECT td_agg(x) AS td, kll_agg(x) AS kl FROM tg)""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) >= 10.0 && r.getDouble(0) <= 40.0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(r.getDouble(2) >= 10.0 && r.getDouble(2) <= 40.0)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 4L)
  }

  test("non-binary operands fail probes at analysis, not per-row") {
    viewed()
    for (q <- Seq(
        "SELECT cqf_union(id, id) FROM tg",
        "SELECT hll_union(id, x) FROM tg",
        "SELECT hll_estimate(id) FROM tg",
        "SELECT cqf_distinct(x) FROM tg",
        "SELECT kll_n(id) FROM tg",
        "SELECT sketch_meta(id) FROM tg",
        "SELECT td_quantile(id, 0.5) FROM tg",
        "SELECT td_quantile(td, 'mid') FROM (SELECT td_agg(x) AS td FROM tg)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.toLowerCase.contains("binary") ||
        e.getMessage.toLowerCase.contains("numeric") ||
        e.getMessage.contains("DATATYPE_MISMATCH"), s"$q -> ${e.getMessage}")
    }
  }

  test("SQL literal arguments: decimal doubles accepted, out-of-Int-range literals rejected") {
    viewed()
    // SQL parses 200.0 as DECIMAL(4,1) — the documented td_agg(x, 200.0)
    // call shape must work without CAST
    val r = spark.sql("SELECT td_quantile(td_agg(x, 200.0), 0.5) AS q FROM tg")
      .collect()(0)
    assert(r.getDouble(0) >= 10.0 && r.getDouble(0) <= 40.0)
    // 2^33 parses as BIGINT; silent .toInt would build kmv with k=0
    val e = intercept[Exception](
      spark.sql("SELECT kmv_agg(id, 8589934592) FROM tg").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("out of Int range"), msgs)
  }

  test("all-null-group merge-agg output merges into a non-default-k pipeline (empty-adopt)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group 'b' has only null sketches (the left-join shape); its
    // merge-agg output is a DEFAULT-k empty sketch, which the pipeline's
    // k=512 second merge stage used to reject with a k-mismatch crash —
    // the kernels now adopt the parameterized side when one side is
    // stateless
    val skd = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "a", "x"))
      .toDF("id", "g", "key")
      .groupBy(col("g")).agg(graft.api.ss_agg(col("key"), 512).as("sk"))
      .union(Seq(("b", Option.empty[Array[Byte]])).toDF("g", "sk"))
    val merged = skd.groupBy(col("g"))
      .agg(graft.api.ss_merge_agg(col("sk")).as("sk"))
      .orderBy(col("g")).collect()
    val bSketch = graft.sketch.FrequentItems.deserialize(
      merged(1).getAs[Array[Byte]]("sk"))
    assert(bSketch.total === 0L && bSketch.offset === 0L,
      "all-null group must read out as an empty sketch")
    // the SECOND merge stage sees (real k=512 sketch, default-k empty)
    val second = skd.agg(graft.api.ss_merge_agg(col("sk")).as("sk")).collect()(0)
      .getAs[Array[Byte]]("sk")
    val fi = graft.sketch.FrequentItems.deserialize(second)
    assert(fi.estimateBytes("x".getBytes("UTF-8")) === 2L)
    // a zero-length image (external data) fails LOUDLY at parse — no
    // "empty is identity" shortcut, which would be union semantics only
    // and silently wrong for intersect/diff/non-sum combiners
    val aBytes = merged(0).getAs[Array[Byte]]("sk")
    val e = intercept[Exception](Seq((aBytes, Array.emptyByteArray)).toDF("a", "b")
      .selectExpr("ss_union(a, b) AS ab").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.toLowerCase.contains("image") || msgs.toLowerCase.contains("magic") ||
      msgs.toLowerCase.contains("truncat") || msgs.toLowerCase.contains("short"), msgs)
  }

  test("kernels: a stateless sketch with mismatched parameters is a merge identity; real state still rejects") {
    import graft.sketch._
    // hll
    val h = HllSketch(12); val hBig = HllSketch(14); hBig.add(7L)
    assert(h.mergeInPlace(hBig).cardinality === hBig.cardinality)
    assert(hBig.mergeInPlace(HllSketch(12)).cardinality === hBig.cardinality)
    val hReal = HllSketch(12); hReal.add(9L)
    intercept[IllegalArgumentException](hReal.mergeInPlace(hBig))
    // cms
    val c = CountMinSketch(); val cBig = CountMinSketch(7, 4096); cBig.add(1L, 3L)
    assert(c.mergeInPlace(cBig).estimate(1L) === 3L)
    assert(cBig.mergeInPlace(CountMinSketch()).estimate(1L) === 3L)
    val cReal = CountMinSketch(); cReal.add(2L)
    intercept[IllegalArgumentException](cReal.mergeInPlace(cBig))
    // bloom
    val b = BloomSketch(); val bBig = BloomSketch(1 << 20, 7); bBig.add(5L)
    assert(b.mergeInPlace(bBig).mightContain(5L))
    assert(bBig.mergeInPlace(BloomSketch()).mightContain(5L))
    val bReal = BloomSketch(); bReal.add(6L)
    intercept[IllegalArgumentException](bReal.mergeInPlace(bBig))
    // kll
    val kl = KllSketch(200); val klBig = KllSketch(400); klBig.add(1.5)
    assert(kl.mergeInPlace(klBig).n === 1L)
    assert(klBig.mergeInPlace(KllSketch(200)).n === 1L)
    val klReal = KllSketch(200); klReal.add(2.5)
    intercept[IllegalArgumentException](klReal.mergeInPlace(klBig))
    // ss (frequent items)
    val f = FrequentItems(256); val fBig = FrequentItems(512); fBig.add(3L)
    assert(f.mergeInPlace(fBig).estimate(3L) === 1L)
    assert(fBig.mergeInPlace(FrequentItems(256)).estimate(3L) === 1L)
    val fReal = FrequentItems(256); fReal.add(4L)
    intercept[IllegalArgumentException](fReal.mergeInPlace(fBig))
    // kmv
    val kv = KmvSketch(1024); val kvBig = KmvSketch(2048); kvBig.add(8L)
    assert(kv.mergeInPlace(kvBig).size === 1)
    assert(kvBig.mergeInPlace(KmvSketch(1024)).size === 1)
    val kvReal = KmvSketch(1024); kvReal.add(9L)
    intercept[IllegalArgumentException](kvReal.mergeInPlace(kvBig))
  }

  test("degenerate minhash/shingle parameters are rejected, not silently constant") {
    import spark.implicits._
    val df = Seq(Seq("a", "b", "c", "d")).toDF("toks")
    for (expr <- Seq("minhash_sig(toks, 0)", "shingle_minhash(toks, 0, 8)",
        "shingle_hash_set(toks, 0)")) {
      val e = intercept[Exception](df.selectExpr(expr).collect())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("; ")
      assert(msgs.contains("must be >= 1"), s"$expr -> $msgs")
    }
  }

  test("t-digest: compression mismatch adopts from a stateless side, rejects real state") {
    import graft.sketch.TDigest
    val empty = TDigest(20.0)
    val big = TDigest(1000.0); big.add(1.0); big.add(2.0); big.add(3.0)
    val adopted = empty.mergeInPlace(big)
    assert(adopted.compression === 1000.0 && adopted.totalWeight === 3.0)
    assert(big.mergeInPlace(TDigest(20.0)).totalWeight === 3.0)
    val real = TDigest(20.0); real.add(9.0)
    intercept[IllegalArgumentException](real.mergeInPlace(big))
  }

  test("t-digest cdf interpolates the tail instead of snapping to 1.0") {
    import graft.sketch.TDigest
    val td = TDigest(100.0)
    (1 to 1000).foreach(i => td.add(i.toDouble))
    // x strictly between the last centroid mean and max must sit in
    // (cdf(lastMean), 1), not jump to exactly 1.0
    val nearMax = 999.5
    val c = td.cdf(nearMax)
    assert(c < 1.0 && c > 0.99, s"tail cdf $c")
    // symmetry with the head: cdf(quantile(q)) stays close at both ends
    assert(math.abs(td.cdf(td.quantile(0.999)) - 0.999) < 0.01)
  }

  test("corrupt t-digest / cms / bloom / kll images fail as clean parse errors") {
    import graft.sketch._
    import java.nio.{ByteBuffer, ByteOrder}
    def leLong(pairs: Seq[Any]): Array[Byte] = {
      val bb = ByteBuffer.allocate(pairs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      pairs.foreach {
        case l: Long => bb.putLong(l)
        case d: Double => bb.putDouble(d)
      }
      bb.array()
    }
    // t-digest: negative count, count larger than the payload, short image
    def tdImg(n: Long) = leLong(Seq[Any](0x3147445454465247L, 100.0, n, 0.0, 1.0))
    for (bad <- Seq(tdImg(-1L), tdImg(1L << 30), tdImg(3L))) {
      val e = intercept[IllegalArgumentException](TDigest.deserialize(bad))
      assert(e.getMessage.contains("corrupt"), e.getMessage)
    }
    intercept[IllegalArgumentException](TDigest.deserialize(Array[Byte](1, 2, 3)))
    // cms: d*w that would overflow an Int multiply; zero depth
    val cmsBad = leLong(Seq[Any](0x31534d4354465247L, 1L << 20, 1L << 20, 0L))
    assert(intercept[IllegalArgumentException](
      CountMinSketch.deserialize(cmsBad)).getMessage.contains("corrupt"))
    val cmsZero = leLong(Seq[Any](0x31534d4354465247L, 0L, 2048L, 0L))
    assert(intercept[IllegalArgumentException](
      CountMinSketch.deserialize(cmsZero)).getMessage.contains("corrupt"))
    // bloom: negative bits; bits wrapping the word count
    val bloomNeg = leLong(Seq[Any](0x314d4c4254465247L, -64L, 5L))
    assert(intercept[IllegalArgumentException](
      BloomSketch.deserialize(bloomNeg)).getMessage.contains("corrupt"))
    val bloomHuge = leLong(Seq[Any](0x314d4c4254465247L, 1L << 40, 5L))
    assert(intercept[IllegalArgumentException](
      BloomSketch.deserialize(bloomHuge)).getMessage.contains("corrupt"))
    // bloom apply: a bitset that cannot be one JVM array
    intercept[IllegalArgumentException](BloomSketch(1L << 40, 5))
    // kll: header n disagreeing with the retained items on emptiness
    val kllGhost = leLong(Seq[Any](0x314c4c4b54465247L, 200L, 5L, 1L, 1L, 0L))
    assert(intercept[IllegalArgumentException](
      KllSketch.deserialize(kllGhost)).getMessage.contains("corrupt"))
    val kllPhantom = {
      val s = KllSketch(200); s.add(1.0)
      val img = s.serialize()
      // overwrite n with 0 while one item remains
      val bb = ByteBuffer.wrap(img).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(16, 0L)
      img
    }
    assert(intercept[IllegalArgumentException](
      KllSketch.deserialize(kllPhantom)).getMessage.contains("corrupt"))
  }

  test("wav fmt chunk declaring fewer than 16 bytes decodes as unknown") {
    // RIFF/WAVE with a 'fmt ' chunk of DECLARED size 0 followed by junk
    // bytes: the old guard only checked 16 bytes REMAIN in the file, so
    // channels/rate/depth were read from the next chunk's bytes
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(0) // declared size 0
    bb.put("data".getBytes("US-ASCII")).putInt(16)
    bb.put(new Array[Byte](16))
    val row = MediaDecode.decode(bb.array())
    assert(row.getUTF8String(0).toString === "unknown",
      s"short fmt chunk must not parse as wav: $row")
  }
}
