package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The declarative registration path — `--conf
  * spark.sql.extensions=graft.GraftExtensions` — must expose the whole
  * function surface WITHOUT GraftFunctions.registerAll ever running
  * (that's how spark-submit users get the library). Instantiated via
  * the config string, exactly as spark-submit would (reflection), not
  * via withExtensions. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    // extensions only apply at session construction: make sure no
    // active session from a previous suite is reused
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("aggregates, probes, and generators resolve through the extension") {
    import spark.implicits._
    Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k").createOrReplaceTempView("ext_v")
    val row = spark.sql(
      """SELECT cqf_distinct(sk) AS d, cqf_total(sk) AS t,
        |       cqf_count(sk, 3L) AS c3, hll_estimate(h) AS hd
        |FROM (SELECT cqf_agg(k, 10, 64) sk, hll_agg(k, 12) h FROM ext_v)
        |""".stripMargin).head()
    assert(row.getLong(0) === 3L)
    assert(row.getLong(1) === 6L)
    assert(row.getLong(2) === 3L)
    assert(row.getLong(3) === 3L)
    // generator (table-generating function) through the extension path
    val items = spark.sql(
      """SELECT i.key, i.count
        |FROM (SELECT cqf_agg(k, 10, 64) sk FROM ext_v)
        |LATERAL VIEW cqf_items(sk) i AS hash, key, count
        |ORDER BY key""".stripMargin).collect()
    assert(items.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 1L), (3L, 3L)))
  }

  test("the *_udaf surface resolves through the extension (no registerAll)") {
    val row = spark.sql(
      """SELECT cqf_distinct(sk) AS d, hll_estimate(h) AS hd
        |FROM (SELECT cqf_agg_udaf(k) sk, hll_agg_udaf(k) h FROM ext_v)
        |""".stripMargin).head()
    assert(row.getLong(0) === 3L)
    assert(row.getLong(1) === 3L)
  }
}
