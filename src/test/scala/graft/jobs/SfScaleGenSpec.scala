package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SfScaleGen is gate-evidence infrastructure (the sf1-class rehearsal
  * runs the DuckDB compare over its output), so its invariants get the
  * same spec treatment as an operator: replica-disjoint dense keys,
  * join consistency inside each replica, per-key frequency preservation,
  * key-derived name bijectivity, and run-to-run determinism. */
class SfScaleGenSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sfgen-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val src = "/root/testdata/sf0.001"

  test("scaled replicas are disjoint, dense, join-consistent, and distribution-preserving") {
    val out = Files.createTempDirectory("sfgen_spec_").toString
    try {
      SfScaleGen.run(spark, src, out, 3)

      val liS = spark.read.parquet(s"$src/lineitem.parquet")
      val li = spark.read.parquet(s"$out/lineitem.parquet")
      val sup = spark.read.parquet(s"$out/supplier.parquet")
      val ord = spark.read.parquet(s"$out/orders.parquet")
      val nSupS = spark.read.parquet(s"$src/supplier.parquet").count()
      val nOrdS = spark.read.parquet(s"$src/orders.parquet").count()

      // volume: fact tables x3, fixed dims x1
      assert(li.count() == 3 * liS.count())
      assert(spark.read.parquet(s"$out/nation.parquet").count() ==
        spark.read.parquet(s"$src/nation.parquet").count())

      // dense disjoint keyspace: suppkeys are exactly 0..3*nSup-1
      val sk = sup.agg(min(col("s_suppkey")), max(col("s_suppkey")),
        countDistinct(col("s_suppkey"))).head()
      assert(sk.getLong(0) == 0L && sk.getLong(1) == 3 * nSupS - 1 &&
        sk.getLong(2) == 3 * nSupS)

      // join consistency inside a replica: every FK resolves, and never
      // across replicas (replica of l_orderkey == replica of o_orderkey)
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      assert(j.count() == li.count())
      assert(j.where(floor(col("l_orderkey") / lit(nOrdS)) =!=
        floor(col("o_orderkey") / lit(nOrdS))).count() == 0L)

      // per-key frequency preserved: replica-0 per-suppkey counts equal
      // the source's exactly
      val c0 = li.where(col("l_suppkey") < nSupS)
        .groupBy("l_suppkey").count().orderBy("l_suppkey").collect().toSeq
      val cs = liS.groupBy("l_suppkey").count().orderBy("l_suppkey").collect().toSeq
      assert(c0 == cs)

      // key-derived names stay bijective with the shifted key (the
      // join_enrich_topsupp oracle groups by s_name as a key alias)
      assert(sup.select(countDistinct(col("s_name"))).head().getLong(0) == 3 * nSupS)
      assert(sup.where(col("s_name") =!=
        format_string("Supplier#%09d", col("s_suppkey"))).count() == 0L)

      // fixture layout: plain files, not Spark part-dirs (the streaming
      // gate queries' pathGlobFilter needs a leaf file)
      assert(new java.io.File(s"$out/lineitem.parquet").isFile)

      // determinism: a second run is row-identical
      val out2 = Files.createTempDirectory("sfgen_spec2_").toString
      try {
        SfScaleGen.run(spark, src, out2, 3)
        val again = spark.read.parquet(s"$out2/lineitem.parquet")
        assert(li.exceptAll(again).isEmpty && again.exceptAll(li).isEmpty)
      } finally graft.util.ParquetState.deleteRecursively(new java.io.File(out2))
    } finally graft.util.ParquetState.deleteRecursively(new java.io.File(out))
  }
}
