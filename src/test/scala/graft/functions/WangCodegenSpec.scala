package graft.functions

import graft.sketch.WangHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** wang_hash / wang_unhash whole-stage codegen parity: the generated
  * Java must reproduce the kernel bit-for-bit across key types, bit
  * widths, signs, and nulls — and actually compile (codegen.fallback is
  * disabled here, so a Janino error fails the query instead of silently
  * reverting to the interpreted path this spec is meant to retire). */
class WangCodegenSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-wang-codegen-test")
      .config("spark.sql.shuffle.partitions", "2")
      // broken generated code must FAIL the test, not fall back
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("not a CodegenFallback; the project stays inside WholeStageCodegen") {
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[WangHashExpr]))
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[WangUnhashExpr]))
    val df = spark.range(0, 16).select(graft.api.wang_hash(col("id"), 48).as("h"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, "no WholeStageCodegen stage in the plan")
    assert(stages.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.nonEmpty), "wang_hash project fell out of the codegen stage")
  }

  test("generated code == kernel across bits, signs, and the roundtrip") {
    // raw ids (negative included — the sign-extension path); the kernel
    // masks internally, so parity only needs identical (key, bits) in
    for (bits <- Seq(1, 8, 26, 31, 48, 63, 64)) {
      val rows = spark.range(-1000, 1000)
        .select(col("id"), graft.api.wang_hash(col("id"), bits).as("h"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == WangHash.hash(r.getLong(0), bits),
          s"bits=$bits key=${r.getLong(0)}")
      }
    }
    // unhash inverts hash under codegen for full-width keys
    val rt = spark.range(-500, 500).select(col("id"),
      graft.api.wang_unhash(graft.api.wang_hash(col("id"), 64), 64).as("k"))
      .collect()
    rt.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("narrow integral key types sign-extend like the interpreted KeyConv") {
    val s0 = spark
    import s0.implicits._
    val df = Seq(-128, -1, 0, 1, 127).map(_.toByte).toDF("b")
      .select(col("b"),
        graft.api.wang_hash(col("b"), 64).as("hb"),
        graft.api.wang_hash(col("b").cast("smallint"), 64).as("hs"),
        graft.api.wang_hash(col("b").cast("int"), 64).as("hi"))
    df.collect().foreach { r =>
      val expect = WangHash.hash(r.getByte(0).toLong, 64)
      assert(r.getLong(1) == expect && r.getLong(2) == expect &&
        r.getLong(3) == expect)
    }
  }

  test("null keys stay null; bad bits reject at runtime under codegen") {
    val withNulls = spark.range(0, 10)
      .select(when(col("id") % 2 === 0, col("id")).as("k"))
      .select(graft.api.wang_hash(col("k"), 64).as("h"))
      .collect()
    assert(withNulls.count(_.isNullAt(0)) == 5)
    val e = intercept[Exception] {
      spark.range(0, 4).select(graft.api.wang_hash(col("id"), 0)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("bits must be in [1, 64]") ||
      Option(e.getCause).exists(_.getMessage.contains("bits must be in [1, 64]")))
  }
}
