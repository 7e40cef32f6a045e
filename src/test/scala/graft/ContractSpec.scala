package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle belongs to a query, names
  * are unique and stable, and every query's plan at least ANALYZES
  * against the sf0.001 tables (catches registration typos / schema
  * drift without paying full execution in unit tests — execution is the
  * Verify gate's job). */
class ContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-contract-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("every oracle key has a query; no orphans") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o.diff(q)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val unoracled = q.diff(o)
    // every query carries an oracle (the lossy ANN variants via the
    // recall bound-check pattern) — the gate must have zero rows-only rows
    assert(unoracled.isEmpty, s"unexpected rows-only queries: $unoracled")
  }

  test("every query analyzes against the sf0.001 tables") {
    val dir = "/root/testdata/sf0.001"
    // streaming queries execute on construction (start/awaitTermination);
    // analyzing them here would run them — they are covered by the gate.
    // Prefix-matched so a NEW streaming shape can't silently turn this
    // analyze-only test into a full stream execution (the enumerated set
    // this replaced had drifted 4 shapes behind). Eager-state pipelines
    // (SparkEntry.eagerStateQueries) likewise ingest on construction —
    // "analyzing" dedup_incremental was 3 full batch cycles per test run.
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!name.startsWith("streaming_") &&
          !SparkEntry.eagerStateQueries.contains(name)) {
        val df = fn(spark, dir)
        assert(df.schema.fields.nonEmpty, s"$name: empty schema")
        df.queryExecution.assertAnalyzed()
      }
    }
  }
}
