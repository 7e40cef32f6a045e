package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling-protocol helpers are tiny but their failure mode is
  * silent garbage numbers (wrong master string → threads measured as
  * "executors"), so pin them. */
class BenchHelpersSpec extends AnyFunSuite {

  test("masterFor threads mode maps n to local[n] with n slots") {
    assert(ScalingBench.masterFor(8, "threads") === (("local[8]", 8)))
    assert(ScalingBench.masterFor(32, "threads") === (("local[32]", 32)))
  }

  test("masterFor executors mode maps n to local-cluster with n*cores slots") {
    // cores/mem come from env (forked tests inherit the shell's), so
    // assert the STRUCTURE against whatever is in effect rather than
    // hard-coding the defaults and flaking under an exported override
    val cores = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "2").toInt
    val memMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "8192").toInt
    val (master, slots) = ScalingBench.masterFor(4, "executors")
    assert(master === s"local-cluster[4,$cores,$memMb]")
    assert(slots === 4 * cores)
  }

  test("masterFor rejects unknown modes instead of silently measuring threads") {
    intercept[IllegalArgumentException] { ScalingBench.masterFor(4, "executor") }
  }

  test("awaitExecutors is a no-op for local masters (no session needed)") {
    // a local[...] master must return without touching the session at
    // all — null session proves the guard short-circuits
    ScalingBench.awaitExecutors(null, "local[4]")
  }

  test("median averages the middle two on even length (no low bias)") {
    assert(Bench.median(Seq(2.0)) === 2.0)
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    // the old lower-middle shortcut returned 2.1 here
    assert(Bench.median(Seq(2.0, 2.1, 2.9, 3.0)) === 2.5)
    intercept[IllegalArgumentException] { Bench.median(Seq.empty) }
  }

  test("jsonNum is locale-independent and finite-only") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.jsonNum(12.3456789) === "12.3457")
      assert(Bench.jsonNum(Double.NaN) === "0")
      assert(Bench.jsonNum(Double.PositiveInfinity) === "0")
    } finally java.util.Locale.setDefault(prev)
  }
}
