package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling-protocol helpers are tiny but their failure mode is
  * silent garbage numbers (wrong master string → threads measured as
  * "executors"), so pin them. */
class BenchHelpersSpec extends AnyFunSuite {

  test("masterFor threads mode maps n to local[n] with n slots") {
    assert(ScalingBench.masterFor(8, "threads") === (("local[8]", 8)))
    assert(ScalingBench.masterFor(32, "anything-else") === (("local[32]", 32)))
  }

  test("masterFor executors mode maps n to local-cluster with n*cores slots") {
    // env defaults: 8 cores, 8192 MB per executor
    val (master, slots) = ScalingBench.masterFor(4, "executors")
    assert(master === "local-cluster[4,8,8192]")
    assert(slots === 32)
  }

  test("awaitExecutors is a no-op for local masters (no session needed)") {
    // a local[...] master must return without touching the session at
    // all — null session proves the guard short-circuits
    ScalingBench.awaitExecutors(null, "local[4]")
  }
}
