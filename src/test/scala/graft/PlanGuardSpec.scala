package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the EXPLAIN.md audit as executable
  * assertions. Every gate query (PlanAudit.all) must keep its
  * shuffle/broadcast discipline — a silent fallback to a sort-merge
  * join or a cartesian corpus scan fails here, not in a review. */
class PlanGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-planguard")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("ALL query plans: no sort-merge joins, no unbounded cartesian scans") {
    // round 5: the whole gate, not just the curated picks — streaming
    // queries contribute their batch-recheck side (the stream executes
    // at construction), eager-state queries their post-materialization
    // plan; both are exactly what a regression would corrupt
    PlanAudit.all.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("SortMergeJoin"),
        s"$name regressed to a sort-merge join:\n$plan")
      // BroadcastNestedLoopJoin is legitimate ONLY as a singleton-sketch /
      // broadcast-probe fan-out; a CartesianProduct never is
      assert(!plan.contains("CartesianProduct"),
        s"$name contains a cartesian product:\n$plan")
    }
  }

  test("single-shuffle window queries keep exactly one exchange") {
    // sessionization: both window passes must reuse ONE exchange keyed
    // by entity; window_quantile_running: one exchange keyed by
    // event_type, one Window node evaluating kll + td per frame
    // sessionization's lag (offset frame) and running sum (cumulative
    // frame) are distinct Window nodes by necessity — the guard is that
    // they SHARE the one exchange/sort, not that they fuse
    // sessionization_daybounded: the (entity, day) key must be
    // materialized ONCE — partitioning both Window passes by the raw
    // day expression makes each node project a fresh attribute that
    // EnsureRequirements can't prove equal, tripling the exchanges
    // (regression shape this guard pins: 3 exchanges, none shared)
    // sequence_packing: the per-sequence summary groupBy must REUSE the
    // window's shard partitioning (HashPartitioning(shard) clusters
    // (shard, seq)) — a second exchange there re-shuffles the whole
    // span table; repetition_metrics: a pure map, ZERO exchanges — the
    // explode-lines + groupBy alternative would shuffle every line of
    // the corpus
    for ((name, wantExchanges, wantWindows) <- Seq(
        ("sessionization", 1, 2), ("sessionization_daybounded", 1, 2),
        ("window_quantile_running", 1, 1),
        ("window_running_distinct", 1, 1),
        // sequence_packing: the duplicate-id lag guard shares the
        // running-sum's partitioning AND ordering, so CollapseWindow
        // fuses both into ONE Window node over one exchange
        ("sequence_packing", 1, 1),
        ("repetition_metrics", 0, 0),
        // source_cap_sample: tiny counts agg (1) + ONE rank-window
        // exchange (2) shared by both Window nodes (row_number +
        // starvation-guard count), final groupBy(source) reuses the
        // window partitioning — a third exchange there re-shuffles the
        // kept set for nothing
        ("source_cap_sample", 2, 2))) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val ex = plan.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
      assert(ex == wantExchanges,
        s"$name planned $ex exchanges, want $wantExchanges:\n$plan")
      val win = plan.linesIterator.count(_.trim.matches("""\(\d+\) Window.*"""))
      assert(win == wantWindows,
        s"$name planned $win Window nodes, want $wantWindows:\n$plan")
    }
  }

  test("training_recipe: dedup window planned once, decontamination anti-join broadcasts") {
    // the recipe's decontamination branch computes its hit list over the
    // PRE-dedup filtered set (contamination is content-determined, so
    // extra hits on dropped duplicate ids are anti-join no-ops) — the
    // regression shape this pins is the dedup window replayed inside the
    // hits branch, doubling the corpus shuffle (windows=2, exchanges+1)
    val plan = SparkEntry.queries("training_recipe")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val win = plan.linesIterator.count(_.trim.matches("""\(\d+\) Window.*"""))
    assert(win == 1, s"training_recipe planned $win Window nodes, want 1:\n$plan")
    assert(plan.contains("BroadcastHashJoin LeftAnti"),
      s"training_recipe decontamination must broadcast-anti-join the " +
        s"(eval-adjacent, small) hit list:\n$plan")
  }

  test("lsh candidate re-join shuffles, never broadcasts the corpus-proportional side") {
    // the LSH candidate set grows with the CORPUS (|queries| x nTables x
    // corpus/2^nPlanes), so a broadcast there walks into the 8 GB wall at
    // scale; the pairs must hash-build over a shuffle while only the
    // query vectors broadcast
    val plan = SparkEntry.queries("ann_lsh_topk")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("ShuffledHashJoin"),
      s"ann_lsh_topk lost the shuffled-hash candidate join:\n$plan")
  }

  test("sketch aggregates split partial/final as ObjectHashAggregate") {
    for (name <- Seq("cqf_count_by_flag", "cqf_merge_two_stage",
        "cqf_intersect_by_bucket")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("ObjectHashAggregate"),
        s"$name lost its ObjectHashAggregate plan:\n$plan")
    }
  }

  test("heavy-hitter candidates come from the summary, not a distinct key scan") {
    // old shape scanned lineitem a 3rd time just to enumerate distinct
    // keys (billions of rows at 100 TB); the summary shape is 2 scans —
    // the sketch pass (materialized once via localCheckpoint, so it sits
    // BEFORE the visible plan) + the exact recheck — with candidates
    // exploded from ss_topk
    for (name <- Seq("cms_heavy_hitters", "ss_heavy_hitters")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val scans = plan.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
      assert(scans <= 2, s"$name scans the fact table $scans times:\n$plan")
      assert(plan.contains("Generate"),
        s"$name lost its ss_topk candidate explode:\n$plan")
    }
  }

  test("heavy-hitter rank window runs over the bounded candidate table only") {
    // WindowExec warns "No Partition Defined ... single partition" on
    // these queries — safe BY DESIGN (heavyHittersFromSummary): the
    // window's input is the post-aggregation candidate-count table,
    // bounded by the M=256 summary pool at ANY corpus scale. This pins
    // the bound structurally (so the warning needs no per-round
    // re-audit): the lone unpartitioned Window must sit ABOVE an
    // aggregate, which itself sits above the ss_topk candidate explode —
    // never directly over a fact scan.
    import org.apache.spark.sql.catalyst.plans.logical
    for (name <- Seq("cms_heavy_hitters", "ss_heavy_hitters",
        "corpus_top_bigrams")) {
      val lp = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan
      val wins = lp.collect { case w: logical.Window => w }
      assert(wins.size == 1, s"$name: want exactly 1 Window, got ${wins.size}")
      val w = wins.head
      assert(w.partitionSpec.isEmpty,
        s"$name: the rank window is expected unpartitioned (global rank)")
      assert(w.child.collect { case a: logical.Aggregate => a }.nonEmpty,
        s"$name: window input is not an aggregated (bounded) table:\n$lp")
      assert(w.child.collect { case g: logical.Generate => g }.nonEmpty,
        s"$name: no ss_topk candidate explode below the window:\n$lp")
    }
  }

  test("bound-check queries never plan the distinct-Expand over a sketch aggregate") {
    // countDistinct mixed into the sketch aggregation plans the Expand
    // shape: stage 1 groups by (group, key) and allocates a sketch
    // buffer PER DISTINCT KEY (16 KB HLL x distinct docs; a kmv buffer
    // x ~6M composite keys at sf0.1) — the exact oracle must stay in
    // its own hash pass, joined back null-safely over the tiny side
    for (name <- Seq("hll_distinct_by_source", "kmv_estimate_bound")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("Expand"),
        s"$name regressed to the distinct-Expand shape:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name lost its broadcast join-back:\n$plan")
    }
  }

  test("table_profile sketch pass: one Expand-free ObjectHashAggregate scan") {
    // the final query's visible plan starts AFTER the localCheckpoint,
    // so the "single fact scan builds every sketch" claim must be
    // asserted on the pre-materialization frame; the generic audited
    // loop (PlanAudit.all) covers the final plan's SMJ/cartesian
    // discipline
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plan = SparkEntry.tableProfileSketchPass(li)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("ObjectHashAggregate"),
      s"sketch pass lost its object-hash aggregation:\n$plan")
    assert(!plan.contains("Expand"),
      s"sketch pass planned a distinct-Expand:\n$plan")
    val nScans = "\\(\\d+\\) Scan parquet".r.findAllIn(plan).size
    assert(nScans == 1, s"sketch pass must be ONE fact scan, saw $nScans:\n$plan")
    // the final plan must also stay Expand-free (its exact-distinct
    // pass is a lone countDistinct: two-phase hash agg, no Expand)
    val finalPlan = SparkEntry.queries("table_profile")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!finalPlan.contains("Expand"),
      s"table_profile final plan regressed to distinct-Expand:\n$finalPlan")
  }

  test("kmv membership join-back broadcasts the sample, one in-plan fact scan") {
    // the 5-row sketch result is localCheckpoint-materialized once, so
    // the visible plan must show exactly ONE parquet scan (the
    // membership pass) with the ≤5·k sampled pairs on the broadcast
    // side of the semi join — never the fact table
    val plan = SparkEntry.queries("kmv_distinct_by_source")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val scans = plan.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"kmv_distinct_by_source has $scans in-plan fact scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin LeftSemi BuildRight"),
      s"kmv membership check lost its broadcast semi join:\n$plan")
  }

  test("scans prune to the referenced columns") {
    // token_counts reads only (source, text) of documents' 6+ columns
    val plan = SparkEntry.queries("token_counts")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val readSchemas = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { rs =>
      assert(!rs.contains("doc_id") && !rs.contains("lang"),
        s"token_counts scan reads unneeded columns: $rs")
    }
  }
}
