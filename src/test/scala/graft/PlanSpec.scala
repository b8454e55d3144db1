package graft

/** Physical-plan invariants across the whole query surface (SURVEY.md §4):
  * the optimizer must keep producing the plans the engine was designed
  * around — these specs catch silent plan regressions (a filter that stops
  * pushing, a join that degrades to a cartesian product, a top-k that
  * becomes a global sort) that correctness tests can't see.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfTiny)
      .queryExecution.executedPlan.toString

  test("no query plans a CartesianProduct") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sfTiny).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name degraded to CartesianProduct")
    }
  }

  test("star-schema dim joins broadcast") {
    for (name <- Seq("q5_multijoin", "q3_join_topk", "join_stream_static",
        "pivot_segment"))
      assert(plan(name).contains("BroadcastHashJoin"),
        s"$name should broadcast its dimension side")
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort+limit") {
    assert(plan("q3_join_topk").contains("TakeOrderedAndProject"))
  }

  test("events_orc scans ORC with the same pushdown as parquet") {
    val p = plan("events_orc")
    assert(p.contains("Format: ORC"),
      s"events_orc should read the ORC landing:\n${p.take(1500)}")
    assert(p.contains("PushedFilters: [") && p.contains("event_type"),
      "ORC scan should push the event_type IN filter")
  }

  test("join_bloom_filtered injects a runtime bloom filter under the fact scan") {
    val p = plan("join_bloom_filtered")
    assert(p.contains("might_contain"),
      s"runtime bloom filter not injected:\n${p.take(2000)}")
    assert(p.contains("bloom_filter_agg"),
      "bloom creation-side aggregate missing")
  }

  test("parquet scans push filters and prune columns") {
    val p = plan("filter_pushdown")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderstatus"))
    // doc_tokens needs only (doc_id, text) of documents' 5 columns
    val dt = plan("doc_tokens")
    assert(dt.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"doc_tokens should scan only doc_id+text:\n$dt")
  }

  test("near-dup verify joins broadcast ONLY candidate-bounded frames") {
    // Adaptive re-plan and size-based auto-broadcast off: what remains
    // broadcast is exactly what the code HINTS — the thing this invariant
    // pins. Every hinted frame (cand / candidate-id lists / common) derives
    // from the band self-join, so its subtree contains a join; the
    // O(corpus) frames (exploded shingles/grams, per-doc sizes) are pure
    // scan→explode→agg chains with no join. A broadcast subtree without a
    // join therefore means an unbounded table is being broadcast — the
    // driver-OOM-at-100TB pattern this test exists to prevent.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (name <- Seq("doc_near_dedup", "doc_ngram_jaccard")) {
        val p = SparkEntry.queries(name)(spark, sfTiny)
          .queryExecution.executedPlan
        val bcasts = p.collect {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
        }
        // doc_ngram_jaccard's banded array plan broadcasts nothing at all;
        // doc_near_dedup must still broadcast its candidate frames
        if (name == "doc_near_dedup")
          assert(bcasts.nonEmpty, s"$name should broadcast its candidate list")
        // Candidate-derived frames show either the band Join itself or a
        // ReusedExchange of the candidate shuffle; the O(corpus) frames
        // (exploded shingles/grams, per-doc sizes) are pure
        // scan→explode→agg chains that can contain neither.
        for (b <- bcasts) {
          val sub = b.child.toString
          assert(sub.contains("Join") || sub.contains("ReusedExchange"),
            s"$name broadcasts a non-candidate (O(corpus)) frame:\n$b")
        }
      }
    } finally {
      // restore what was SAVED, not hard-coded defaults — the shared
      // session may run with non-default settings
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBcast)
    }
  }

  test("doc_decontaminate_xl plans the two-phase runtime-filter shape") {
    // Phase 1 must BROADCAST the bounded bucket set; phase 2's exact gram
    // verify must NOT broadcast (at real scale neither side fits): the
    // shuffle_hash hint has to survive optimization. Auto-broadcast off so
    // the sf0.001 bench-gram frame can't sneak into a broadcast the
    // 100-TB plan wouldn't have.
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("doc_decontaminate_xl")(spark, sfTiny)
        .queryExecution.executedPlan
      val bcastSemi = p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType.toString == "LeftSemi" => j
      }
      assert(bcastSemi.nonEmpty,
        "bucket prefilter should be a broadcast left-semi join")
      // every broadcast side must be the bucket projection (bounded), never
      // the gram strings (unbounded)
      for (b <- bcastSemi)
        assert(b.leftKeys.toString.contains("bkt") ||
          b.rightKeys.toString.contains("bkt"),
          s"broadcast semi-join keyed on grams, not buckets:\n$b")
      val shuffledSemi = p.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType.toString == "LeftSemi" => j
      }
      assert(shuffledSemi.nonEmpty,
        "exact gram verify should stay a shuffled hash join (hint lost?)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBcast)
    }
  }

  test("events_pruned prunes partitions at the scan (window days only)") {
    // Expected counts come from the DATA, not a hardcoded 3-of-30: a
    // regenerated testdata set with a different date span must not fail
    // this test while pruning still works. The query's window is fixed
    // (2024-01-10..12, Partitioned.eventsPruned), so count the distinct
    // event dates inside/outside it.
    import org.apache.spark.sql.functions.{col, to_date}
    val days = Tables.events(spark, sfTiny)
      .select(to_date(col("ts")).cast("string").as("d"))
      .distinct().collect().map(_.getString(0))
    val inWindow = days.count(d => d >= "2024-01-10" && d <= "2024-01-12")
    assert(inWindow > 0 && inWindow < days.length,
      s"testdata no longer straddles the query window ($inWindow of ${days.length} days) — pruning unobservable")
    // sparkPlan, not executedPlan: AQE wraps the tree in
    // AdaptiveSparkPlanExec whose children are hidden until execution
    val scans = SparkEntry.queries("events_pruned")(spark, sfTiny)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.nonEmpty, "events_pruned lost its file scan")
    for (f <- scans) {
      assert(f.partitionFilters.nonEmpty,
        s"events_pruned scan has no PartitionFilters:\n$f")
      // listing actually selected only the in-window event_date
      // directories — the read-side behavior the filters exist to produce
      assert(f.selectedPartitions.partitionCount == inWindow,
        s"expected $inWindow pruned partitions (of ${days.length}), got ${f.selectedPartitions.partitionCount}")
    }
  }

  test("events_dpp plans a DynamicPruningSubquery on the partitioned scan") {
    // The pruning dates are a runtime subquery result (top error days), so
    // the scan's partition filters must carry a dynamic pruning
    // expression, not a static predicate — the DPP mechanism itself.
    val scans = SparkEntry.queries("events_dpp")(spark, sfTiny)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.partitionFilters.nonEmpty => f
      }
    assert(scans.nonEmpty, "events_dpp has no partition-filtered scan")
    val dynamic = scans.exists(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery])))
    assert(dynamic,
      "events_dpp partition filters are all static — dynamic partition " +
        s"pruning not planned:\n${scans.map(_.partitionFilters).mkString("\n")}")
  }

  test("join_bucketed joins and aggregates with zero data shuffle") {
    // The whole point of the bucketed landing: lineitem⋈orders co-located
    // on the bucket key, and the per-order aggregate inheriting the scan's
    // hash distribution — so the ONLY exchange in the plan is the final
    // presentation ORDER BY (a range partitioning). A second shuffle
    // appearing here means the bucket metadata stopped reaching the scan
    // and the 100-TB plan just regained its two biggest exchanges.
    // executedPlan AFTER execution: EnsureRequirements only inserts
    // exchanges in the prepared plan, and AQE finalizes it on first run
    val df = SparkEntry.queries("join_bucketed")(spark, sfTiny)
    df.collect()
    // the AQE plan string repeats the tree under "== Initial Plan ==" —
    // count exchanges only in the finalized section
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange hashpartitioning"),
      s"co-located join/agg regained a data shuffle:\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).length == 1,
      s"expected exactly the presentation-sort range exchange:\n$p")
    assert(p.contains("SortMergeJoin"),
      "co-located fact join should be a sort-merge join")
    assert(p.contains("Bucketed: true"),
      s"scans stopped reporting bucketed reads:\n$p")
    // SORTED BY + one file per bucket: the scan reports outputOrdering,
    // so the ONLY Sort left is the presentation ORDER BY — a second Sort
    // means the bucket files stopped being recognized as pre-sorted
    assert("Sort ".r.findAllIn(p).length == 1,
      s"sort-merge join regained per-query bucket sorts:\n$p")
  }

  test("partitioned landing copy re-lands when the source parquet changes") {
    // srcStamp keys the tmpdir landing path on the source's size/mtime:
    // a fresh JVM (simulated via resetMemoForTest) over an UNCHANGED
    // source reuses the landed copy; over a touched source it must land a
    // NEW path instead of serving the stale _SUCCESS-gated one.
    val tmp = java.nio.file.Files.createTempDirectory("graft_stamp").toFile
    try {
      val src = new java.io.File(tmp, "events.parquet")
      java.nio.file.Files.copy(
        new java.io.File(sfTiny, "events.parquet").toPath, src.toPath)
      val p1 = graft.sources.Partitioned.eventsByDay(spark, tmp.getAbsolutePath)
      graft.sources.Partitioned.resetMemoForTest()
      val p2 = graft.sources.Partitioned.eventsByDay(spark, tmp.getAbsolutePath)
      assert(p1 == p2, "unchanged source must reuse the landed copy")
      // regenerate-in-place: same bytes, new mtime (what a rewrite does)
      assert(src.setLastModified(src.lastModified + 10000))
      graft.sources.Partitioned.resetMemoForTest()
      val p3 = graft.sources.Partitioned.eventsByDay(spark, tmp.getAbsolutePath)
      assert(p3 != p1, "touched source must land a fresh partitioned copy")
    } finally {
      graft.sources.Partitioned.resetMemoForTest()
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("having_filter scans lineitem exactly once (no double aggregate)") {
    // The per-supplier aggregate is localCheckpoint'ed: the single fact
    // scan happens in the checkpoint job, and the query plan proper reads
    // the pinned rows (ExistingRDD) for both the threshold aggregate and
    // the filter — so the final plan must contain NO parquet scan at all.
    // A FileScan reappearing here means the checkpoint stopped pinning and
    // the double-aggregate-subplan bug (round 1: 11 s) is back.
    val p = plan("having_filter")
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 0 && p.contains("ExistingRDD"),
      s"having_filter should read only the checkpointed aggregate, found $scans file scans:\n$p")
  }

  test("agg_distinct multi-distinct is ONE fact scan (bitmap words, no Expand)") {
    // The packed-bitmap formulation reads lineitem exactly once; a second
    // FileScan means the split-and-rejoin plan (4 scans) is back, an
    // Expand node means Catalyst's native multi-distinct (full distinct
    // pair shuffle) replaced the word-packed one.
    val p = plan("agg_distinct")
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"agg_distinct should scan lineitem once, found $scans:\n$p")
    assert(!p.contains("Expand"), s"agg_distinct regressed to Expand multi-distinct:\n$p")
  }

  test("dq_audit folds every constraint into ONE fact scan") {
    // lineitem once (all metrics + the FK probe ride the same scan via
    // the cardinality-preserving left join), orders once (the pruned key
    // side) — a third scan means the anti-join second pass returned.
    val p = plan("dq_audit")
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 2, s"dq_audit should scan lineitem+orders once each, found $scans:\n$p")
  }

  test("kNN queries rank on the native TopK heap, never a window sort") {
    // The round-7 audit's one scale-killer: embedding_pq_knn's top-k pool
    // via row_number() shuffled ALL |corpus|×|queries| scored rows into
    // |queries| partitions and fully sorted each. Every kNN stage now uses
    // the bounded-heap TopKPerGroupExec; a WindowExec reappearing in any
    // of these plans is that regression coming back. embedding_pq_knn must
    // also probe the IVF cells (broadcast of the qcells LocalRelation)
    // rather than scan the full corpus per query.
    // hybrid_search and embedding_mmr rank BOTH their retrieval legs and
    // the fusion/selection steps on the same heap — same regression class
    for (name <- Seq("embedding_knn", "embedding_knn_lsh", "embedding_sq_knn",
        "embedding_pq_knn", "embedding_ivf_knn", "cdc_incremental_ivf",
        "hybrid_search", "embedding_mmr")) {
      val exec = SparkEntry.queries(name)(spark, sfTiny)
        .queryExecution.executedPlan
      val p = exec.toString
      assert(p.contains("TopKPerGroup"),
        s"$name lost the native TopK heap:\n$p")
      val wins = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.isEmpty, s"$name ranks via a window sort again:\n$p")
    }
    assert(plan("embedding_pq_knn").contains("BroadcastHashJoin"),
      "embedding_pq_knn should probe IVF cells via a broadcast cell join")
  }

  test("round-8 additions keep their designed shapes") {
    // doc_lm_coverage: the corpus bigram table joins BROADCAST onto the
    // gram instance stream (no pair-keyed shuffle/sort of the stream),
    // and nothing windows
    val lm = SparkEntry.queries("doc_lm_coverage")(spark, sfTiny)
      .queryExecution.executedPlan
    assert(lm.toString.contains("BroadcastHashJoin"),
      s"doc_lm_coverage lost the broadcast count-table join:\n$lm")
    assert(lm.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "doc_lm_coverage reverted to the window-over-pair shape")
    // doc_containment: exact verify via the native sorted-merge intersect
    val dc = plan("doc_containment")
    assert(dc.contains("sorted_intersect_count"),
      "doc_containment lost the codegen'd intersect kernel")
    // dedup_survivorship: the per-cluster election is the k=1 heap, not a
    // window sort over members
    val ds = SparkEntry.queries("dedup_survivorship")(spark, sfTiny)
      .queryExecution.executedPlan
    assert(ds.toString.contains("TopKPerGroup"),
      "dedup_survivorship lost the heap election")
    // catalog_view: dims broadcast through the catalog/view path too
    assert(plan("catalog_view").contains("BroadcastHashJoin"),
      "catalog_view dims no longer broadcast")
  }

  test("round-8 fifth-session additions keep their designed shapes") {
    def scans(name: String): Int =
      SparkEntry.queries(name)(spark, sfTiny)
        .queryExecution.sparkPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.size
    def windows(name: String): Int =
      SparkEntry.queries(name)(spark, sfTiny)
        .queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }.size
    // dual-wire fan-in: both encodings ride ONE scan of the log, and the
    // LWW is the mergeable argmax aggregate, never a window sort
    assert(scans("cdc_dual_wire_merge") == 1,
      "cdc_dual_wire_merge no longer single-scan")
    assert(windows("cdc_dual_wire_merge") == 0,
      "cdc_dual_wire_merge reverted to the window LWW")
    // chunked bootstrap: main scan + the 1-row span scan, nothing more,
    // and the chunk∪tail merge stays the lattice-join aggregate
    assert(scans("cdc_chunked_snapshot") <= 2,
      "cdc_chunked_snapshot grew extra scans")
    assert(windows("cdc_chunked_snapshot") == 0,
      "cdc_chunked_snapshot reverted to window LWW")
    // outlier gate: threshold from the domain histogram via broadcast,
    // no data-sized window anywhere
    assert(windows("embedding_outlier_gate") == 0,
      "embedding_outlier_gate planned a window")
    assert(plan("embedding_outlier_gate").contains("BroadcastNestedLoopJoin")
        || plan("embedding_outlier_gate").contains("BroadcastExchange"),
      "embedding_outlier_gate threshold no longer broadcasts")
    // exact mode: argmax aggregate, not a ranking window
    assert(windows("agg_mode") == 0, "agg_mode planned a window")
    // Q19 disjunction: the per-side projections of the OR-of-ANDs reach
    // BOTH scans (brand/size branches on part, the quantity disjunction
    // on lineitem) — the whole point of the shape
    val q19 = plan("q19_disjunction")
    assert(q19.contains("PushedFilters: [IsNotNull(p_partkey), Or(") ||
      q19.contains("Or(Or(And(EqualTo(p_brand"),
      s"q19_disjunction lost the part-side OR pushdown")
    assert(q19.contains("Or(Or(And(GreaterThanOrEqual(l_quantity") ||
      q19.contains("PushedFilters: [IsNotNull(l_partkey), Or("),
      s"q19_disjunction lost the lineitem-side quantity-envelope pushdown")
  }

  test("round-8 sixth-session additions keep their designed shapes") {
    def sparkPlanOf(name: String) =
      SparkEntry.queries(name)(spark, sfTiny).queryExecution.sparkPlan
    def windows(name: String): Int = sparkPlanOf(name).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.size
    def exchanges(name: String): Int = sparkPlanOf(name).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    // Q2 shape: the per-part argmin is the packed aggregate, never a
    // ranking window, and the filtered part dim broadcasts into the scan
    assert(windows("q2_min_cost_supp") == 0,
      "q2_min_cost_supp reverted to a window argmin")
    assert(plan("q2_min_cost_supp").contains("BroadcastHashJoin"),
      "q2_min_cost_supp part dim no longer broadcasts")
    // Q21 shape: both quantifiers fold into aggregates over ONE fact-side
    // exchange — the orders filter rides a broadcast join, and
    // HashPartitioning(orderkey) serves both grouped passes
    assert(plan("q21_sole_returner").contains("BroadcastHashJoin"),
      "q21_sole_returner orders side no longer broadcasts")
    assert(exchanges("q21_sole_returner") <= 3,
      "q21_sole_returner grew extra fact exchanges")
    // Q22 shape: the scalar threshold broadcasts (never a float avg in a
    // filter), dormancy is a left_anti
    val q22 = plan("q22_dormant_value")
    assert(q22.contains("LeftAnti"), "q22_dormant_value lost the anti join")
    assert(q22.contains("BroadcastExchange"),
      "q22_dormant_value scalar threshold no longer broadcasts")
    // DAU/MAU: ONE user-keyed exchange serves all three readouts — no
    // Expand-based multi-distinct, no second scan
    assert(plan("events_dau_mau").indexOf("Expand") < 0,
      "events_dau_mau planned an Expand multi-distinct")
    assert(exchanges("events_dau_mau") <= 2,
      "events_dau_mau pays more than the user exchange + final rollup")
    // replication lag: the census is domain-sized; the window partitions
    // by table (never partition-less — suite invariant) and the per-op
    // frame never sorts
    assert(windows("cdc_replication_lag") == 1,
      "cdc_replication_lag window count drifted")
    // rapid-repeat: type filter reaches the scan
    assert(plan("events_rapid_repeat").contains("PushedFilters") &&
      plan("events_rapid_repeat").contains("EqualTo(event_type,purchase)"),
      "events_rapid_repeat type filter not pushed to the scan")
  }

  test("round-9 TPC-H completions keep their designed shapes") {
    def sparkPlanOf(name: String) =
      SparkEntry.queries(name)(spark, sfTiny).queryExecution.sparkPlan
    def windows(name: String): Int = sparkPlanOf(name).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.size
    def exchanges(name: String): Int = sparkPlanOf(name).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    // Q4: the correlated late-line predicate rides the SEMI-JOIN
    // condition (never a post-join filter over materialized matches)
    val q4 = plan("q4_priority_exists")
    assert(q4.contains("LeftSemi"), "q4_priority_exists lost the semi join")
    assert(q4.contains("PushedFilters") && q4.contains("o_orderdate"),
      "q4_priority_exists quarter window not pushed to the orders scan")
    // Q6: the floor query — all three predicates reach the reader, no
    // join, no window, one global aggregate
    val q6 = plan("q6_forecast_revenue")
    // the PushedFilters list is TRUNCATED in plan toString — assert the
    // pushdown started (IsNotNulls + first range bound) and that the
    // post-scan Filter carries all three predicates in full
    assert(q6.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "q6_forecast_revenue lost scan pushdown")
    for (f <- Seq(">= 0.05", "<= 0.07", "< 24.0", ">= 1996-01-01"))
      assert(q6.contains(f), s"q6_forecast_revenue lost predicate: $f")
    assert(!q6.contains("Join") && windows("q6_forecast_revenue") == 0,
      "q6_forecast_revenue grew a join or window")
    // Q9: both dim legs broadcast at this SF; profit folds into the scan
    // projection (no post-agg recompute)
    assert(plan("q9_nation_profit").contains("BroadcastHashJoin"),
      "q9_nation_profit dim legs no longer broadcast")
    // Q12: one orderkey exchange serves the join + 3-group census
    assert(exchanges("q12_shipmode_priority") <= 3,
      "q12_shipmode_priority grew extra exchanges")
    // Q20: ONE fact exchange — the (partkey, suppkey) aggregate rides the
    // repartition(partkey) by subset clustering and the per-part total is
    // a WINDOW over the same partitioning (no self-join back)
    val q20 = sparkPlanOf("q20_excess_suppliers")
    val q20FactExchanges = q20.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.toString.contains("l_partkey") => e
    }.size
    assert(q20FactExchanges == 1,
      s"q20_excess_suppliers fact exchange count drifted: $q20FactExchanges")
    assert(windows("q20_excess_suppliers") == 1,
      "q20_excess_suppliers per-part total is no longer a window")
  }

  test("doc_tfidf rides one corpus exchange and a fused TopK heap") {
    // The r7→r9 carry-over's documented floor: corpus text moves through
    // exactly ONE doc_id repartition (the df branch ReusedExchanges it),
    // df is a vocab-sized broadcast, and the TopK heap fuses onto the
    // inherited partitioning with NO partial→final re-exchange (the
    // TopKPartialExec outputPartitioning fix). Exchanges in the final
    // plan: doc_id repartition + term agg (vocab-sized) + presentation
    // range — anything more is a regression.
    val df = SparkEntry.queries("doc_tfidf")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TopKPerGroup"), "doc_tfidf lost the native TopK heap")
    assert(p.contains("ReusedExchange"),
      "df branch no longer reuses the corpus exchange (corpus scans twice)")
    val hashX = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashX <= 3,
      s"doc_tfidf grew to $hashX hash exchanges (expected ≤3):\n$p")
  }

  test("graph_kcore peels with zero hash exchanges off the bucketed " +
      "adjacency landing") {
    // The r15 shape: the adjacency landing is CLUSTERED BY (src), so
    // every per-round degree aggregate inherits the scan's distribution
    // and the survivor semi-joins are broadcasts — the only exchanges
    // left are the three 1-row census gathers (SinglePartition) and the
    // 3-row presentation sort. A hash exchange appearing here means the
    // bucket metadata stopped reaching the scan and each round regained
    // its degree shuffle — at 100 TB, three full-edge-set shuffles.
    val df = SparkEntry.queries("graph_kcore")(spark, sfTiny)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange hashpartitioning"),
      s"kcore peel regained a degree shuffle:\n$p")
    assert(p.contains("Bucketed: true"),
      s"adjacency scans stopped reporting bucketed reads:\n$p")
  }

  test("iterative graph queries stay inside their job-floor budgets") {
    // kcore/BFS wall time is JOB COUNT (checkpoint sync points + broadcast
    // builds + AQE stages), not data — the r8/r9 floor work ground both to
    // a measured minimum (BFS: one pinned frontier per round — every
    // cheaper variant A/B'd and rejected in-source; kcore since r15 runs
    // off the bucketed adjacency landing with NO per-round pins at all:
    // the k head, one keep broadcast per round, and the census union).
    // Measured at sf0.01: kcore 6 (was 20 pre-landing), BFS 31. A round
    // gaining an extra checkpoint or a per-side broadcast build shows up
    // as +2/+4 here.
    val budgets = Seq("graph_kcore" -> 8, "graph_shortest_paths" -> 38)
    for ((name, budget) <- budgets) {
      SparkEntry.queries(name)(spark, sfTiny).queryExecution.toRdd.count()
      val c = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          c.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        SparkEntry.queries(name)(spark, sfTiny).queryExecution.toRdd.count()
        // listener bus is async; wait for the count to go quiet
        var prev = -1
        var spins = 0
        while (c.get != prev && spins < 20) {
          prev = c.get; Thread.sleep(250); spins += 1
        }
        assert(c.get <= budget,
          s"$name scheduled ${c.get} jobs (budget $budget) — a round grew " +
            "an extra checkpoint/broadcast job")
      } finally spark.sparkContext.removeSparkListener(l)
    }
  }

  test("declared-floor detectors keep their candidate-bounded shapes") {
    // doc_containment: the 8-token-gram candidate build IS the detector
    // (in-source note) — the verify side must stay candidate-narrowed:
    // the packed-gram build sits behind a broadcast left-semi on the
    // candidate ids, and the exact intersect stays the codegen kernel.
    val dc = SparkEntry.queries("doc_containment")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(dc.contains("sorted_intersect_count"),
      "doc_containment lost the codegen intersect")
    assert(dc.contains("LeftSemi"),
      "doc_containment verify side no longer candidate-narrowed")
    // events_sliding_distinct: the ×(window/step) word expansion is the
    // declared exact-distinct trade; the expansion must multiply WORDS
    // (post-aggregate). The measured-floor plan is 5 hash exchanges: the
    // (type,h,w) partial chain + its event_type repartition, the pruned
    // hours twin of that chain + ITS repartition (column pruning splits
    // the subtrees, so no ReusedExchange — the pinned-frame alternative
    // was A/B'd and lost, note in-source), and the hours distinct. A 6th
    // exchange means the expansion stopped riding the word partials.
    val esd = SparkEntry.queries("events_sliding_distinct")(spark, sfTiny)
    esd.collect()
    val p = esd.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val hashX = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashX <= 5,
      s"events_sliding_distinct grew to $hashX exchanges — the expansion " +
        s"stopped riding the word partials:\n$p")
  }

  test("round-10 additions keep their designed shapes") {
    def sparkPlanOf(name: String) =
      SparkEntry.queries(name)(spark, sfTiny).queryExecution.sparkPlan
    def exchanges(name: String) = sparkPlanOf(name).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    def windows(name: String) = sparkPlanOf(name).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // agg_weighted_median: ONE fact exchange — raw rows repartition by
    // (flag, shard) and census/window/shard-mass all ride it by subset
    // clustering; the intra-shard cumulative is a 2-key window (never the
    // 3-partition per-flag cliff)
    val wm = sparkPlanOf("agg_weighted_median").toString
    assert(wm.contains("hashpartitioning(l_returnflag") &&
      wm.contains("shard"),
      s"agg_weighted_median lost the (flag, shard) fact repartition:\n$wm")
    assert(windows("agg_weighted_median")
      .exists(_.partitionSpec.size == 2),
      "agg_weighted_median intra-shard window is no longer 2-key sharded")
    assert(exchanges("agg_weighted_median").size <= 4,
      "agg_weighted_median grew extra exchanges")
    // orders_backlog (r14): the order⋈lineitem pairing is a
    // ZERO-EXCHANGE merge join over the co-bucketed landing — the
    // per-order aggregate and both join inputs inherit the scan's
    // HashPartitioning, so no exchange (and no union re-shuffle, the
    // r10 shape this replaced) appears anywhere below the join
    val ob = sparkPlanOf("orders_backlog")
    val obJoins = ob.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(obJoins.nonEmpty,
      "orders_backlog lost the co-bucketed merge join")
    val obBelowJoin = obJoins.head.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(obBelowJoin.isEmpty,
      s"orders_backlog's bucketed pairing regained an exchange:\n$ob")
    // q16_supp_variety: zero windows (the per-suppkey deny window is
    // gone), both reductions broadcast BEFORE the only fact exchange
    assert(windows("q16_supp_variety").isEmpty,
      "q16_supp_variety regained the per-suppkey window exchange")
    val q16 = sparkPlanOf("q16_supp_variety").toString
    assert("BroadcastHashJoin".r.findAllIn(q16).length >= 2,
      "q16_supp_variety deny-list/part joins stopped broadcasting")
    assert(exchanges("q16_supp_variety").size <= 4,
      "q16_supp_variety grew extra exchanges")
    // cdc_debezium_envelope: encode→parse→normalize is map-side; the only
    // hash exchange is the user-keyed apply aggregate. sparkPlan has NO
    // exchanges (EnsureRequirements inserts them at executedPlan time and
    // this query has no explicit repartition), so pin the executed tree.
    val dbzPlan = SparkEntry.queries("cdc_debezium_envelope")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    val dbzHashX = "Exchange hashpartitioning".r.findAllIn(dbzPlan).length
    assert(dbzHashX <= 1,
      s"cdc_debezium_envelope grew hash exchanges: $dbzHashX\n$dbzPlan")
    // the envelope must encode once and decode once: an inner registry
    // join used to infer isnotnull(schema_id) and push a
    // from_json-recomputing Filter below the decode projection (a second
    // full JSON pass per row). One from_json site in the plan = one pass.
    val dbzParses = "from_json".r.findAllIn(dbzPlan).length
    assert(dbzParses == 1,
      s"cdc_debezium_envelope decodes the envelope $dbzParses times " +
        s"(the registry-join null filter is back?):\n$dbzPlan")
    // cdc_ddl_evolution (r11): the LWW election is a mergeable argmax
    // AGGREGATE (map-side combinable), never a window stack that
    // shuffles the whole resolved log into per-key sorts
    assert(windows("cdc_ddl_evolution").isEmpty,
      "cdc_ddl_evolution regained a WindowExec (argmax aggregate gone)")
    // cdc_avro_apply (r14): the native decode runs ONCE per message and
    // stays INSIDE whole-stage codegen (no interpreted fallback, no
    // second decode pushed below the projection); the only hash exchange
    // is the user-keyed apply aggregate, same shape as the JSON twin.
    val avroDf = SparkEntry.queries("cdc_avro_apply")(spark, sfTiny)
    avroDf.collect() // AQE: codegen stars only appear on the FINAL plan
    val avroPlan = avroDf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val avroDecodes = "avro_envelope_decode".r.findAllIn(avroPlan).length
    assert(avroDecodes == 1,
      s"cdc_avro_apply decodes the wire $avroDecodes times:\n$avroPlan")
    assert("Exchange hashpartitioning".r.findAllIn(avroPlan).length <= 1,
      s"cdc_avro_apply grew hash exchanges:\n$avroPlan")
    val avroScanLine = avroPlan.linesIterator
      .find(_.contains("avro_envelope_decode")).getOrElse("")
    assert(avroScanLine.replaceAll("^[\\s:+-]+", "").startsWith("*"),
      s"decode projection fell out of WholeStageCodegen: $avroScanLine")
  }

  test("cdc_e2e_pipeline's consumer view reads ONLY the pipeline table " +
      "(seed + delta files) — never the raw wire or the events table") {
    // The composed-row contract (r15): the maintained view's inputs are
    // the v0 seed files plus the apply commit's delta files resolved
    // through the CDF — delta-proportional by construction. A scan of
    // the binary landing, the events parquet, or a full post-apply
    // snapshot appearing here means the "incremental" view silently
    // became a full recompute.
    val df = SparkEntry.queries("cdc_e2e_pipeline")(spark, sfTiny)
    val files = df.inputFiles
    assert(files.nonEmpty, "consumer view resolved zero input files")
    val outside = files.filterNot(_.contains("graft_txe2e_"))
    assert(outside.isEmpty,
      s"view re-read outside the pipeline table: ${outside.take(3).mkString(", ")}")
  }

  test("CBO consumes ANALYZE FOR COLUMNS histograms: skewed-predicate " +
      "selectivity flips the broadcast decision (r14)") {
    // Equi-height histograms are the piece plain column stats (ndv/min/
    // max) cannot fake: a predicate on the SKEWED value `grp = 0` (90%
    // of rows) estimates at 1/ndv ≈ 12.5% under uniform assumption —
    // small enough to broadcast the filtered fact — but at ~90% once the
    // histogram records where the mass actually sits, pushing the
    // estimate over the broadcast threshold. Two IDENTICAL tables,
    // identical queries, identical confs; the ONLY difference is whether
    // ANALYZE ... FOR COLUMNS ran with histogram collection on. AQE is
    // disabled for the probe so the pin reads the cost-based choice, not
    // the runtime rescue.
    val db = "cbo_hist_db"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def mkSkew(name: String, hist: Boolean): Unit = {
      if (!spark.catalog.tableExists(s"$db.$name")) {
        spark.sql(
          s"""CREATE TABLE $db.$name USING parquet AS
             |SELECT id, IF(id % 10 < 9, 0L, 1L + id % 7) AS grp
             |FROM range(100000)""".stripMargin)
        val saved = spark.conf.getOption(
          "spark.sql.statistics.histogram.enabled")
        spark.conf.set("spark.sql.statistics.histogram.enabled",
          hist.toString)
        try spark.sql(
          s"ANALYZE TABLE $db.$name COMPUTE STATISTICS FOR COLUMNS grp, id")
        finally saved match {
          case Some(v) => spark.conf
            .set("spark.sql.statistics.histogram.enabled", v)
          case None => spark.conf
            .unset("spark.sql.statistics.histogram.enabled")
        }
      }
    }
    mkSkew("skew_nohist", hist = false)
    mkSkew("skew_hist", hist = true)
    if (!spark.catalog.tableExists(s"$db.probe_dim")) {
      spark.sql(s"""CREATE TABLE $db.probe_dim USING parquet AS
        |SELECT id FROM range(100000)""".stripMargin)
      spark.sql(s"ANALYZE TABLE $db.probe_dim COMPUTE STATISTICS")
    }
    def planOf(t: String): String = {
      val keys = Seq(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> (512 * 1024).toString)
      val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
      try {
        keys.foreach { case (k, v) => spark.conf.set(k, v) }
        spark.sql(
          s"""SELECT count(*) AS n FROM $db.$t s
             |JOIN $db.probe_dim d ON s.id = d.id
             |WHERE s.grp = 0""".stripMargin)
          .queryExecution.executedPlan.toString
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val without = planOf("skew_nohist")
    val withHist = planOf("skew_hist")
    assert(without.contains("BroadcastHashJoin"),
      s"uniform 1/ndv estimate should have broadcast the filtered " +
        s"side:\n$without")
    assert(!withHist.contains("BroadcastHashJoin"),
      s"histogram says grp=0 is 90% of the table — broadcasting it is " +
        s"the mis-plan the histogram exists to prevent:\n$withHist")
  }

  test("no query plans a partition-less (single-task) WindowExec") {
    // A window with an empty partitionSpec funnels every row through ONE
    // task — fine at |groups| rows, a straggler at 100 TB. The engine has
    // no legitimate use for one (global thresholds use checkpoint +
    // broadcast instead), so any appearance is a regression.
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val wins = fn(spark, sfTiny).queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(wins.isEmpty,
        s"$name plans a partition-less WindowExec (single task at any scale)")
    }
  }

  test("CBO consumes S30's ANALYZE stats: join reorder flips the plan " +
      "when stats are present, stays put when they are absent") {
    // the r11 verdict's What's-missing #5: catalog_stats proves ANALYZE
    // lands numbers in the catalog; this pins the optimizer READING them
    // — the same 3-table star query plans (orders ⋈ customer) ⋈ nation
    // as written without CBO, and (customer ⋈ nation) ⋈ orders once the
    // cost-based reorder sees the row counts (dims-first is the cheaper
    // intermediate). Temp views carry no catalog stats, so CBO-on over
    // them must NOT reorder — isolating stats presence as the cause.
    val db = graft.sources.Catalog.register(spark, sfTiny)
    for (t <- Seq("nation", "customer", "orders")) {
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      if (spark.sessionState.catalog.getTableMetadata(ident)
          .stats.forall(_.rowCount.isEmpty))
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS")
    }
    def q(o: String, c: String, n: String) =
      s"""SELECT count(*) AS cnt FROM $o o
         |JOIN $c c ON o.o_custkey = c.c_custkey
         |JOIN $n nn ON c.c_nationkey = nn.n_nationkey
         |WHERE nn.n_name = 'FRANCE'""".stripMargin
    def leafTables(sql: String, cbo: Boolean): Seq[String] = {
      val keys = Seq("spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled")
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      try {
        keys.foreach(k => spark.conf.set(k, cbo))
        spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
          .map(_.toString.split("\n").head)
          .map { s =>
            // identify leaves by a distinctive COLUMN (temp-view leaves
            // print columns, not names — and c_nationkey contains "nation")
            Seq("o_orderkey" -> "orders", "c_custkey" -> "customer",
              "n_regionkey" -> "nation")
              .collectFirst { case (c, t) if s.contains(c) => t }
              .getOrElse(s)
          }
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val cat = q(s"$db.orders", s"$db.customer", s"$db.nation")
    val off = leafTables(cat, cbo = false)
    val on = leafTables(cat, cbo = true)
    assert(off == Seq("orders", "customer", "nation"),
      s"without CBO the written order should hold, got $off")
    assert(on == Seq("customer", "nation", "orders"),
      s"with CBO + stats the dims should join first, got $on")
    // stat-less temp views: CBO on, but nothing to consume — no reorder
    for (t <- Seq("nation", "customer", "orders"))
      spark.read.parquet(s"$sfTiny/$t.parquet")
        .createOrReplaceTempView(s"cbo_raw_$t")
    val raw = leafTables(
      q("cbo_raw_orders", "cbo_raw_customer", "cbo_raw_nation"), cbo = true)
    assert(raw == Seq("orders", "customer", "nation"),
      s"CBO without stats must keep the written order, got $raw")
  }

  test("every plan reaches WholeStageCodegen") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // execute first: under AQE the codegen stages only appear once the
      // adaptive plan is finalized
      val df = fn(spark, sfTiny)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // metadata-only statements (SHOW PARTITIONS et al.) legitimately
      // plan as a driver-computed LocalTableScan — there is no data
      // plane to codegen, which is the point of serving them from the
      // log. Everything with a real scan must still codegen.
      val metadataOnly = p.linesIterator.forall(l =>
        !l.contains("FileScan") && !l.contains("Exchange hashpartitioning"))
      assert(p.contains("*(") || metadataOnly,
        s"$name has no WholeStageCodegen stage:\n$p")
    }
  }

  test("sql_q5 streams LINEITEM and broadcasts everything else — the " +
      "fact table is never a broadcast build side") {
    // r12 verdict task 2: the customer-first TPC-H text let Catalyst
    // take the c⋈o subtree as the stream side and broadcast
    // column-pruned lineitem wholesale (a 2x slowdown at sf0.1 and a
    // non-plan at 100 TB). The fact-first FROM order pins the
    // stream-lineitem shape; this test fails if the text (or a future
    // Spark version's reordering) regresses it.
    // AQE off so the join operators are collectible (the established
    // PlanSpec idiom); the text-order-driven join shape is identical
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joins = SparkEntry.queries("sql_q5")(spark, sfTiny)
        .queryExecution.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins
            .BroadcastHashJoinExec => j
        }
      assert(joins.nonEmpty, "sql_q5 lost its broadcast joins")
      joins.foreach { j =>
        val buildSide = if (j.buildSide.toString.contains("Left")) j.left
          else j.right
        assert(!buildSide.toString.contains("lineitem.parquet"),
          s"sql_q5 broadcasts the lineitem fact table:\n$j")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }
}
