package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression suite: every registered query must keep the physical
  * plan properties that make it viable at scale — no cartesian products
  * (1-row broadcast NLJ excepted), pushed filters on selective scans, top-k
  * folded to TakeOrderedAndProject.
  */
class ExplainAudit extends AnyFunSuite {
  import TestSpark._

  /** Audits must see the RAW construction: drop every cached plan (other
    * suites legitimately memoize shared fragments) so nothing resolves
    * through an InMemoryTableScan, and bypass fragment memoization so
    * building the query registers no new cache entries.
    */
  private def raw[T](body: => T): T = {
    Caches.clear(spark)
    spark.catalog.clearCache()
    Caches.bypassed(body)
  }

  private def plan(name: String): String =
    raw(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString)

  test("no query plans a CartesianProduct") {
    raw {
      SparkEntry.queries.keys.foreach { name =>
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n${p.take(2000)}")
      }
    }
  }

  test("selective scans push filters into parquet") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(!p.contains("l_comment"), "q02 reads columns it doesn't need")
  }

  test("top-k queries fold to TakeOrderedAndProject") {
    assert(plan("pipe_ann_brute").contains("TakeOrderedAndProject"))
    assert(plan("q03_shipping_priority").contains("TakeOrderedAndProject"))
  }

  test("JQL history operators: changelog membership is a hash join, scan stays narrow") {
    val p = plan("jql_was")
    // the WAS marker lowers to the same membership-join machinery as
    // issuesInEpic — a keyed hash/sort-merge join, never a nested loop
    assert(p.contains("Join") &&
      (p.contains("HashJoin") || p.contains("SortMergeJoin")),
      s"jql_was membership join shape:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "history membership must not plan an NLJ")
    // the changelog derivation reads only the four orders columns it needs
    assert(!p.contains("o_comment") && !p.contains("o_totalprice"),
      "statusHistory scan reads columns it doesn't need")
  }

  test("biased walk corpus: per-walk windows, no single-partition exchange") {
    val p = plan("graph_walk_corpus_biased")
    // the cumulative-weight pick must stay partitioned by walk id — a global
    // (empty-partition) window would serialize the whole candidate frame
    assert(!p.contains("Exchange SinglePartition"),
      s"biased walk plans a global exchange:\n${p.take(2000)}")
    val pSampled = plan("graph_stress_sampled")
    assert(!pSampled.contains("Exchange SinglePartition"),
      "sampled stress census must never gather to one partition")
  }

  test("gap fill: generator-built grid, per-user window, user+day-keyed join") {
    val p = plan("stream_gap_fill")
    // the day grid must come from a generator explode over the per-user
    // span, never a calendar crossJoin
    assert(p.contains("Generate"), s"grid lost its generator:\n${p.take(2000)}")
    // the forward fill is a per-user window — a global one would single-task
    // the whole resampled corpus (also pinned suite-wide)
    assert(p.contains("Window"), "fill lost its window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"grid join degenerated to a product:\n${p.take(2000)}")
  }

  test("link predict: wedge census is an equi-join, top-k folds") {
    val p = plan("graph_link_predict")
    // the Σ deg² wedge self-join must stay a single equi-key exchange on
    // the wedge center — a nested loop here is quadratic in NODES
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"wedge join shape:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must fold, not globally sort")
  }

  test("JQL membership joins are hash joins, not nested loops") {
    val p = plan("jql_epic_members")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("broadcast NLJ appears only with a literal 1-row build side") {
    // pipe_ann_brute crossJoins a single query vector — the one sanctioned NLJ
    val p = plan("pipe_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("minhash signatures fold per row: no doc_id exchange at all") {
    // the 16 min-hashes are array_min folds over each doc's materialized
    // digest array — signature computation is map-only, so the FIRST
    // exchange in the plan is the (band, sig) candidate join itself. A
    // doc_id hash exchange would mean shingles are being exploded and
    // re-aggregated again.
    val p = plan("pipe_dedup_minhash")
    assert(!p.contains("Exchange hashpartitioning(doc_id"),
      s"signature computation should not shuffle on doc_id:\n${p.take(2000)}")
    // the digest array must materialize in its own projection, not be
    // inlined 16 times into the band structs (one md5 pass per shingle)
    assert(p.contains("AS harr"), "expected a materialized digest-array projection")
  }

  test("simhash signature folds per row: no exchange before the bucket join") {
    // SimhashSig computes the 60-bit signature in one map-side loop; the
    // first exchange must be the (c, ck) chunk-bucket candidate join. A
    // doc_id exchange would mean words are being exploded and re-aggregated.
    val p = plan("pipe_dedup_simhash")
    assert(!p.contains("Exchange hashpartitioning(doc_id"),
      s"signature computation should not shuffle on doc_id:\n${p.take(2000)}")
    assert(p.contains("simhashsig") || p.contains("SimhashSig"),
      "expected the native SimhashSig expression in the plan")
  }

  test("IVF assignment is map-side: no vec_id exchange, no ×C row explosion") {
    // centroids are inlined as a literal array and the argmax folds per row,
    // so the corpus is never shuffled on vec_id for assignment (the probe's
    // tiny windows — 8 centroids / 20 queries — are the only rank steps)
    val p = plan("pipe_ann_ivf")
    assert(!p.contains("Exchange hashpartitioning(vec_id"),
      s"IVF assignment regressed to a per-vector window shuffle:\n${p.take(2000)}")
  }

  test("epic grouping is one aggregate: no window sort, no self-join") {
    // MinK folds the 20-smallest-keys sample into the SAME hash aggregate as
    // the count — a window rank or a counts⨝samples join would mean the
    // corpus is being range-sorted or scanned twice again
    val p = plan("epic_grouping")
    assert(!p.contains("Window"), s"epic_grouping regressed to a window rank:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"epic_grouping regressed to a two-agg join:\n${p.take(2000)}")
    assert(p.contains("min_k"), "expected the MinK aggregate in the plan")
  }

  test("grouping-set aggregates are one Expand + one aggregate pass, no join") {
    // cube/rollup/pivot all lower to a single (partial → final) hash
    // aggregate; a join or window would mean subtotals are computed by
    // re-scanning the fact table
    Seq("q09_cube", "agg_rollup_hier", "agg_pivot_matrix").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Join"), s"$name re-scans via a join:\n${p.take(2000)}")
      assert(!p.contains("Window"), s"$name uses a window:\n${p.take(2000)}")
      assert(name == "agg_pivot_matrix" || p.contains("Expand"),
        s"$name lost its Expand lowering")
    }
  }

  test("second-moment stats are one scan, one aggregate — no built-in corr") {
    // the six decimal power sums ride ONE partial/final aggregate; the
    // closed-form stddev/corr math is pure projection afterward
    val p = plan("agg_stats_moments")
    assert(!p.contains("Join"), s"moments joins:\n${p.take(2000)}")
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"moments scans lineitem more than once:\n${p.take(2000)}")
  }

  test("tfidf ranks via a window; df join is a real join, not an NLJ") {
    val p = plan("pipe_text_tfidf")
    assert(p.contains("Window"), "tfidf lost its row_number ranking")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "tfidf's word-keyed df join vanished")
  }

  test("gopher dominance is two hash aggregates, not a per-row nested scan") {
    val p = plan("pipe_gopher_rules")
    // explode → (doc, word) count → per-doc max: both levels hash aggregates
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("Generate explode"), "dominance must explode words")
    assert(!p.contains("Window"), "no window machinery in the gate")
  }

  test("length histogram is one scan to a tiny aggregate — no join") {
    val p = plan("pipe_len_histogram")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("HashAggregate"))
  }

  test("pq encode is map-side: no Generate, no Window; search is top-k") {
    val p = plan("pipe_ann_pq")
    assert(!p.contains("Generate"), "PQ encode must not explode rows")
    assert(!p.contains("Window"), "PQ encode must not window-shuffle")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("ivfpq: probe is a literal cell filter, assign+encode in one scan") {
    val p = plan("pipe_ann_ivfpq")
    assert(!p.contains("Generate") && !p.contains("Window"), p.take(2000))
    // the probe is a literal IN filter on the (inlined) cell-id expression,
    // pushed into the scan-stage Filter — never a join against a probe table
    assert(p.contains("IN ("), "cell probe must be a literal IN filter")
    // the ADC lookup table is computed on the driver from the collected
    // codebook and inlined as element_at literals — the four broadcast lut
    // joins this card used to plan are gone, and nothing may bring a join
    // back into the cell-pruned scan stage
    assert(!p.contains("Join"), s"ivfpq must plan no join:\n${p.take(2000)}")
    assert(p.contains("element_at"), "lut must be inlined literals")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("pack/shuffle prefix sums are bucketed windows, never single-partition") {
    // the global running sum / rank is computed per range-bucket (pid) with
    // broadcast cumulative bases — a windowspecdefinition whose first column
    // is the order key would be the old whole-corpus single-task WindowExec
    Seq("pipe_pack_sequences", "pipe_shuffle").foreach { n =>
      val p = plan(n)
      assert(p.contains("windowspecdefinition(pid"),
        s"$n lost its bucketed window:\n${p.take(2000)}")
      assert(!p.contains("windowspecdefinition(doc_id") &&
        !p.contains("windowspecdefinition(hkey"),
        s"$n plans a global (single-partition) window:\n${p.take(2000)}")
    }
  }

  test("table stats push COUNT/MIN/MAX into the parquet scan (footer-only)") {
    val p = plan("meta_table_stats")
    assert(p.contains("PushedAggregation: [COUNT(*)"), p.take(2000))
  }

  test("stateful CDC plans a grouped-state operator, enrichment is a hash join") {
    // batch mode lowers flatMapGroupsWithState to MapGroups (empty state);
    // the streaming plan's FlatMapGroupsWithStateExec is pinned by StreamSpec
    val sp = plan("stream_stateful_changes")
    assert(sp.contains("MapGroups") || sp.contains("FlatMapGroupsWithState"))
    val p = plan("cdc_state_enrich")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("hybrid retrieval: both legs fold to top-k, fusion never sorts the corpus") {
    // each leg must reduce via TakeOrderedAndProject BEFORE its rank window
    // (the windows themselves are allowlisted below with their 50-row
    // bound); a global Sort would mean a corpus-sized ranking
    val p = plan("pipe_search_hybrid")
    assert(p.contains("TakeOrderedAndProject"),
      s"legs must top-k via TakeOrderedAndProject:\n${p.take(2000)}")
    // BM25's corpus stats (df / N / Σdl) ride broadcasts into the scoring
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "BM25 statistics must broadcast, not shuffle the corpus")
  }

  test("filtered ANN pushes the predicate into the scan and folds to top-k") {
    // raw() guarantees a parquet scan (no cached-relation substitution), so
    // the predicate must appear in the pushed-filter list — no fallback
    val p = plan("pipe_ann_filtered")
    assert(p.contains("PushedFilters: [IsNotNull(label)") ||
      p.contains("EqualTo(label,1)"),
      s"label predicate must reach the parquet scan:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("line dedup: census + flag are hash aggregates/joins, no window") {
    // the segment frequency census must be a (partial -> final) hash
    // aggregate on the segment hash and the per-doc reassembly a hash
    // aggregate — a Window or a global Sort before the final ORDER BY
    // would mean the corpus is being moved through one task again
    val p = plan("pipe_dedup_lines")
    assert(!p.contains("Window"), s"line dedup planned a window:\n${p.take(2000)}")
    assert(p.contains("HashAggregate"), "census/reassembly must hash-aggregate")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "flag join must be a hash/merge join")
  }

  test("span dedup: window-free census + hash flag join, like line dedup") {
    val p = plan("pipe_dedup_spans")
    assert(!p.contains("Window"), s"span dedup planned a window:\n${p.take(2000)}")
    assert(p.contains("HashAggregate"), "census must hash-aggregate")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "flag join must be a hash/merge join")
  }

  test("dsir: pool filter pushed to scan, ratio table broadcast, no window") {
    val p = plan("pipe_select_dsir")
    // scoring only reads the pool: the source<>target predicate must reach
    // the parquet scan, not filter post-explode
    assert(p.contains("Not(EqualTo(source,src0))"),
      s"pool predicate must be pushed into the scan:\n${p.take(2000)}")
    // the 256-row log-ratio table rides a broadcast; scoring is map-side
    assert(p.contains("BroadcastHashJoin"), "scoring join must be broadcast")
    assert(!p.contains("Window"), s"dsir planned a window:\n${p.take(2000)}")
  }

  test("funnel is a chain of per-user hash aggregates and joins, no window") {
    val p = plan("stream_funnel")
    assert(!p.contains("Window"), s"funnel planned a window:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("retention deduplicates (user, week) before the cohort join") {
    // the distinct must sit below the join in the plan: the join input is
    // users x weeks, never raw events
    val p = plan("stream_retention_cohorts")
    assert(!p.contains("Window"))
    val joinAt = p.indexOf("Join")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(joinAt >= 0 && lastAgg > joinAt,
      "expected aggregates (incl. the week dedup) below the cohort join")
  }

  test("quality calibration windows are partitioned by source") {
    val p = plan("pipe_quality_calibrated")
    assert(p.contains("windowspecdefinition(source"),
      s"calibration window must partition by source:\n${p.take(2000)}")
  }

  test("leakage-safe split adds no shuffle beyond cluster resolution") {
    // the split itself is a map-side hash-mod projection on the cluster
    // label; no window, no extra aggregate past the resolve machinery
    val p = plan("pipe_split_leakage_safe")
    assert(!p.contains("Window"), s"split planned a window:\n${p.take(2000)}")
  }

  test("rerank: shortlist folds to top-k, raw-vector fetch is a broadcast join") {
    val p = plan("pipe_ann_rerank")
    // both stages LIMIT-bound: ADC shortlist and final exact-cosine top-10
    assert(p.contains("TakeOrderedAndProject"),
      s"rerank must top-k, not globally sort:\n${p.take(2000)}")
    // the 50-row shortlist must broadcast into the full-precision fetch —
    // a shuffled join here would exchange the corpus to read 50 vectors
    assert(p.contains("BroadcastHashJoin"),
      s"shortlist fetch must be a broadcast join:\n${p.take(2000)}")
  }

  test("corpus diff is one full-outer join over map-side fingerprints") {
    val p = plan("pipe_corpus_diff")
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n${p.take(2000)}")
    // exactly one join in the whole plan — fingerprints are map-side
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(p).size
    assert(joins == 1, s"expected 1 join, found $joins:\n${p.take(2000)}")
    assert(!p.contains("Window"))
  }

  test("quality sweep is one aggregate over a broadcast threshold dim") {
    val p = plan("pipe_quality_sweep")
    assert(!p.contains("Window"), s"sweep planned a window:\n${p.take(2000)}")
    // threshold dim and totals ride broadcasts; the curve is ONE keyed
    // hash aggregate (partial + final), never nine filtered scans
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("HashAggregate"))
  }

  test("budget sample: prefix-sum window is partitioned by source, alloc broadcast") {
    val p = plan("pipe_budget_sample")
    assert(p.contains("windowspecdefinition(source"),
      s"prefix sum must partition by source:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      "the allocation table must broadcast into the doc join")
  }

  test("intra-doc paragraph dedup is map-only: one scan, no join/window/explode") {
    // the whole dedup is array_distinct inside a projection — the cheapest
    // plan in the engine; anything heavier is a regression
    val p = plan("pipe_dedup_paragraph")
    assert(!p.contains("Join"), s"paragraph dedup planned a join:\n${p.take(2000)}")
    assert(!p.contains("Window"), s"paragraph dedup planned a window:\n${p.take(2000)}")
    assert(!p.contains("Generate"), s"paragraph dedup exploded rows:\n${p.take(2000)}")
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"paragraph dedup scans documents more than once:\n${p.take(2000)}")
  }

  test("classifier AUC ranks without a global sort: bucketed prefix window") {
    val p = plan("pipe_classifier_auc")
    assert(p.contains("windowspecdefinition(pid"),
      s"AUC lost its bucketed prefix-sum window:\n${p.take(2000)}")
    assert(!p.contains("windowspecdefinition(score"),
      s"AUC regressed to a global score-ordered window:\n${p.take(2000)}")
  }

  test("curriculum ranks via bucketed windows, never a global order") {
    val p = plan("pipe_curriculum")
    assert(p.contains("windowspecdefinition(pid"),
      s"curriculum lost its bucketed rank window:\n${p.take(2000)}")
    assert(!p.contains("windowspecdefinition(band, hkey") &&
      !p.contains("windowspecdefinition(hkey"),
      s"curriculum plans a global (single-partition) rank:\n${p.take(2000)}")
  }

  test("salted join shuffles on (key, salt) through a real shuffle join") {
    // the salt must reach the exchange keys — that's the whole mechanism —
    // and the join must stay on the shuffle path (broadcast would hide it)
    val p = plan("meta_salted_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"salted join lost its shuffle join:\n${p.take(2000)}")
    assert("Exchange hashpartitioning\\([^)]*salt".r.findFirstIn(p).isDefined,
      s"salt is not a shuffle key:\n${p.take(2000)}")
    assert(p.contains("Generate explode"),
      "dim-side ×salt replication must be an explode")
  }

  test("no registered query windows the corpus through a single partition") {
    // A logical Window with an EMPTY partition spec executes as one
    // WindowExec task holding every input row — the classic silent
    // scale-killer ("WARN WindowExec: No Partition Defined"). The only
    // sanctioned uses are windows whose input is bounded BY CONSTRUCTION
    // (row count independent of corpus size), listed here with the bound.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // name -> (exact number of sanctioned global windows, the input bound).
    // EMPTY since r15: the last seven sanctioned sites (len_histogram ×2,
    // ann_ivf probe, search_hybrid's two top-k ranks, active_users' and
    // late_arrivals' cumulative sums — all bounded-by-construction inputs)
    // now partition by the non-foldable constant `pmod(col, 1)`: the same
    // single partition, identical ranks/sums, but a NON-empty spec, so the
    // planner no longer logs "WARN WindowExec: No Partition Defined" on
    // every (re)plan. Any future empty-spec window fails here.
    val boundedInputs = Map.empty[String, (Int, String)]
    val offenders = raw {
      SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
        val globals = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        val allowed = boundedInputs.get(name).map(_._1).getOrElse(0)
        if (globals.size == allowed) None
        else Some(s"$name: expected $allowed global window(s), found " +
          s"${globals.size}: " +
          globals.map(_.windowExpressions.mkString(", ")).mkString("; "))
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned-Window count drifted from the sanctioned bounds:\n" +
        offenders.mkString("\n"))
  }
}
