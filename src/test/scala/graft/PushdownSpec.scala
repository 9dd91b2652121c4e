package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression tests for the scale properties the engine
  * relies on: projection pruning and predicate pushdown must reach the
  * parquet scan, dimension joins must broadcast, top-k must never global-
  * sort, and aggregations must combine map-side. These are the plan shapes
  * that decide whether a query survives a 100× scale-up — asserted here so
  * a refactor can't silently regress them.
  */
class PushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Column lists of every ReadSchema in `p` — GREEDY to the line's last
    * '>': nested generics (array<double>) close with '>' too, and a lazy
    * match truncates the schema at the first one, hiding every column
    * after the first array-typed column from the assertions. */
  private def readSchemas(p: String): Seq[String] =
    "ReadSchema: struct<(.*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq

  private def firstReadSchema(p: String): String =
    readSchemas(p).headOption.getOrElse("")

  test("projection pruning: p1's parquet scan reads only the projected columns") {
    val p = plan("p1_schema_projection")
    val readSchema = readSchemas(p).headOption
    assert(readSchema.isDefined, s"no ReadSchema in plan:\n$p")
    val cols = readSchema.get.split(",").map(_.split(":")(0).trim).toSet
    assert(!cols.exists(_.startsWith("o_comment")) && cols.size <= 6,
      s"scan reads too many columns: $cols")
  }

  test("predicate pushdown: a key filter reaches the scan as PushedFilters") {
    val df = graft.core.Tables.orders(spark, sf).filter(col("o_custkey") === 42L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(o_custkey,42)"),
      s"filter not pushed to parquet scan:\n$p")
  }

  test("dimension join broadcasts: j4's plan contains BroadcastHashJoin") {
    assert(plan("j4_broadcast_brand_revenue").contains("BroadcastHashJoin"))
  }

  test("top-k never global-sorts: o2 uses TakeOrderedAndProject") {
    val p = plan("o2_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"o2 plan:\n$p")
  }

  test("partition pruning: a partition-key filter reaches the scan as PartitionFilters") {
    // hive-style partitioned layout — the 100 TB table layout where a
    // date/source predicate must prune directories, not filter rows
    val dir = java.nio.file.Files.createTempDirectory("graft_pp_").toString
    graft.core.Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("o_orderstatus"),
      s"partition filter not pruning directories:\n$p")
    // the row-level PushedFilters must NOT carry the partition predicate
    // (it's resolved at planning, zero data read outside the partition)
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(!pushed.contains("o_orderstatus"), s"partition key leaked into row filters: $pushed")
  }

  test("t8 broadcasts the benchmark shingle side") {
    // the decontamination join must ship the (tiny) benchmark set to the
    // corpus, never shuffle the corpus by shingle
    assert(plan("t8_decontaminate").contains("BroadcastHashJoin"),
      "benchmark side not broadcast in t8")
  }

  test("e5 keeps its ADC scoring join broadcast + its top-k partial") {
    val p = plan("e5_pq_adc_topk")
    // per-query LUTs broadcast to the codes side (never shuffle the corpus
    // codes by query)...
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"e5 lost its broadcast scoring join:\n$p")
    // ...and the per-query top-k aggregates map-side, so only
    // |Q|·partitions·k candidate rows shuffle
    assert(p.toLowerCase.contains("partial_boundedtopk")
      || (p.contains("ObjectHashAggregate") && p.contains("partial")),
      s"e5 lost its map-side partial top-k:\n$p")
  }

  test("e1/e4/e5 never scan more embedding columns than they use") {
    // per-query allowed read sets: e1 filters queries by label; e4/e5
    // select queries by vec_id and must not read label at all
    val allowed = Map(
      "e1_cosine_topk" -> Set("vec_id", "embedding", "label"),
      "e4_ann_ivf" -> Set("vec_id", "embedding"),
      "e5_pq_adc_topk" -> Set("vec_id", "embedding"))
    allowed.foreach { case (q, ok) =>
      val p = plan(q)
      val schemas = readSchemas(p)
      assert(schemas.nonEmpty, s"no ReadSchema in $q plan")
      schemas.foreach { sch =>
        val cols = sch.split(",").map(_.split(":")(0).trim).filter(_.nonEmpty).toSet
        assert(cols.subsetOf(ok), s"$q scan reads ${cols -- ok} beyond $ok")
      }
    }
  }

  test("d2's signature pipeline stays codegen: no interpreted higher-order funcs") {
    // the text kernels exist so the tokenize->shingle->signature hot loop
    // runs inside WholeStageCodegen; a refactor that reintroduces a
    // built-in transform/filter/aggregate lambda here silently falls back
    // to interpreted eval (the O(tokens^2) d11 regression of round 6)
    val df = SparkEntry.queries("d2_minhash_signature")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val p = df.queryExecution.executedPlan.toString
    for (hof <- Seq("transform(", "aggregate(", "array_filter", "zip_with(")) {
      assert(!p.toLowerCase.contains(hof),
        s"interpreted higher-order '$hof' back in d2's plan:\n$p")
    }
    // `*(n)` prefixes mark WholeStageCodegen spans in the final plan; the
    // signature Project must carry one
    assert("""\*\(\d+\) Project \[doc_id""".r.findFirstIn(p).isDefined,
      s"signature projection outside WholeStageCodegen:\n$p")
    assert(p.contains("portable_minhash60") && p.contains("word_shingles"),
      s"native kernels missing from d2's plan:\n$p")
  }

  test("d12's pair join buckets on the fingerprint — never a nested-loop plan") {
    // winnowing's scale contract: pairs form ONLY inside per-fingerprint
    // equi-join buckets (d3's shape); a refactor that loses the equi-key
    // (e.g. moving the a_id < b_id predicate into the join condition of a
    // non-equi join) degrades to BroadcastNestedLoop/Cartesian — all-pairs
    val df = SparkEntry.queries("d12_winnow_overlap")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin")) {
      assert(!p.contains(bad), s"$bad in d12's plan — all-pairs regression:\n$p")
    }
    // the fingerprint subtree is localCheckpoint'd (it feeds three
    // consumers), so the kernel itself is behind the ExistingRDD leaves;
    // assert it on the un-checkpointed fingerprint projection instead
    val fpPlan = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.winnowFingerprints(col("text"))).as("h"))
      .queryExecution.executedPlan.toString
    assert(fpPlan.contains("winnow_fps"), s"native winnow kernel missing:\n$fpPlan")
    // the shared-count aggregation must combine map-side
    assert(p.contains("partial_") || p.contains("partial "),
      s"no partial-mode aggregation in d12 plan:\n$p")
  }

  test("hot-bucket salting plan: dormant on cold data; _salt joins the shuffle key on a hot bucket") {
    // adaptive contract (SaltedJoin.hotOnlyPrecomputed): with no bucket
    // over the threshold the pair join must be the PLAIN equi-join —
    // zero salting overhead in the plan; with a planted hot bucket the
    // shuffle key must widen with _salt (bounding per-reducer pair
    // work) while staying an equi-join, never a nested loop
    import spark.implicits._
    val cold = graft.queries.Dedup.lshPairs(
      Seq((1L, "alpha beta gamma delta epsilon"), (2L, "one two three four five"))
        .toDF("doc_id", "text"))
    val coldPlan = cold.queryExecution.executedPlan.toString
    assert(!coldPlan.contains("_salt"),
      s"salting must be dormant without hot buckets:\n$coldPlan")
    val hotDocs = (0 until 300).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog tonight again"))
      .toDF("doc_id", "text")
    val hot = graft.queries.Dedup.lshPairs(hotDocs)
    val hotPlan = hot.queryExecution.executedPlan.toString
    assert(hotPlan.contains("_salt"),
      s"hot bucket must widen the join key with _salt:\n$hotPlan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!hotPlan.contains(bad), s"$bad in salted plan:\n$hotPlan")
  }

  test("aggregation combines map-side: a1 has partial HashAggregate below the exchange") {
    val p = plan("a1_customer_order_profile")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0, s"no hash exchange in a1 plan:\n$p")
    // final-mode aggregate above the exchange...
    assert(p.indexOf("HashAggregate", exchangeIdx) >= 0,
      "no merge aggregate above the shuffle")
    // ...and a partial-mode aggregate somewhere (map-side combine ran)
    assert(p.contains("partial_") || p.contains("partial "),
      s"no partial-mode aggregation in a1 plan:\n$p")
  }

  test("monitors stay cell-sized: a18 prunes + combines map-side, t23's vocab probe broadcasts") {
    // a18's SCALE claim: the scan reduces to |event_type|x7 cells
    // map-side — so a partial aggregate must run below the exchange, and
    // the events scan must read ONLY the three columns the monitor uses
    val p = plan("a18_psi_drift")
    assert(p.contains("partial_"),
      s"a18 lost its map-side partial aggregation:\n$p")
    val rs = firstReadSchema(p)
    assert(Seq("event_type", "ts", "value").forall(rs.contains),
      s"a18 scan missing a needed column: $rs")
    assert(!rs.contains("props") && !rs.contains("user_id") && !rs.contains("event_id"),
      s"a18 scan reads columns the monitor never uses: $rs")
    // t23's probe side is the K-row vocab — anything but a broadcast join
    // would shuffle the cell frame for a 16-row lookup
    val p23 = plan("t23_vocab_coverage")
    assert(p23.contains("BroadcastHashJoin"),
      s"t23's vocab probe must broadcast:\n$p23")
    for (bad <- Seq("SortMergeJoin", "ShuffledHashJoin"))
      assert(!p23.contains(bad), s"$bad in t23 plan:\n$p23")
  }

  test("session-additions keep their scale shapes: a19 pruned+partial, w13 one window exchange, e9 one rollup exchange, t24 equi-joins") {
    // a19's corpus-facing stage is behind its localCheckpoint, so pin
    // the mirrored inner frame: the daily count must partial-aggregate
    // map-side and the events scan must read ONLY (event_type, ts)
    val daily = graft.core.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val pa = daily.queryExecution.executedPlan.toString
    assert(pa.contains("partial_"), s"a19 daily frame lost map-side combine:\n$pa")
    val rsa = firstReadSchema(pa)
    assert(rsa.contains("event_type") && rsa.contains("ts") &&
      !rsa.contains("value") && !rsa.contains("props") && !rsa.contains("user_id"),
      s"a19 daily scan reads columns the monitor never uses: $rsa")
    // w13: the lag window is the ONE user_id exchange; the events scan
    // skips value/props (event_id rides only as the lag tiebreak)
    val pw = plan("w13_markov_transitions")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(pw).size == 1,
      s"w13 must plan exactly one user_id window exchange:\n$pw")
    val rsw = firstReadSchema(pw)
    assert(!rsw.contains("value") && !rsw.contains("props"),
      s"w13 scan reads columns the matrix never uses: $rsw")
    // e9: the centroid probe is the packed 1-row broadcast fold, so the
    // ONLY keyed exchange is the cluster_id rollup — the corpus never
    // hash-shuffles (spread's round-robin is the local-parallelism shim)
    val pe = plan("e9_cluster_silhouette")
    assert("Exchange hashpartitioning\\(".r.findAllIn(pe).size == 1 &&
      pe.contains("Exchange hashpartitioning(cluster_id"),
      s"e9 must shuffle only the cluster_id rollup:\n$pe")
    // t24: both count probes are equi-joins by construction — a plan
    // that degenerates to a nested loop would pair the corpus with the
    // whole vocab per row
    val pt = plan("t24_bigram_lm_score")
    for (bad <- Seq("BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!pt.contains(bad), s"$bad in t24 plan:\n$pt")
    assert(pt.contains("partial_"), s"t24 lost map-side combine:\n$pt")
  }

  test("e14 probes the persisted index only: pushed cell prune, zero corpus scans") {
    // the probe-only contract, in-plan: the ONLY parquet scan is the
    // index's inverted lists, pruned by the pushed probed-cell IN list
    // (row-group skipping); the corpus table is never rescanned — the
    // whole point of persisting the index.
    val p = plan("e14_ann_ivf_persisted")
    assert(p.contains("In(cid"),
      s"e14's probed-cell prune must push into the cells scan:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"e14 must not rescan the corpus — probe-only means index reads only:\n$p")
    assert(p.contains("graft_ivf"),
      s"e14's scan must read the persisted index:\n$p")
  }

  test("e13 runs all greedy MMR rounds in ONE plan: two corpus streams + pushed q-scan, no checkpoint remnants") {
    // the round-14 fuse's tripwire (replacing the old checkpoint-placement
    // guard): the five greedy rounds live inside a row-local expression,
    // so the physical plan must show exactly the THREE parquet scans the
    // design pays — the two corpus-sized streams (e1-shaped scoring pass,
    // shortlist enrich) plus the deliberately-unmaterialized query-side
    // re-scan (filter-pushed and tiny; e1/e12's documented posture) —
    // and NO materialized-RDD scans: a reappearing ExistingRDD means
    // someone reintroduced per-round checkpoints and the ~20-scheduler-
    // round shape this fuse deleted (5.61 → 1.61 s at sf0.1)
    val p = plan("e13_mmr_rerank")
    // PRIMARY guard: no materialized-RDD scans (a reappearing
    // ExistingRDD means per-round checkpoints came back). The scan
    // count is an UPPER bound, not an exact match — plan-string
    // formatting, AQE, or a benign extra metadata scan must not trip
    // the wire that exists to catch the checkpoint shape
    assert(!p.contains("ExistingRDD") && !p.contains("LocalTableScan"),
      s"e13 must not contain checkpoint remnants — greedy rounds are one expression:\n$p")
    val corpusScans = "FileScan".r.findAllIn(p).length
    assert(corpusScans <= 3,
      s"e13 must scan parquet at most 3 times (2 corpus streams + pushed q-side), found $corpusScans:\n$p")
  }

  test("e15's two-level probe scans parquet ONLY for the pruned lists — the validated metadata pair serves as local relations") {
    // the v8 probe-shape tripwire: probeCandidatesTwoLevel collects the
    // version-pinned (groups, centroids) pair ONCE for covering
    // validation and reuses those exact rows as local relations, so the
    // served plan must show (a) exactly one FileScan — the cell-pruned
    // inverted lists, (b) zero parquet re-reads of the metadata tables,
    // and (c) no shuffle exchange keyed on the groups join (the local
    // metadata side broadcasts). A second groups scan or a
    // gid-partitioned exchange means a refactor silently un-collapsed
    // the metadata side.
    val p = plan("e15_ann_ivf_two_level")
    val fileScans = "FileScan".r.findAllIn(p).length
    assert(fileScans <= 1,
      s"e15 must scan parquet once (the pruned cells scan), found $fileScans:\n$p")
    assert(p.contains("graft_ivf") && p.contains("In(cid"),
      s"e15's one scan must be the persisted index's lists with the pushed cell prune:\n$p")
    assert(!p.contains("hashpartitioning(gid"),
      s"the groups-side join must broadcast the local relation, never shuffle on gid:\n$p")
  }

  test("sql12 decorrelates both subqueries: LeftSemi + LeftAnti joins, no per-row subquery, no cartesian, top-k without global sort") {
    val p = plan("sql12_waiting_suppliers")
    assert(p.contains("LeftSemi"),
      s"the correlated EXISTS must plan as a LeftSemi join:\n$p")
    assert(p.contains("LeftAnti"),
      s"the correlated NOT EXISTS must plan as a LeftAnti join:\n$p")
    for (bad <- Seq("InSubqueryExec", "CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!p.contains(bad), s"$bad in sql12 plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"sql12's LIMIT must top-k, never global-sort:\n$p")
  }

  test("e16's ADC pass scans codes only — its ReadSchema excludes the ne vectors") {
    // the IVFPQ economics, in-plan: the cell-pruned ADC scan reads the
    // 16-int codes column and NEVER the 64-double ne vectors (parquet is
    // columnar — this is what makes the 100 TB ADC pass cheap); ne is
    // read only by the shortlist re-rank scan, which carries no codes.
    // Probe-only like e14: pushed cell prune, zero corpus scans.
    val p = plan("e16_ann_ivfpq_persisted")
    assert(p.contains("In(cid"),
      s"e16's probed-cell prune must push into the codes scan:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"e16 must not rescan the corpus — probe-only means index reads only:\n$p")
    val schemas = readSchemas(p)
    val codesScans = schemas.filter(_.contains("codes:"))
    assert(codesScans.nonEmpty, s"e16 must scan the persisted codes:\n$p")
    assert(codesScans.forall(!_.contains("ne:")),
      s"e16's ADC scan must not read the full-precision vectors:\n$codesScans\n$p")
    val neScans = schemas.filter(_.contains("ne:"))
    assert(neScans.nonEmpty && neScans.forall(!_.contains("codes:")),
      s"e16's re-rank scan must read ne without codes:\n$schemas\n$p")
  }

  test("e18's filtered probe pushes BOTH prunes into the index scan: In(cid) and the label predicate") {
    // the filtered-search economics: the metadata predicate must reach
    // the parquet scan BESIDE the probed-cell prune (pre-filtering — a
    // row that fails the filter is never decoded into the scoring join),
    // and like every persisted-index serve there is no corpus rescan
    // the 16-entry In(cid, ...) list overflows the default 100-char
    // metadata render and would truncate PushedFilters before the label
    // entry — widen the render for this assertion only, restoring
    // whatever was set before (unset = back to the session default),
    // never a hardcoded value that could clobber later tests
    val prevLen = spark.conf.getOption("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", 2000)
    val p = try plan("e18_ann_ivf_filtered")
    finally prevLen match {
      case Some(v) => spark.conf.set("spark.sql.maxMetadataStringLength", v)
      case None => spark.conf.unset("spark.sql.maxMetadataStringLength")
    }
    assert(p.contains("In(cid"),
      s"e18's probed-cell prune must push into the cells scan:\n$p")
    assert(p.contains("EqualTo(label,1)"),
      s"e18's metadata filter must push into the cells scan:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"e18 must not rescan the corpus — probe-only means index reads only:\n$p")
  }

  test("sql13 decorrelates the nested IN + correlated HAVING: semi joins and grouped aggregates, no per-row subquery") {
    // TPC-H Q20's nest is the deepest standard decorrelation: the IN
    // must become a LeftSemi join, the correlated scalar aggregate in
    // HAVING a grouped aggregate joined back on l_partkey — so the fact
    // table is read a bounded number of times with map-side combine,
    // and the p_name filter reaches the part scan
    val p = plan("sql13_part_promotion")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"sql13 must plan BOTH membership tests as semi joins:\n$p")
    for (bad <- Seq("InSubqueryExec", "CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!p.contains(bad), s"$bad in sql13 plan:\n$p")
    assert(p.contains("partial_sum"),
      s"sql13's quantity aggregates must combine map-side:\n$p")
    assert(p.contains("StringContains(p_name,an)"),
      s"sql13's part filter must push into the part scan:\n$p")
  }

  test("sql14 computes its thresholds as one-row scalar subqueries — never per group, never a cartesian") {
    // the Q11 shape: the HAVING-style filter compares each group against
    // scalar aggregates of the SAME CTE — Catalyst must plan those as
    // Subquery nodes executed once, with the grouped aggregate map-side
    // combined and the nation filter reaching its scan
    val p = plan("sql14_top_supplier_share")
    assert(p.contains("Subquery subquery"),
      s"sql14's thresholds must plan as one-row scalar subqueries:\n$p")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin", "InSubqueryExec"))
      assert(!p.contains(bad), s"$bad in sql14 plan:\n$p")
    assert(p.contains("partial_sum"),
      s"sql14's revenue aggregate must combine map-side:\n$p")
    assert(p.contains("LIKE NATION_1%"),
      s"sql14's nation filter must reach the nation scan:\n$p")
  }

  test("t31 terciles come from the histogram frame, never a doc-frame window") {
    // the scale contract: the CDF window's input is the per-(lang, score)
    // histogram AGGREGATE (distinct scores per language), not the doc
    // frame — an ntile over partitionBy(lang) would sort the head
    // language's entire corpus in one task at 100 TB. The scored frame is
    // checkpointed, so every Window left in this plan IS the CDF one.
    val qe = SparkEntry.queries("t31_perplexity_buckets")(spark, sf).queryExecution
    val lp = qe.optimizedPlan
    assert(!lp.toString.contains("ntile"),
      s"t31 regressed to a doc-frame ntile window:\n$lp")
    val wins = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, s"t31 lost its histogram CDF window:\n$lp")
    wins.foreach { w =>
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined,
        s"t31's window must consume the per-(lang, score) histogram " +
          s"aggregate, not doc rows:\n$w")
    }
    // and the cutoffs broadcast back — the doc-side bucket assignment is
    // a row-local compare after a broadcast join, no doc-frame shuffle
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      s"t31 cutoff join must broadcast:\n${qe.executedPlan}")
  }

  test("t26 spans stay bucketed and pruned; gr1's iteration history is checkpoint-cut") {
    // t26: the dup-fp position join is an equi-join on the 16-byte fp —
    // a nested-loop degeneration would pair every gram with every dup
    // fp; the corpus scan must read only (doc_id, text); the dup-fp
    // election combines map-side
    val pt = plan("t26_dup_span_removal")
    for (bad <- Seq("BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!pt.contains(bad), s"$bad in t26 plan:\n$pt")
    assert(pt.contains("partial_"), s"t26 dup-fp election lost map-side combine:\n$pt")
    // the corpus scan sits BEHIND t26's gram localCheckpoint (the a19
    // pattern), so pin the mirrored pre-checkpoint frame: tokenize +
    // explode + md5 must prune the documents scan to (doc_id, text)
    val inner = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 7)).as("i"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", slice(col("toks"), col("i"), lit(8)))).as("fp"))
    val rst = firstReadSchema(inner.queryExecution.executedPlan.toString)
    assert(rst.contains("doc_id") && rst.contains("text") &&
      !rst.contains("lang") && !rst.contains("source") && !rst.contains("n_chars"),
      s"t26 scan reads columns the spans never use: $rst")
    // gr1: ops/PageRank localCheckpoints edges once and ranks per round,
    // so the FINAL plan must contain no lineitem/orders rescans — the
    // only parquet scan left is the supplier dim, broadcast and pruned
    // to (s_suppkey, s_name). Without the cuts, round 3 would replan
    // (and re-shuffle) the entire iteration history.
    val pg = plan("gr1_supplier_centrality")
    assert("Scan parquet".r.findAllIn(pg).size == 1,
      s"gr1 final plan must rescan ONLY the supplier dim:\n$pg")
    assert(pg.contains("BroadcastHashJoin"),
      s"gr1 supplier dim join must broadcast:\n$pg")
    val rsg = firstReadSchema(pg)
    assert(rsg.contains("s_suppkey") && rsg.contains("s_name") &&
      !rsg.contains("s_address") && !rsg.contains("s_comment"),
      s"gr1 supplier scan reads columns the rank never uses: $rsg")
  }

  test("rank-filter window bounds map-side: w8 has WindowGroupLimit Partial below the exchange") {
    // rank() <= 3 must become Spark's WindowGroupLimit in BOTH modes: a
    // Partial below the window exchange (each map task forwards at most k
    // rows per group, so the shuffle is top-k-bounded) and a Final above.
    // This is the shape SCALE.md's window-shuffle story rests on; a
    // refactor that obscures the rank predicate (e.g. filtering on a
    // derived column) silently ships every (supplier, part) row instead.
    val p = plan("w8_rank_top_parts")
    val partialIdx = p.indexOf("WindowGroupLimit")
    assert(partialIdx >= 0 && p.indexOf("WindowGroupLimit", partialIdx + 1) > 0,
      s"w8 lost its two-mode WindowGroupLimit:\n$p")
    // plan text prints parents above children: the LAST WindowGroupLimit
    // (the partial, deepest) must sit below the window's hash exchange
    val lastWgl = p.lastIndexOf("WindowGroupLimit")
    val exchange = p.indexOf("Exchange hashpartitioning(l_suppkey")
    assert(exchange >= 0 && lastWgl > exchange,
      s"no partial WindowGroupLimit below the window exchange:\n$p")
  }

  test("w11's three funnel stages share one user_id exchange and one key sort") {
    // three per-user window aggregates + the final rollup: exactly ONE
    // hashpartitioning(user_id) exchange may plan — Catalyst must reuse
    // it across stages. The windows have no ORDER BY, so the only sort is
    // the single partition-local key-grouping sort Spark's Window operator
    // requires — on user_id alone (not a data ordering), shared by all
    // three Window nodes, below the exchange.
    val p = plan("w11_funnel_stages")
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges == 1, s"w11 plans $exchanges user_id exchanges (want 1):\n$p")
    val sorts = "Sort \\[([^\\]]*)\\]".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(sorts.size == 1, s"w11 should share ONE window key sort, got $sorts:\n$p")
    assert(sorts.head.matches("user_id#\\d+L ASC NULLS FIRST"),
      s"w11's sort orders by more than the partition key: ${sorts.head}")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB shape: a shuffle join where one side carries a selective
    // filter — Catalyst should inject a bloom filter built from the small
    // side into the fact scan, cutting shuffle input before the exchange.
    // Local datasets are far below the production thresholds, so lower
    // them for the assertion; the production configs are the defaults.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = graft.core.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_totalprice")
      val li = graft.core.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sharing scan delegates to native parquet: filters push through src8") {
    // the graftSharing DSv2 source must be a pure resolver — the scan
    // underneath is Spark's parquet table, so a recipient-side filter
    // reaches the file source as PushedFilters and the projection prunes
    val endpoint = java.nio.file.Files.createTempDirectory("graft_shspec_").toString
    val profile = graft.sources.SharingProtocol.publishLocal(
      endpoint, "s", "db", "customer", s"$sf/customer.parquet", "tok")
    val df = spark.read.format("graftSharing").load(s"$profile#s.db.customer")
      .filter(col("c_custkey") === 7L).select("c_custkey", "c_mktsegment")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(c_custkey,7)"),
      s"filter did not push into the shared scan:\n${p.take(800)}")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>"),
      s"projection did not prune the shared scan:\n${p.take(800)}")
    // the protocol itself: a wrong token and an unshared table fail
    // loudly at resolve time, never as an empty scan
    val bad = org.scalatest.Assertions.intercept[Exception] {
      graft.sources.SharingProtocol.resolve(
        s"${profile.replace(".share", "_bad.share")}#s.db.customer")
    }
    assert(bad != null)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(endpoint, "evil.share"),
      """{"shareCredentialsVersion":1,"endpoint":"""" + endpoint +
        """","bearerToken":"WRONG"}""")
    val tok = org.scalatest.Assertions.intercept[RuntimeException] {
      graft.sources.SharingProtocol.resolve(s"$endpoint/evil.share#s.db.customer")
    }
    assert(tok.getMessage.contains("bearer token rejected"), tok.getMessage)
    val missing = org.scalatest.Assertions.intercept[RuntimeException] {
      graft.sources.SharingProtocol.resolve(s"$profile#s.db.nope")
    }
    assert(missing.getMessage.contains("not shared"), missing.getMessage)

    // multiple grants in one endpoint: a second publish with a different
    // token must not invalidate the first recipient's profile, and a
    // re-publish of the same table must replace its row (last wins),
    // never leave the recipient on the stale first location
    val p2 = graft.sources.SharingProtocol.publishLocal(
      endpoint, "s", "db", "nation", s"$sf/nation.parquet", "tok2")
    assert(graft.sources.SharingProtocol.resolve(s"$profile#s.db.customer")
      ._2 == Seq(s"$sf/customer.parquet"), "first grant broken by second publish")
    assert(graft.sources.SharingProtocol.resolve(s"$p2#s.db.nation")
      ._2 == Seq(s"$sf/nation.parquet"))
    val p3 = graft.sources.SharingProtocol.publishLocal(
      endpoint, "s", "db", "customer", s"$sf/supplier.parquet", "tok")
    assert(graft.sources.SharingProtocol.resolve(s"$p3#s.db.customer")
      ._2 == Seq(s"$sf/supplier.parquet"), "re-publish must replace the row")
  }

  test("j14 plans ONE window exchange for both frames; sql3 pushes filters, broadcasts the segment dim, top-k's without a global sort") {
    // j14: backward-last and forward-first share one window spec, so a
    // correct plan is exactly one user_id Exchange under one Sort with a
    // single Window node carrying BOTH frames — a regression that splits
    // the specs doubles the sort. The events scan must also skip
    // value/props and push the two-type IN filter.
    val pj = plan("j14_nearest_view_join")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(pj).size == 1,
      s"j14 must plan exactly one user_id window exchange:\n$pj")
    assert("\\bWindow \\[".r.findAllIn(pj).size == 1,
      s"j14's two frames must ride ONE Window node:\n$pj")
    assert(pj.contains("In(event_type, [purchase,view])"),
      s"j14 type filter not pushed to the events scan:\n$pj")
    val rsj = firstReadSchema(pj)
    assert(!rsj.contains("value") && !rsj.contains("props"),
      s"j14 scan reads columns the join never uses: $rsj")
    // sql3: pure SQL text, optimizer-placed physical ops. Pin only the
    // scale-invariant shapes: the segment filter reaches the customer
    // scan (and the filtered dim broadcasts), the revenue sum combines
    // map-side, and ORDER BY+LIMIT is TakeOrderedAndProject. The
    // lineitem side's join strategy is size-estimated — at sf0.001 it
    // broadcasts, at 100 TB Catalyst picks SMJ — so it is NOT pinned.
    val ps = plan("sql3_shipping_priority")
    assert(ps.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"sql3 segment filter not pushed to the customer scan:\n$ps")
    assert(ps.contains("BroadcastHashJoin"),
      s"sql3 filtered customer dim must broadcast:\n$ps")
    assert(ps.contains("partial_sum"), s"sql3 lost map-side combine:\n$ps")
    assert(ps.contains("TakeOrderedAndProject"),
      s"sql3 top-10 must never global-sort:\n$ps")
  }

  test("round-8 additions keep their scale shapes: sql4 prunes+broadcasts, gr3 bounds its window map-side, a20 aggregates partial, e11 broadcasts queries") {
    // sql4: the region filter reaches the region scan, the date range
    // reaches the orders scan, the small dims broadcast, and the revenue
    // sum combines map-side. (Fact-side join strategy is size-estimated —
    // not pinned, same reasoning as sql3.)
    val p4 = plan("sql4_local_supplier_volume")
    assert(p4.contains("EqualTo(r_name,ASIA)"),
      s"sql4 region filter not pushed:\n$p4")
    assert(p4.contains("GreaterThanOrEqual(o_orderdate") &&
      p4.contains("LessThan(o_orderdate"),
      s"sql4 date range not pushed to the orders scan:\n$p4")
    assert(p4.contains("BroadcastHashJoin"),
      s"sql4 small dims must broadcast:\n$p4")
    assert(p4.contains("partial_sum"), s"sql4 lost map-side combine:\n$p4")

    // gr3: the per-part top-3 must run as two-mode WindowGroupLimit (map
    // tasks forward at most 3 rows per part) and the lineitem scan must
    // read only the two join columns.
    val p3 = plan("gr3_item_recs")
    val wgl = p3.indexOf("WindowGroupLimit")
    assert(wgl >= 0 && p3.indexOf("WindowGroupLimit", wgl + 1) > 0,
      s"gr3 lost its two-mode WindowGroupLimit:\n$p3")
    // gr3/gr4's shared basket frame is eagerly checkpointed, so THEIR
    // executed plans contain no parquet scan (ExistingRDD leaves — a
    // ReadSchema regex there matches nothing and asserts nothing).
    // The pruning pin lives on the un-checkpointed basketScan instead.
    val pb = graft.queries.Graph.basketScan(spark, sf)
      .queryExecution.executedPlan.toString
    val rsb = readSchemas(pb)
    assert(rsb.nonEmpty, s"no parquet scan in basketScan plan:\n$pb")
    rsb.foreach { sch =>
      val cols = sch.split(",").map(_.split(":")(0).trim).filter(_.nonEmpty).toSet
      assert(cols.subsetOf(Set("l_orderkey", "l_partkey")),
        s"basket scan reads beyond the two basket columns: $cols")
    }

    // a20: both hash aggregates combine map-side and the customer dim
    // broadcasts (it carries only custkey+segment).
    val p20 = plan("a20_trend_slope")
    assert(p20.contains("BroadcastHashJoin"),
      s"a20 customer dim must broadcast:\n$p20")
    assert(p20.contains("partial_sum"), s"a20 lost map-side combine:\n$p20")

    // e11: both scoring passes broadcast the query side and bound their
    // top-k map-side — only |Q|·partitions·k candidates ever shuffle.
    val p11 = plan("e11_matryoshka_recall")
    assert(p11.contains("BroadcastNestedLoopJoin"),
      s"e11 lost its broadcast scoring joins:\n$p11")
    assert(p11.toLowerCase.contains("partial_boundedtopk")
      || (p11.contains("ObjectHashAggregate") && p11.contains("partial")),
      s"e11 lost its map-side partial top-k:\n$p11")
  }

  test("sql5 plans the HAVING subquery as a join and never global-sorts; e12 filters before scoring; gr4 bounds its window map-side") {
    // sql5: the quantity-sum subquery must reach the outer fact as a JOIN
    // (semi or AQE-converted broadcast), both quantity aggregates combine
    // map-side, and the top-100 runs as TakeOrderedAndProject.
    val p5 = plan("sql5_large_volume_customer")
    assert(p5.contains("Join") && p5.contains("partial_sum"),
      s"sql5 lost its subquery join or map-side combine:\n$p5")
    assert(p5.contains("TakeOrderedAndProject"),
      s"sql5 top-100 must never global-sort:\n$p5")

    // e12: the metadata predicate must PUSH into the documents scan
    // (pre-filtering — the corpus is cut before any pair forms) and reach
    // the vector side as a broadcast key join; the per-query top-k stays
    // a map-side partial.
    val p12 = plan("e12_filtered_ann")
    assert(p12.contains("EqualTo(lang,en)") &&
      p12.contains("GreaterThanOrEqual(n_chars,300)"),
      s"e12 document predicate not pushed to the scan:\n$p12")
    assert(p12.contains("BroadcastHashJoin"),
      s"e12 key filter must reach the corpus as a broadcast join:\n$p12")
    assert(p12.toLowerCase.contains("partial_boundedtopk")
      || (p12.contains("ObjectHashAggregate") && p12.contains("partial")),
      s"e12 lost its map-side partial top-k:\n$p12")

    // t28: the token count combines map-side and the per-lang top-200
    // runs as two-mode WindowGroupLimit — never a global token sort.
    val p28 = plan("t28_zipf_audit")
    assert(p28.contains("partial_count"), s"t28 lost map-side combine:\n$p28")
    val w28 = p28.indexOf("WindowGroupLimit")
    assert(w28 >= 0 && p28.indexOf("WindowGroupLimit", w28 + 1) > 0,
      s"t28 lost its two-mode WindowGroupLimit:\n$p28")

    // sql6 (TPC-H Q1): the date filter pushes into the lineitem scan
    // and the six-cell aggregate combines map-side — the canonical
    // scan-heavy aggregate must run at scan speed.
    val p6 = plan("sql6_pricing_summary")
    assert(p6.contains("LessThanOrEqual(l_shipdate"),
      s"sql6 date filter not pushed to the scan:\n$p6")
    assert(p6.contains("partial_sum"), s"sql6 lost map-side combine:\n$p6")

    // sql1: the dashboard's moving average must plan as
    // AGG-THEN-WINDOW — one partial-combined aggregate collapsing to
    // |days| rows, then the 30-row frame over that tiny frame — never a
    // window over the raw orders.
    val pq1 = plan("sql1_revenue_dashboard")
    assert(pq1.contains("Window ") && pq1.contains("partial_sum"),
      s"sql1 lost its agg-then-window shape:\n$pq1")
    assert(pq1.indexOf("Window ") < pq1.indexOf("partial_sum"),
      s"sql1's window must sit ABOVE the aggregate, not on raw rows:\n$pq1")

    // sql2: the alert threshold is a scalar SUBQUERY computed once
    // (its own partial-combined aggregate), not a per-row join or
    // cartesian against the segment counts.
    val pq2 = plan("sql2_alert_threshold")
    assert(pq2.contains("Subquery") && !pq2.contains("CartesianProduct"),
      s"sql2 lost its scalar-subquery shape:\n$pq2")

    // sql7 (TPC-H Q7): the two-nation OR predicate spans both nation
    // join branches, so it can't push into either scan — the pin is
    // that Catalyst keeps it above the joins WITHOUT degrading to a
    // cartesian between the nation sides, the dims still broadcast,
    // and the two-year shipdate range DOES push into the lineitem scan.
    val p7 = plan("sql7_volume_shipping")
    assert(!p7.contains("CartesianProduct"),
      s"sql7 planned a cartesian:\n$p7")
    assert(p7.contains("BroadcastHashJoin"),
      s"sql7 lost its broadcast dim joins:\n$p7")
    // both range bounds pinned by PushedFilters NAME, never by a rendered
    // timestamp literal (its formatting shifts with session timezone /
    // Spark version). The default metadata render truncates the pushed
    // list past ~100 chars, hiding the upper bound — widen it and
    // re-render for this read only.
    spark.conf.set("spark.sql.maxMetadataStringLength", 2000)
    val p7full = try plan("sql7_volume_shipping")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(p7full.contains("GreaterThanOrEqual(l_shipdate"),
      s"sql7 shipdate lower bound not pushed to the lineitem scan:\n$p7full")
    assert(p7full.contains("LessThanOrEqual(l_shipdate"),
      s"sql7 shipdate upper bound not pushed to the lineitem scan:\n$p7full")

    // sql8 (TPC-H Q10): returnflag pushes into the lineitem scan, the
    // quarter window into the orders scan, and the top-20 plans as
    // TakeOrderedAndProject off the aggregate.
    val p8 = plan("sql8_returned_items")
    assert(p8.contains("EqualTo(l_returnflag,R)"),
      s"sql8 returnflag not pushed to the lineitem scan:\n$p8")
    assert(p8.contains("GreaterThanOrEqual(o_orderdate"),
      s"sql8 date window not pushed to the orders scan:\n$p8")
    assert(p8.contains("TakeOrderedAndProject"),
      s"sql8 top-20 must never global-sort:\n$p8")

    // sql9 (TPC-H Q19): the WHERE is an OR of condition groups spanning
    // BOTH join sides — nothing pushes verbatim, so the pin is that the
    // optimizer still derives the per-side residual disjunctions (the
    // quantity-band OR into the lineitem scan, the brand/size OR into
    // the part scan), keeps the join a broadcast hash join, and
    // combines the single-cell aggregate map-side.
    val p9 = plan("sql9_discounted_revenue")
    assert(!p9.contains("CartesianProduct") && p9.contains("BroadcastHashJoin"),
      s"sql9 lost its broadcast join:\n$p9")
    assert(p9.contains("GreaterThanOrEqual(l_quantity,1.0"),
      s"sql9 quantity disjunction not pushed to the lineitem scan:\n$p9")
    assert(p9.contains("EqualTo(p_brand"),
      s"sql9 brand disjunction not pushed to the part scan:\n$p9")
    assert(p9.contains("partial_sum") && p9.contains("partial_count"),
      s"sql9 lost map-side combine:\n$p9")

    // sql10 (TPC-H Q17): the correlated scalar subquery (per-part 20%
    // avg-quantity gate) must DECORRELATE — one per-partkey aggregate
    // (combining map-side) joined back on the key, never a per-row
    // subquery re-aggregation and never a nested-loop/cartesian
    // degeneration; the brand/size dim filter pushes into the part scan.
    val p10 = plan("sql10_small_quantity_revenue")
    assert(!p10.contains("Subquery"),
      s"sql10's correlated subquery failed to decorrelate into a join:\n$p10")
    assert(!p10.contains("CartesianProduct") &&
      !p10.contains("BroadcastNestedLoopJoin"),
      s"sql10 degenerated to a non-equi join:\n$p10")
    assert(p10.contains("partial_avg"),
      s"sql10's decorrelated per-part avg lost map-side combine:\n$p10")
    assert(p10.contains("BroadcastHashJoin"),
      s"sql10's avg-gate join must stay a broadcast hash join:\n$p10")
    assert(p10.contains("EqualTo(p_brand,Brand#23)"),
      s"sql10 dim filter not pushed to the part scan:\n$p10")

    // sql11 (TPC-H Q4): the correlated EXISTS must plan as a LEFT SEMI
    // join — a CORRECTNESS pin, not just performance: an inner-join
    // rewrite would count an order once per returned line. Both side
    // filters push into their scans; the priority count combines
    // map-side.
    val p11 = plan("sql11_priority_returns")
    assert(p11.contains("LeftSemi"),
      s"sql11's EXISTS must decorrelate to a left-semi join:\n$p11")
    assert(!p11.contains("CartesianProduct") &&
      !p11.contains("BroadcastNestedLoopJoin"),
      s"sql11 degenerated to a non-equi join:\n$p11")
    assert(p11.contains("EqualTo(l_returnflag,R)"),
      s"sql11 returnflag not pushed to the lineitem scan:\n$p11")
    assert(p11.contains("GreaterThanOrEqual(o_orderdate"),
      s"sql11 quarter window not pushed to the orders scan:\n$p11")
    assert(p11.contains("partial_count"),
      s"sql11 priority count lost map-side combine:\n$p11")

    // gr4: the per-part top-3 must run as two-mode WindowGroupLimit
    // (its basket-scan pruning is pinned via basketScan above — the
    // checkpointed executed plan has no parquet scan to assert on).
    val pg = plan("gr4_link_prediction")
    val wg4 = pg.indexOf("WindowGroupLimit")
    assert(wg4 >= 0 && pg.indexOf("WindowGroupLimit", wg4 + 1) > 0,
      s"gr4 lost its two-mode WindowGroupLimit:\n$pg")
  }
}
