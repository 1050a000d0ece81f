package graft.queries

import graft.SparkSuite

/** Plan-quality assertions — the properties SURVEY.md §4/§6 claim, locked
  * in as tests so a regression (a filter that stops pushing down, a
  * broadcast that silently becomes a shuffle, a window that loses its
  * partitioning) fails CI instead of surfacing at 100 TB.
  */
class PlanAuditSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def formattedPlan(name: String): String = {
    val df = QueryCatalog.byName(name).fn(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q6: every predicate reaches the parquet scan; schema is pruned") {
    val plan = formattedPlan("q6_filter_agg")
    assert(plan.contains("PushedFilters:"))
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity").foreach(f =>
      assert(plan.contains(f), s"missing pushed filter $f"))
    // column pruning: only the 4 referenced columns are read
    val readSchema = plan.linesIterator.find(_.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"),
      s"scan reads unused columns: $readSchema")
  }

  test("q3: dimension joins broadcast instead of shuffling the fact side") {
    val plan = formattedPlan("q3_top_orders")
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter must push into the customer scan")
  }

  test("q_window_rank: the window keeps its partitioning (no global sort)") {
    val plan = formattedPlan("q_window_rank")
    assert(plan.contains("hashpartitioning(o_custkey"),
      "window must hash-partition by o_custkey, not sort globally")
  }

  test("pulse_times: the timing-log filter pushes to the scan") {
    val plan = formattedPlan("pulse_times")
    assert(plan.contains("EqualTo(event_type,click)"))
  }

  test("events_absolute_time: as-of join is a real equi-join, not a nested loop") {
    val plan = formattedPlan("events_absolute_time")
    assert(!plan.contains("BroadcastNestedLoopJoin LeftOuter"),
      "as-of join degenerated into a nested-loop range join")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
           plan.contains("BroadcastHashJoin"),
      "expected a hash/merge equi-join on (bucket)")
  }

  test("q_gap_fill: bucket join stays an equi-join (no cartesian/NLJ)") {
    val plan = formattedPlan("q_gap_fill")
    assert(!plan.contains("CartesianProduct"), "gap-fill join went cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "gap-fill join became a nested loop")
  }

  test("zOrderBy plans a single range partitioning on the Morton code") {
    import org.apache.spark.sql.functions._
    val grid = spark.range(0, 256)
      .select((col("id") % 16).as("x"), expr("id div 16").as("y"))
    val plan = graft.ops.Layout.zOrderBy(grid, Seq("x", "y"), bitsPerCol = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"zOrderBy lost its range partitioning:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup_exact: single shuffle keyed on the content hash") {
    val plan = formattedPlan("dedup_exact")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      "aggregation lost its map-side partial phase")
  }

  test("chunkDocs is shuffle-free: pure executor-side fan-out") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val plan = graft.text.TextAnalysis
      .chunkDocs(docs, "text", "doc_id", 64, 16)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle — it fans out within the scan:\n$plan")
  }

  test("repetition_stats is a pure scan: no aggregate, no join, no window") {
    // gram frequencies are per-document — the native GramStats expression
    // keeps them inside the scan; the only exchange allowed is the
    // query's output ORDER BY
    val plan = formattedPlan("repetition_stats")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"repetition stats must not aggregate:\n$plan")
    assert(!plan.contains("Join"), s"repetition stats must not join:\n$plan")
    assert(!plan.contains("Window"), s"repetition stats must not window:\n$plan")
  }

  test("dedupSubstrings: first-occurrence via aggregation, never a " +
       "per-window window function") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val df = graft.dedup.Dedup.dedupSubstrings(docs, "text", "doc_id", 8)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("WindowExec") && !plan.contains("Window ("),
      s"substring dedup must not plan a window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"substring dedup must stay equi-join/agg shaped:\n$plan")
  }

  test("funnel: equi-joins keyed on the user column only — no cartesian, " +
       "no window") {
    val ev = graft.Tables.eventsUs(spark, dir)
      .select("user_id", "ts_us", "event_type")
    val df = graft.ops.Funnel.userSteps(ev, "user_id", "ts_us",
      "event_type", Seq("view", "click", "purchase"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel must stay an equi-join chain:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window ("),
      s"funnel must not window over the stream:\n$plan")
  }

  test("DSIR vector path: featurization and scoring are shuffle-free") {
    val docs = graft.Tables.load(spark, dir, "documents")
    import graft.ops.Selection
    val fv = Selection.hashedNgramFeatureVectors(docs, "text", "doc_id")
    assert(!fv.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("Exchange"),
      "vector featurization must be map-only")
    // scoring = literal-coefficient sum: still no exchange end to end
    val target = Selection.bucketTotalsFromVectors(
      Selection.hashedNgramFeatureVectors(
        docs.limit(20), "text", "doc_id"), 64)
    val w = Selection.importanceLogWeightsFromVectors(fv, target,
      Selection.bucketTotalsFromVectors(fv, 64), 64, "doc_id")
    assert(!w.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("Exchange"),
      "vector scoring must be map-only (models are literals, not joins)")
  }

  test("pipeline selection stage composes the vector path, shuffle-free") {
    // curateWithSelection's DSIR stage must ride the vector path (the
    // row form's (id, bucket) shuffle was measured superlinear at 2M
    // docs) — pin the composed stage's plan Exchange-free end to end
    val docs = graft.Tables.load(spark, dir, "documents")
    val w = graft.pipelines.TrainingDataPipeline.selectionWeights(
      docs, docs.limit(20), "text", "doc_id", ngram = 2, buckets = 64,
      checkpointFeatures = false)
    val plan = w.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"pipeline DSIR stage must stay map-only (vector path):\n$plan")
    assert(!plan.contains("Generate"),
      s"pipeline DSIR stage must not explode shingles (row form):\n$plan")
  }

  test("lshTopK default: probe side broadcasts; no cartesian/NLJ") {
    val em = graft.Tables.load(spark, dir, "embeddings")
    val plan = graft.ann.Similarity.lshTopK(em,
        em.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", k = 5, bits = 4, dim = 64)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "multi-table OR-construction must stay an equi-join on (table, bucket)")
  }

  test("vocab/encode/pack: no single-partition window anywhere") {
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = graft.Tables.load(spark, dir, "documents")
    val vocab = graft.text.TextAnalysis.buildVocab(docs, "text", 2L, 100L)
    val enc = graft.text.TextAnalysis.encodeDocs(docs, "text", "doc_id", vocab)
    val toks = graft.text.TextAnalysis.tokenCounts(docs, "text", "doc_id")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_ws_tokens"))
    val pack = graft.text.TextAnalysis.packSequences(
      toks, "doc_id", "n_ws_tokens", 2048L)
    Seq("vocab" -> vocab, "encode" -> enc, "pack" -> pack).foreach {
      case (name, df) =>
        val bad = df.queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        assert(bad.isEmpty, s"$name plans a single-partition window")
    }
  }

  test("ngram_novelty: the reference key set broadcasts; the corpus never " +
       "shuffles on the shingle hash") {
    val plan = formattedPlan("ngram_novelty")
    assert(plan.contains("BroadcastHashJoin") &&
           plan.contains("BuildRight"),
      s"reference keys must broadcast into the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shingles must not shuffle into a merge join:\n$plan")
  }

  test("contamination_bloom: the prefilter applies BELOW every join/agg " +
       "(corpus shingles die map-side, before any Exchange)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join}
    val df = QueryCatalog.byName("contamination_bloom").fn(spark, dir)
    val prefilters = df.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.toString.contains("graft_bloom_contains") => f
    }
    assert(prefilters.nonEmpty, "bloom prefilter missing from the optimized plan")
    // nothing shuffle-inducing below the prefilter: it must sit directly
    // over the corpus-side scan/fan-out, not after the verify join
    prefilters.foreach { f =>
      val shuffling = f.child.collect {
        case j: Join => j
        case a: Aggregate => a
      }
      assert(shuffling.isEmpty,
        s"bloom prefilter planned above a join/aggregate:\n${f.treeString}")
    }
  }

  test("c4_clean / gopher_quality: pure scans — the only exchange is the " +
       "output ORDER BY") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    Seq("c4_clean", "gopher_quality").foreach { name =>
      val plan = formattedPlan(name)
      assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
        s"$name must not aggregate:\n$plan")
      assert(!plan.contains("Join"), s"$name must not join:\n$plan")
      // exactly the final sort's range exchange, nothing upstream
      val exchanges = QueryCatalog.byName(name).fn(spark, dir)
        .queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.length <= 1,
        s"$name planned more than the output-sort exchange:\n$plan")
    }
  }

  test("cross_source_overlap: distinct aggregates keep map-side partials; " +
       "no cartesian on the data path") {
    val plan = formattedPlan("cross_source_overlap")
    // the (slice, key) distinct must partial-aggregate before its
    // exchange — a shuffle of raw exploded shingles would move the
    // whole fan-out
    assert(plan.contains("partial_"),
      s"distinct lost its map-side partial:\n$plan")
    // the only cartesian allowed is the slices x slices totals frame
    // (|slices|^2 rows); the shingle-keyed join must stay an equi-join
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(joins >= 1, s"shingle overlap lost its equi-join:\n$plan")
  }

  test("token_budget_mix: no key-only window partitioning (the per-source " +
       "one-reducer funnel) anywhere in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = QueryCatalog.byName("token_budget_mix").fn(spark, dir)
    val keyOnly = df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.size < 2 => w
    }
    assert(keyOnly.isEmpty,
      "token budget mix planned a window partitioned by the source alone")
  }
}
