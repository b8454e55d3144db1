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

  test("parquet scans push filters and prune columns") {
    val p = plan("filter_pushdown")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderstatus"))
    // doc_tokens needs only (doc_id, text) of documents' 5 columns
    val dt = plan("doc_tokens")
    assert(dt.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"doc_tokens should scan only doc_id+text:\n$dt")
  }

  test("near-dup verify joins stay broadcast (no shuffled verify side)") {
    for (name <- Seq("doc_near_dedup", "doc_ngram_jaccard")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name lost broadcast verify")
    }
  }

  test("every plan reaches WholeStageCodegen") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // execute first: under AQE the codegen stages only appear once the
      // adaptive plan is finalized
      val df = fn(spark, sfTiny)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), s"$name has no WholeStageCodegen stage:\n$p")
    }
  }
}
