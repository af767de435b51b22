package graft

/** Physical-plan assertions — the "would this survive 100×?" gate.
  * Checks that the plans Catalyst produces are the plans we designed for:
  * pushdown reaches the scan, small sides broadcast, top-k never global-
  * sorts, and nothing degenerates into an unbounded cartesian product.
  */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_filter_project pushes predicates and prunes columns at the scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"missing pushed filters:\n$p")
    assert(!p.contains("l_returnflag"), "scan reads pruned column l_returnflag")
  }

  test("q3_join broadcasts the nation dimension") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"no broadcast in q3_join plan:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    for (q <- Seq("q_topk_orders", "word_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lacks TakeOrderedAndProject:\n$p")
    }
  }

  test("wordcount aggregates partially before the shuffle (map-side combine)") {
    val p = plan("wordcount")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate pair:\n$p")
  }

  test("window queries shuffle once on the partition key") {
    val p = plan("q_window_rank")
    // one exchange for the window partitioning + possibly one for the
    // final orderBy; no more.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"too many hash exchanges:\n$p")
  }

  test("no query plan contains an unbounded CartesianProduct") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name degenerated into CartesianProduct:\n$p")
    }
  }

  test("explicit broadcast cross joins stay BroadcastNestedLoop with a tiny build side") {
    // sim_* queries cross-join a 1-row broadcast probe — that's the
    // designed plan; just pin that the broadcast actually happens.
    val p = plan("sim_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"probe not broadcast:\n$p")
  }
}
