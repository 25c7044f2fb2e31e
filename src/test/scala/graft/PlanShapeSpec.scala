package graft

/** Plan-shape assertions for the operator battery: column pruning reaches
  * the scan, broadcast joins are chosen where intended.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def readSchemas(df: org.apache.spark.sql.DataFrame): Seq[String] =
    "ReadSchema: [^\\n]*".r.findAllIn(df.queryExecution.executedPlan.toString).toSeq

  test("validation queries prune to the checked + key columns") {
    val rs = readSchemas(Queries.qValidateBounds(spark, dir))
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(!r.contains("l_shipdate") && !r.contains("l_tax") && !r.contains("l_returnflag"),
        s"unpruned scan: $r")
    }
  }

  test("unique reads only the key column") {
    val rs = readSchemas(Queries.qUnique(spark, dir))
    rs.foreach(r => assert(!r.contains("o_totalprice") && r.contains("o_custkey"), r))
  }

  test("brand revenue join broadcasts the part side") {
    val plan = Queries.qJoinBrandRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("referential check uses a broadcast anti join") {
    val plan = Queries.qReferential(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("ANN brute force broadcasts the probe set (no shuffle of the corpus)") {
    val plan = Queries2.qAnnTopK(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("text battery is a single codegen'd scan (no shuffle)") {
    val plan = Queries2.qTextBattery(spark, dir).queryExecution.executedPlan.toString
    // orderBy adds one exchange; the battery itself must not add more
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$plan")
  }
}
