package graft

/** Mirrors the driver's smoke check: entry() returns rows > 0 and the
  * queries/oracle maps stay key-aligned.
  */
class EntrySmokeSpec extends SparkTestBase {
  test("entry returns violations on the sf0.001-scale corpus") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("keyword", "instance_path", "detail"))
  }
  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.size == 44)
  }
}
