package graft

/** Driver-contract guards: the correctness gate silently weakens if an
  * oracle key has no query (never compared) or a query crashes (dropped
  * from the round's CORRECTNESS json with only a stderr line). */
class ContractSpec extends SparkSpec {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query executes and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(100)}") }
    }
    assert(failures.isEmpty, s"queries failing the smoke contract:\n${failures.mkString("\n")}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
