package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.fs.Layout

/** The DSv2 SQL surface over the Z-ordered layout
  * ([[graft.sources.GraftLayoutSource]]): `spark.sql` range predicates
  * must reach the manifest — the physical scan's input files are the
  * PRUNED set, not the listing — while the result stays exactly the
  * full-scan filter. */
class SqlSourceSpec extends SparkSpec {

  private lazy val grid = spark.range(10000)
    .select(col("id"),
      (col("id") % 100).cast("double").as("a"),
      (col("id") / lit(100)).cast("long").cast("double").as("b"))

  test("spark.sql over a registered layout: manifest file skipping + exact results + pushed parquet filters") {
    val base = java.nio.file.Files.createTempDirectory("graft-zsqlsrc").toString
    val path = s"$base/z"
    Layout.writeZordered(grid, path, "a", "b", bits = 6, numFiles = 16)
    Layout.writeManifest(spark, path, Seq("a", "b"))
    val total = Layout.listedDataFilePaths(spark, path).size
    assert(total == 16)

    spark.read.format("graft").load(path).createOrReplaceTempView("zsql")
    val q = spark.sql(
      "SELECT id, a, b FROM zsql WHERE a >= 10 AND a <= 20 AND b >= 10 AND b <= 20")

    // exactness: the SQL read equals the full-scan filter
    val expected = grid
      .where(col("a") >= 10 && col("a") <= 20 && col("b") >= 10 && col("b") <= 20)
      .select("id").as[Long](spark.implicits.newLongEncoder).collect().toSet
    val got = q.select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"SQL surface lost/invented rows: ${got.size} vs ${expected.size}")

    // the PLAN pin: the scheduled input files are the manifest-pruned
    // set — identical to what prunedRead would touch, and strictly
    // fewer than the listing (the Z-layout's whole point)
    val pruned = Layout.matchingFiles(spark, path,
      Seq(("a", 10.0, 20.0), ("b", 10.0, 20.0)))
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert(pruned.size < total,
      s"fixture must actually prune: ${pruned.size} of $total")
    q.collect() // finalize AQE so the executed plan is concrete
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      case other => other.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan)
        case l => Seq(l)
      }
    }
    val planned = unwrap(q.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.inputPartitions.flatMap {
        case fp: FilePartition =>
          fp.files.map(f => {
            val p = f.filePath.toString
            p.substring(p.lastIndexOf('/') + 1)
          }).toSeq
        case _ => Seq.empty[String]
      }
    }.flatten.toSet
    assert(planned == pruned,
      s"the scan must schedule exactly the pruned set: planned=${planned.size}, pruned=${pruned.size}")

    // the data filters also reach the parquet reader (row-group stats)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(a,10.0)") || plan.contains("gteq(a")),
      s"range filters must push into the parquet scan:\n$plan")

    // no predicate → no consult, full listing serves (plain-table path)
    val all = spark.sql("SELECT count(*) AS n FROM zsql").head().getLong(0)
    assert(all == 10000L)

    // a query on a NON-manifest column stays exact (no pruning, no harm)
    val byId = spark.sql("SELECT count(*) AS n FROM zsql WHERE id < 500").head().getLong(0)
    assert(byId == 500L)

    // the freshness contract holds through SQL too: a file landed behind
    // the manifest refuses the consult loudly, never drops rows
    grid.limit(100).write.mode("append").parquet(path)
    spark.read.format("graft").load(path).createOrReplaceTempView("zsql2")
    val stale = intercept[Exception](
      spark.sql("SELECT count(*) FROM zsql2 WHERE a >= 10 AND a <= 20").head())
    assert(stale.getMessage.contains("stale") ||
      Option(stale.getCause).exists(_.getMessage.contains("stale")),
      s"stale manifest must refuse: ${stale.getMessage}")
  }

  test("graft source without a manifest serves as a plain parquet table (no pruning, no refusal)") {
    val base = java.nio.file.Files.createTempDirectory("graft-zsqlnm").toString
    val path = s"$base/z"
    grid.repartition(4).write.parquet(path)
    spark.read.format("graft").load(path).createOrReplaceTempView("zplain")
    assert(spark.sql("SELECT count(*) AS n FROM zplain WHERE a >= 10 AND a <= 20")
      .head().getLong(0) ==
      grid.where(col("a") >= 10 && col("a") <= 20).count())
  }
}
