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

  test("time travel through the SQL surface: versionAsOf / timestampAsOf pin the commit listing, expiry refuses") {
    val base = java.nio.file.Files.createTempDirectory("graft-zsqltt").toString
    val path = s"$base/z"
    val even = grid.where(col("id") % 2 === 0)
    Layout.writeZordered(even, path, "a", "b", bits = 4, numFiles = 4) // v0
    val ts0 = fs.OptimisticCommit.commitStateMs(spark, path, 0L).get
    while (System.currentTimeMillis() <= ts0) Thread.sleep(1)
    Layout.appendZordered(grid.where(col("id") % 2 === 1), path, numFiles = 2) // v1

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    val evenIds = even.select("id").collect().map(_.getLong(0)).toSet

    // versionAsOf=0 serves exactly v0's content; v1 the composed table
    assert(ids(spark.read.format("graft").option("versionAsOf", "0")
      .load(path)) == evenIds)
    assert(ids(spark.read.format("graft").option("versionAsOf", "1")
      .load(path)).size == 10000)
    // timestampAsOf at v0's completion ms resolves to v0 (inclusive
    // boundary), both the raw-millis and the Timestamp-string spelling
    assert(ids(spark.read.format("graft").option("timestampAsOf", ts0.toString)
      .load(path)) == evenIds)
    val tsStr = new java.sql.Timestamp(ts0).toString
    assert(ids(spark.read.format("graft").option("timestampAsOf", tsStr)
      .load(path)) == evenIds)
    // and the pinned read composes with spark.sql + predicates (the
    // pinned index skips the manifest consult — the manifest indexes
    // the LIVE table — so no freshness coupling either way)
    spark.read.format("graft").option("versionAsOf", "0").load(path)
      .createOrReplaceTempView("zsql_v0")
    val got = spark.sql("SELECT id FROM zsql_v0 WHERE a >= 10 AND a <= 20")
      .collect().map(_.getLong(0)).toSet
    assert(got == even.where(col("a") >= 10 && col("a") <= 20)
      .select("id").collect().map(_.getLong(0)).toSet)

    // both options together is ambiguous
    val both = intercept[Exception](spark.read.format("graft")
      .option("versionAsOf", "0").option("timestampAsOf", ts0.toString)
      .load(path))
    assert(both.getMessage.contains("not both"))
    // an ask predating every commit refuses (forward time travel)
    val early = intercept[Exception](spark.read.format("graft")
      .option("timestampAsOf", "1").load(path))
    assert(early.getMessage.contains("predates"))
    // a mid-flight version refuses as unreadable
    val mid = intercept[Exception](spark.read.format("graft")
      .option("versionAsOf", "99").load(path))
    assert(mid.getMessage.contains("no commit"))

    // physical expiry: compaction rewrites v0's pinned files → the
    // pinned SQL read refuses loudly, never serves a partial answer
    Layout.compactLayout(spark, path, numFiles = 2)
    val gone = intercept[Exception](spark.read.format("graft")
      .option("versionAsOf", "0").load(path).collect())
    assert(gone.getMessage.contains("expired") ||
      Option(gone.getCause).exists(_.getMessage.contains("expired")),
      s"expired pin must refuse: ${gone.getMessage}")
  }

  test("df.write.format(\"graft\"): create with zcols, frozen-bounds append, modes, commits recorded") {
    val base = java.nio.file.Files.createTempDirectory("graft-zsqlwr").toString
    val path = s"$base/z"
    val even = grid.where(col("id") % 2 === 0)
    val odd = grid.where(col("id") % 2 === 1)

    // creating without zcols refuses, naming the option
    val noCols = intercept[Exception](
      even.write.format("graft").save(path))
    assert(noCols.getMessage.contains("zcols") ||
      Option(noCols.getCause).exists(_.getMessage.contains("zcols")))

    // create: layout + manifest in one writer call, commit v0 recorded
    even.write.format("graft").option("zcols", "a,b").option("bits", "4")
      .option("files", "4").save(path)
    assert(fs.OptimisticCommit.tableVersion(spark, path) == 0L)
    assert(Layout.listedDataFilePaths(spark, path).size == 4)

    // append: zero options — bounds from the sidecar, manifest refreshed
    // incrementally, commit advances
    odd.write.format("graft").mode("append").save(path)
    assert(fs.OptimisticCommit.tableVersion(spark, path) == 1L)

    // the written table serves pruned SQL reads immediately (the writer
    // completed the commit unit — a stale manifest would refuse here)
    spark.read.format("graft").load(path).createOrReplaceTempView("zwr")
    val got = spark.sql(
      "SELECT id FROM zwr WHERE a >= 10 AND a <= 20 AND b >= 10 AND b <= 20")
      .collect().map(_.getLong(0)).toSet
    val expected = grid
      .where(col("a") >= 10 && col("a") <= 20 && col("b") >= 10 && col("b") <= 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected)

    // ErrorIfExists refuses on an existing layout; Ignore is a no-op
    val eie = intercept[Exception](
      even.write.format("graft").mode("errorifexists").save(path))
    assert(eie.getMessage.contains("already exists") ||
      Option(eie.getCause).exists(_.getMessage.contains("already exists")))
    even.write.format("graft").mode("ignore").save(path)
    assert(spark.sql("SELECT count(*) AS n FROM zwr").head().getLong(0) == 10000L)

    // overwrite rebuilds from scratch (rewrite-class commit)
    even.write.format("graft").mode("overwrite")
      .option("zcols", "b,a").option("bits", "4").option("files", "2").save(path)
    spark.read.format("graft").load(path).createOrReplaceTempView("zwr2")
    assert(spark.sql("SELECT count(*) AS n FROM zwr2").head().getLong(0) == 5000L)
  }

  test("readStream.format(\"graft\"): snapshot + per-commit increments, exactly-once, rewrite refusal + opt-in") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft-zsqlstream").toString
    val path = s"$base/z"
    val out = s"$base/out"
    val ck = s"$base/ck"
    val even = grid.where(col("id") % 2 === 0)
    val odd = grid.where(col("id") % 2 === 1)

    def drain(opts: Map[String, String] = Map.empty,
        checkpoint: String = ck, outDir: String = out): Unit = {
      val sdf = opts.foldLeft(spark.readStream.format("graft")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(path)
      assert(sdf.isStreaming)
      val q = sdf.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def outIds(outDir: String = out): Seq[Long] =
      spark.read.parquet(outDir).select("id").collect().map(_.getLong(0)).toSeq

    Layout.writeZordered(even, path, "a", "b", bits = 4, numFiles = 4) // v0
    drain() // first batch = the full snapshot at the current commit
    assert(outIds().sorted == even.select("id").collect().map(_.getLong(0))
      .toSeq.sorted)

    Layout.appendZordered(odd, path, numFiles = 2) // v1
    drain() // second batch = ONLY v1's added files
    val all = outIds()
    assert(all.size == 10000 && all.distinct.size == 10000,
      s"incremental consumption must be exactly-once: ${all.size} rows, " +
        s"${all.distinct.size} distinct")

    // a rewrite-class commit refuses by default — re-clustered files
    // would re-deliver rows already processed downstream
    Layout.compactLayout(spark, path, numFiles = 2) // v2
    val refusal = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        .toSeq
    assert(chain(refusal).exists(m => m != null && m.contains("REWRITE-class")),
      s"rewrite in range must refuse: ${chain(refusal)}")

    // the documented opt-in: acceptRewrites delivers at-least-once
    drain(Map("acceptRewrites" -> "true"))
    val after = outIds()
    assert(after.size == 20000 && after.distinct.size == 10000,
      s"acceptRewrites re-delivers the rewritten snapshot: ${after.size}")

    // startingVersion=latest on a FRESH checkpoint: nothing until the
    // next commit, then exactly its rows
    val ck2 = s"$base/ck2"; val out2 = s"$base/out2"
    drain(Map("startingVersion" -> "latest"), ck2, out2)
    assert(!new java.io.File(out2).exists() ||
      spark.read.parquet(out2).isEmpty)
    Layout.appendZordered(grid.where(col("id") === 0).withColumn("id", lit(99999L)),
      path, numFiles = 1) // v3
    drain(Map("startingVersion" -> "latest"), ck2, out2)
    assert(outIds(out2) == Seq(99999L))
  }

  test("manifest-priced SQL aggregates: COUNT/MIN/MAX answer from ONE sidecar read as a LocalTableScan") {
    val base = java.nio.file.Files.createTempDirectory("graft-zsqlmeta").toString
    val path = s"$base/z"
    Layout.writeZordered(grid, path, "a", "b", bits = 4, numFiles = 8)
    Layout.writeManifest(spark, path, Seq("a", "b"))
    spark.read.format("graft").load(path).createOrReplaceTempView("zmeta")

    val q = spark.sql(
      "SELECT count(*) AS n, min(a) AS lo, max(a) AS hi, min(b) AS blo FROM zmeta")
    val row = q.head()
    assert(row.getLong(0) == 10000L && row.getDouble(1) == 0.0 &&
      row.getDouble(2) == 99.0 && row.getDouble(3) == 0.0)
    // the plan pin: a LocalTableScan — ZERO file tasks, the answer came
    // from the manifest fold, not a per-file footer read
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"manifest-answerable aggregates must plan as a local scan:\n$plan")

    // a filtered aggregate DELEGATES (the manifest can't subset rows):
    // exact result, no LocalTableScan
    val qf = spark.sql("SELECT count(*) AS n FROM zmeta WHERE a >= 10 AND a <= 20")
    assert(qf.head().getLong(0) ==
      grid.where(col("a") >= 10 && col("a") <= 20).count())
    assert(!qf.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // count(col) (null-aware) is not manifest-translatable → delegates, exact
    val qc = spark.sql("SELECT count(a) AS n, avg(b) AS m FROM zmeta")
    assert(qc.head().getLong(0) == 10000L)
    assert(!qc.queryExecution.executedPlan.toString.contains("GraftMetaLocalScan"))

    // STALE manifest → silent fallback to the stock path (the query
    // never asked for a consult; exactness beats refusal here)
    grid.limit(50).write.mode("append").parquet(path)
    spark.read.format("graft").load(path).createOrReplaceTempView("zmeta2")
    val qs = spark.sql("SELECT count(*) AS n FROM zmeta2")
    assert(qs.head().getLong(0) == 10050L)
    assert(!qs.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("parquet footer-aggregate pushdown works through the graft source") {
    val base = java.nio.file.Files.createTempDirectory("graft-zsqlagg").toString
    val path = s"$base/z"
    Layout.writeZordered(grid, path, "a", "b", bits = 4, numFiles = 4)
    spark.read.format("graft").load(path).createOrReplaceTempView("zagg")
    val key = "spark.sql.parquet.aggregatePushdown"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      val q = spark.sql("SELECT count(*) AS n, min(a) AS lo, max(a) AS hi FROM zagg")
      val row = q.head()
      assert(row.getLong(0) == 10000L && row.getDouble(1) == 0.0 &&
        row.getDouble(2) == 99.0)
      // the plan pin: the aggregate reached the parquet footers — no
      // row-level scan behind a metadata-answerable query
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*), MIN(a), MAX(a)]"),
        s"footer aggregates must push through the graft scan:\n$plan")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
