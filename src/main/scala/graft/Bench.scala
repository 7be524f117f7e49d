package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line `{"metric":"total","value":N,"unit":"sec",
  * "queries":{...mean sec...},"runs":R,"sf":...}`.
  *
  * Robustness against the driver's output capture (r02/r03 lost the line to
  * tail truncation; r04 lost it again because adding a per-query `qmin` map
  * pushed the line past the driver's ~4KB tail window and clipped it from
  * the FRONT): the stdout line now carries ONLY the per-query means — ~2.2KB
  * at 76 queries, safely inside the window — and is printed and flushed
  * BEFORE spark.stop()'s shutdown noise. The full stats (means + minima +
  * run count) still land in bench_last.json (cwd) as the file fallback.
  *
  * Noise control: each query runs SPARK_GRAFT_BENCH_RUNS times (default 3);
  * `queries` carries per-query means (cross-round comparisons stop being
  * dominated by the ±20% single-run scheduling noise BASELINE.md documents),
  * `qmin` the per-query minima (the steady-state floor). Runs are
  * interleaved ROUND-ROBIN across the whole surface (run 1 of every query,
  * then run 2, ...) rather than back-to-back per query: r05's three
  * consecutive regressions (q_percentiles/q_pii_scrub/q_pipeline, adjacent
  * in sorted order) showed a transient host load spike poisoning ALL of one
  * query's samples; interleaving bounds a spike's damage to one sample per
  * query, so the min survives it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up so the first timed query isn't charged session
    // startup (~4s otherwise lands on whichever query runs first); failures
    // are tolerated like any per-query failure — the timed loop must run
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // ad-hoc A/B runs (e.g. measuring the shared surface without the heavy
    // composite queries to separate GC shadow from real plan regressions):
    // comma-separated query names to leave out of this run
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    // ...and the converse: restrict a run to a named subset (A/B adjudication
    // of individual floors without paying the full 105-query surface)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    val named = SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1))
      .filter(q => only.forall(_.contains(q._1)))
    val samples = Array.fill(named.size)(Vector.empty[Double])
    val failures = Array.fill(named.size)(0)
    // Persist hygiene (r12 verdict): ops legitimately return plans that
    // depend on internal fan-out persists, so the RELEASE point is here —
    // after the consuming action — not inside the ops. Without it the
    // cached plans accumulate across ~500 query executions ("Asked to
    // cache already cached data" warnings; memoized first-runs swinging
    // ~10× with JVM/cache state; at cluster scale, executor memory held
    // with no release point), and a repeat run of a persisting query
    // silently reuses the previous run's cache, so its qmin measured
    // cache-hit latency rather than the query's cost. Release happens
    // OUTSIDE the timed window (the measurement is the query, not the
    // cleanup). SPARK_GRAFT_BENCH_RELEASE=0 restores the r12-and-earlier
    // accumulate-forever behavior for A/B against old floors.
    val release = sys.env.getOrElse("SPARK_GRAFT_BENCH_RELEASE", "1") == "1"
    for (_ <- 1 to runs; i <- named.indices) {
      val t0 = System.nanoTime()
      try { named(i)._2(spark, sfDir).count() }
      catch { case _: Throwable => failures(i) += 1 }
      samples(i) :+= (System.nanoTime() - t0) / 1e9
      if (release) spark.catalog.clearCache()
    }
    // Heavy composites whose interleaved means run >3× their floors (cache
    // cooling from neighboring queries — BASELINE.md methodology note, the
    // r10 verdict's manual-adjudication complaint): each gets
    // SPARK_GRAFT_BENCH_DEDICATED extra BACK-TO-BACK runs (default 2)
    // folded into qmin ONLY — the mean stays the interleaved number so
    // cross-round means remain one measurement class, while the floor
    // stops needing a hand-run dedicated bench per round.
    val dedicatedSet = Set("q_pipeline_full", "q_minhash_incremental",
      "q_minhash_pairs_deduped", "q_minhash_pairs", "q_corpus_report_served",
      "q_hybrid_served")
    val dedicatedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEDICATED", "2").toInt.max(0)
    val dedicatedMin = Array.fill(named.size)(Double.MaxValue)
    // dedicated-run failures get their OWN counter: folding them into
    // failures(i) let "errors" exceed the interleaved run count and hid
    // whether qmin was a dedicated or interleaved sample's floor
    val dedicatedFails = Array.fill(named.size)(0)
    for (i <- named.indices if dedicatedSet(named(i)._1) && !Queries.memoizedQueries(named(i)._1);
         _ <- 1 to dedicatedRuns) {
      val t0 = System.nanoTime()
      // a failed dedicated run records its error and nothing else — its
      // elapsed time must not become the query's floor
      try {
        named(i)._2(spark, sfDir).count()
        dedicatedMin(i) = dedicatedMin(i).min((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => dedicatedFails(i) += 1 }
      // same release discipline as the interleaved loop: a back-to-back
      // dedicated run must re-pay its own persists, not hit the last run's
      if (release) spark.catalog.clearCache()
    }
    // memoized fixture queries (Queries.memoizedQueries) only do real work
    // on run 1 — later runs re-read the landed store, so their min/mean
    // would measure a parquet re-read, not the operator. Report run 1 as
    // both and tag them in the JSON so qmin stays one measurement class.
    val results = named.indices.map { i =>
      if (Queries.memoizedQueries(named(i)._1))
        (named(i)._1, r3(samples(i).head), r3(samples(i).head), failures(i))
      else
        (named(i)._1, r3(samples(i).sum / runs),
          r3(samples(i).min.min(dedicatedMin(i))), failures(i))
    }
    val mean = results.map { case (k, m, _, _) => s"\"$k\":$m" }.mkString("{", ",", "}")
    val mins = results.map { case (k, _, n, _) => s"\"$k\":$n" }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    // a broken query must not masquerade as a fast one: failed run counts
    // surface in their own map (absent when everything succeeded)
    val failed = results.collect { case (k, _, _, f) if f > 0 => s"\"$k\":$f" }
    val errors = if (failed.isEmpty) "" else failed.mkString(""","errors":{""", ",", "}")
    val dedicatedFailed = named.indices.collect {
      case i if dedicatedFails(i) > 0 => s"\"${named(i)._1}\":${dedicatedFails(i)}"
    }
    val dedErrors = if (dedicatedFailed.isEmpty) ""
      else dedicatedFailed.mkString(""","dedicated_errors":{""", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$mean,"runs":$runs$errors,"sf":"$sfDir"}"""
    val memoed = named.map(_._1).filter(Queries.memoizedQueries)
      .map(n => s"\"$n\"").mkString("[", ",", "]")
    val dedic = named.map(_._1).filter(n => dedicatedSet(n) && !Queries.memoizedQueries(n))
      .map(n => s"\"$n\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$mean,"qmin":$mins,"memoized_first_run":$memoed,"dedicated_floor":$dedic,"runs":$runs$errors$dedErrors,"sf":"$sfDir"}"""
    // stdout first + explicit flush, THEN the file fallback, THEN shutdown
    println(line)
    System.out.flush()
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), full + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
