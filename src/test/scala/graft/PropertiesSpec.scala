package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.fs.Expressions

/** Property tests per SURVEY §5: AQI range/monotonicity, snapshot
  * idempotence under shuffled duplicate input. One Spark job per property
  * (samples batched into a single DataFrame, not a job per case). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("aqiPm25 range: every output is in [0,500] or the 8.5 fallback") {
    val samples = Gen.listOfN(500, Gen.chooseNum(-50.0, 600.0)).sample.get
    val got = samples.toDF("pm25").select(Expressions.aqiPm25(col("pm25"))).as[Double].collect()
    assert(got.forall(v => v == 8.5 || (v >= 0.0 && v <= 500.0)))
  }

  test("aqiPm25 monotonicity within each breakpoint band") {
    val inBand = Expressions.AqiBreakpoints.flatMap { case (lo, hi, _, _) =>
      val g = Gen.chooseNum(lo, hi)
      Gen.listOfN(50, g).sample.get.sorted
    }
    val got = inBand.toDF("pm25").select(col("pm25"), Expressions.aqiPm25(col("pm25")))
      .as[(Double, Double)].collect().sortBy(_._1)
    got.sliding(2).foreach {
      case Array((c1, a1), (c2, a2)) =>
        val sameBand = Expressions.AqiBreakpoints.exists { case (lo, hi, _, _) => c1 >= lo && c2 <= hi }
        if (sameBand) assert(a1 <= a2, s"aqi($c1)=$a1 > aqi($c2)=$a2")
      case _ =>
    }
  }

  test("as-of join: join+rank and merge formulations agree on random frames") {
    val keys = Seq("a", "b", "c")
    val gen = for {
      k <- Gen.oneOf(keys)
      t <- Gen.chooseNum(0L, 500L) // coarse grid -> plenty of ts collisions
      v <- Gen.chooseNum(0.0, 10.0)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (k, new java.sql.Timestamp(t * 1000), v, id)
    val entity = Gen.listOfN(200, gen).sample.get.zipWithIndex
      .map { case ((k, t, _, _), i) => (i.toLong, k, t) }
      .toDF("probe_id", "entity", "event_ts")
    // sparse features so some probes find nothing inside the TTL window
    val feature = Gen.listOfN(25, gen).sample.get
      .toDF("entity", "fts", "v", "fid")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val spec = canon(graft.fs.PointInTime.historicalFeatures(
      entity, feature, Seq("entity"), "event_ts", "fts", Seq("v"), Some("3 MINUTES"), Seq("fid")))
    val merge = canon(graft.fs.PointInTime.historicalFeaturesMerge(
      entity, feature, Seq("entity"), "event_ts", "fts", Seq("v"), Some("3 MINUTES"), Seq("fid")))
    assert(spec == merge)
    assert(spec.nonEmpty && spec.values.exists(_.isDefined) && spec.values.exists(_.isEmpty),
      "fixture should exercise both matched and unmatched probes")
  }

  test("writeOnline: incremental upserts equal one batched upsert, any order") {
    import graft.fs.OnlineStore
    val gen = for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      t <- Gen.chooseNum(0L, 50L) // coarse -> ts ties across batches
      v <- Gen.chooseNum(0.0, 100.0)
    } yield (k, new java.sql.Timestamp(t * 1000), v)
    // ids globally unique, per the documented determinism contract:
    // (ts, tieBreak) must uniquely identify a row within a key (duplicate
    // ids with different payloads tie arbitrarily — this property CAUGHT
    // that with a bound-biased id generator)
    val all = Gen.listOfN(140, gen).sample.get.zipWithIndex
      .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
    val batches = all.drop(20).grouped(40).toSeq.map(_.toDF("k", "t", "v", "id"))
    val base = all.take(20).toDF("k", "t", "v", "id")
    val snap0 = OnlineStore.latestSnapshot(base, Seq("k"), "t", Seq("id"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, java.sql.Timestamp, Double, Long)].collect().toSet

    val sequential = canon(batches.foldLeft(snap0)(
      (s, b) => OnlineStore.writeOnline(s, b, Seq("k"), "t", Seq("id"))))
    val batched = canon(OnlineStore.writeOnline(
      snap0, batches.reduce(_ unionByName _), Seq("k"), "t", Seq("id")))
    val reversed = canon(batches.reverse.foldLeft(snap0)(
      (s, b) => OnlineStore.writeOnline(s, b, Seq("k"), "t", Seq("id"))))
    assert(sequential == batched, "incremental must equal batched")
    assert(reversed == batched, "upsert order must not matter")
  }

  test("latestSnapshot is invariant under duplicated + shuffled input") {
    val rows = Gen.listOfN(200, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      t <- Gen.chooseNum(0L, 1000L)
      v <- Gen.chooseNum(0.0, 100.0)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (k, new java.sql.Timestamp(t * 1000), v, id)).sample.get
    val df = rows.toDF("k", "t", "v", "id")
    val doubled = df.union(df).repartition(7)
    val a = graft.fs.OnlineStore.latestSnapshot(df, Seq("k"), "t", Seq("id", "v"))
      .as[(String, java.sql.Timestamp, Double, Long)].collect().toSet
    val b = graft.fs.OnlineStore.latestSnapshot(doubled, Seq("k"), "t", Seq("id", "v"))
      .as[(String, java.sql.Timestamp, Double, Long)].collect().toSet
    assert(a == b)
  }
}
