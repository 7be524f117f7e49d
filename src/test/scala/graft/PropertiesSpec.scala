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
