package graft

import org.apache.spark.sql.functions._
import graft.fs.Expressions

/** AQI breakpoint edges/gaps, level buckets, entity key, clock rollover —
  * the §1.4 semantics SURVEY commits to. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def aqiOf(values: Seq[java.lang.Double]): Seq[java.lang.Double] =
    values.toDF("pm25")
      .select(Expressions.aqiPm25(col("pm25")).as("aqi"))
      .collect().map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))).toSeq

  test("aqiPm25: breakpoint edges are exact") {
    val got = aqiOf(Seq(0.0, 12.0, 12.1, 35.4, 35.5, 500.4))
    assert(got(0) == 0.0)
    assert(got(1) == 50.0)
    assert(got(2) == 51.0)
    assert(got(3) == 100.0)
    assert(got(4) == 101.0)
    assert(got(5) == 500.0)
  }

  test("aqiPm25: gap values and out-of-range hit the canonical 8.5 fallback") {
    // the EPA table has holes, e.g. 12.0 < c < 12.1 (write_to_bigquery.py:93-101)
    val got = aqiOf(Seq(12.05, 35.45, -1.0, 500.41, 9999.0))
    assert(got.forall(_ == 8.5))
  }

  test("aqiPm25: null in, null out; None fallback yields null out-of-range") {
    assert(aqiOf(Seq(null)) == Seq(null))
    val noFb = Seq[java.lang.Double](12.05).toDF("pm25")
      .select(Expressions.aqiPm25(col("pm25"), fallback = None).as("aqi"))
      .collect()(0)
    assert(noFb.isNullAt(0))
  }

  test("aqiPm25 reference variants: loader rounds half-to-even + null fallback, online falls back to 500") {
    // loader (load.py:104-117): Python round() = banker's rounding = bround
    val in = Seq[java.lang.Double](10.0, 12.05, 600.0, null).toDF("pm25")
    val loader = in.select(Expressions.aqiPm25Loader(col("pm25"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    val expectIn = math.rint(50.0 / 12.0 * 10.0) // same double arithmetic, half-to-even
    assert(loader(0) == expectIn)
    assert(loader(1) == null && loader(2) == null && loader(3) == null,
      "gap / out-of-range / null must all be null in the loader variant")
    // online (redis_data.py:29-42): unrounded in-range, 500 out-of-range
    val online = in.select(Expressions.aqiPm25Online(col("pm25"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(online(0) == 50.0 / 12.0 * 10.0)
    assert(online(1) == 500.0 && online(2) == 500.0)
    assert(online(3) == null)
  }

  test("aqiPm25: linear interpolation inside a band") {
    // midpoint of (12.1, 35.4) -> midpoint of (51, 100)
    val mid = (12.1 + 35.4) / 2
    val expected = (100 - 51).toDouble / (35.4 - 12.1) * (mid - 12.1) + 51.0
    assert(aqiOf(Seq(mid)) == Seq(Double.box(expected)))
  }

  test("aqiPm25Sql twin: the generated SQL computes bit-identical doubles") {
    val df = Seq(0.0, 5.3, 12.0, 12.05, 20.7, 55.5, 151.2, 350.5, 444.4, 500.4, 501.0)
      .toDF("value")
    val both = df.select(
      Expressions.aqiPm25(col("value")).as("a"),
      expr(Expressions.aqiPm25Sql("value")).as("b"))
    assert(both.where(col("a") =!= col("b") || col("a").isNull =!= col("b").isNull).isEmpty)
  }

  test("aqiLevel buckets match agent.py:103-107") {
    val got = Seq(10.0, 50.0, 50.1, 100.0, 150.0, 151.0)
      .toDF("aqi").select(Expressions.aqiLevel(col("aqi"))).as[String].collect().toSeq
    assert(got == Seq("Good", "Good", "Moderate", "Moderate", "Sensitive", "Polluted"))
  }

  test("entityId joins key columns with underscores (write_to_bigquery.py:87)") {
    val got = Seq((21.0, 105.75)).toDF("lat", "lon")
      .select(Expressions.entityId(col("lat"), col("lon"))).as[String].collect()
    assert(got.head == "21.0_105.75")
  }

  test("aqiPm25Udf parity twin agrees with the codegen'd expression everywhere") {
    val samples = (-50 to 550).map(_ + 0.37) ++
      Expressions.AqiBreakpoints.flatMap { case (lo, hi, _, _) => Seq(lo, hi) }
    val df = samples.toDF("pm25")
    val diff = df.select(
      Expressions.aqiPm25(col("pm25")).as("a"),
      Expressions.aqiPm25Udf(col("pm25")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("dateInText parses d/m and d/m/y from free text (agent.py:43-52)") {
    val df = Seq("aqi on 5/6 please", "what about 15/06/2025?", "no date here",
      "impossible 31/2 date")
      .toDF("q")
    val got = df.select(Expressions.dateInText(col("q"), lit(2024)).cast("string"))
      .collect().map(r => Option(r.getString(0))).toSeq
    // invalid calendar date degrades to null instead of an ANSI-mode abort
    assert(got == Seq(Some("2024-06-05"), Some("2025-06-15"), None, None))
  }

  test("nowInZone shifts the fixed-UTC session clock (redis_data.py:64)") {
    val r = spark.range(1).select(
      Expressions.nowInZone("Asia/Ho_Chi_Minh").cast("long").as("hcm"),
      current_timestamp().cast("long").as("utc")).collect().head
    assert(r.getLong(0) - r.getLong(1) == 7 * 3600) // UTC+7, no DST
  }

  test("nextHour rolls day and dayOfWeek at 23:00 (agent.py:88-90)") {
    val df = Seq((23, 15, 7), (10, 15, 7)).toDF("hour", "day", "dayOfWeek")
    val (h, d, w) = Expressions.nextHour(col("hour"), col("day"), col("dayOfWeek"))
    val got = df.select(h.as("h"), d.as("d"), w.as("w")).as[(Int, Int, Int)].collect().toSeq
    assert(got == Seq((0, 16, 1), (11, 15, 7)))
  }
}
