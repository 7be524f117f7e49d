package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.fs._

/** SURVEY §5.4: the whole reference pipeline on a synthetic fixture —
  * OpenWeather-shaped JSON → ingest → normalize → partitioned offline store
  * → feature derivation → PIT join → online snapshot → lookup — asserted
  * against hand-computed goldens. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("writeJsonArray: single array file, reference byte format, round-trips") {
    val tmp = Files.createTempDirectory("graft-jsonarr").toString
    val df = Seq(
      (1704067200L, 21.0, 105.75, 2L, 15.55),
      (1704070800L, 21.0, 105.75, 1L, 12.05),
      (1704074400L, 20.75, 106.75, 3L, 55.0)
    ).toDF("dt", "lat", "lon", "aqi_level", "pm2_5")
      .repartition(3) // multiple part files must still assemble in order
    Ingest.writeJsonArray(df, s"$tmp/landing.json")

    // byte shape: extract.py writes "[" + json.dumps joined by ",\n" + "]"
    val text = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/landing.json")), "UTF-8")
    assert(text.startsWith("[{") && text.endsWith("}]"), s"not a single JSON array: ${text.take(40)}")
    assert(text.count(_ == '\n') == 2, "records must be ,\\n-joined with no trailing newline")

    // readable back through the ingest path's array branch
    val back = spark.read.schema(df.schema).option("multiLine", "true")
      .json(s"$tmp/landing.json")
    assert(back.count() == 3)
    assert(back.as[(Long, Double, Double, Long, Double)].collect().toSet ==
      df.as[(Long, Double, Double, Long, Double)].collect().toSet)
  }

  test("json ingest → offline store → features → PIT join → online lookup") {
    val tmp = Files.createTempDirectory("graft-e2e").toString

    // 1. Land OpenWeather-shaped JSONL (extract.py:75-88 field set); values
    //    exercise rounding (15.556→15.56) and a breakpoint gap (12.05→8.5).
    val json = Seq(
      """{"dt":1704067200,"lat":21.0,"lon":105.75,"aqi_level":2,"co":1.0,"no":0.5,"no2":3.0,"o3":4.0,"so2":5.0,"pm2_5":15.556,"pm10":7.0,"nh3":8.0}""",
      """{"dt":1704070800,"lat":21.0,"lon":105.75,"aqi_level":1,"co":1.0,"no":0.5,"no2":3.0,"o3":4.0,"so2":5.0,"pm2_5":12.05,"pm10":7.0,"nh3":8.0}""",
      """{"dt":1704067200,"lat":20.75,"lon":106.75,"aqi_level":3,"co":1.0,"no":0.5,"no2":3.0,"o3":4.0,"so2":5.0,"pm2_5":null,"pm10":7.0,"nh3":8.0}"""
    )
    Files.write(java.nio.file.Paths.get(s"$tmp/raw.json"),
      json.mkString("\n").getBytes("UTF-8"))

    // 2. Ingest: schema'd scan → normalize → day-partitioned parquet
    val raw = Ingest.readRawJson(spark, s"$tmp/raw.json")
    // JSON sources are always-nullable; compare names+types only
    assert(raw.schema.map(f => (f.name, f.dataType)) ==
      Schemas.rawRecord.map(f => (f.name, f.dataType)))
    Ingest.writePartitioned(Ingest.normalize(raw), s"$tmp/lake")
    assert(new java.io.File(s"$tmp/lake/year=2024/month=1/day=1").isDirectory,
      "reference layout: unpadded partition values (load.py:177)")

    // 3. Feature derivation into the offline store
    val store = OfflineStore(spark, s"$tmp/store")
    val features = Ingest.deriveFeatures(spark.read.parquet(s"$tmp/lake"))
    store.append("aqi_info", features
      .withColumn("year", year(col("feature_timestamp")))
      .withColumn("month", month(col("feature_timestamp"))))

    val feats = store.read("aqi_info")
    val aqiByKey = feats.select("entity_id", "dt", "aqi").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // 15.556 rounds to 15.56 on ingest → band (12.1,35.4)
    val want = (100 - 51).toDouble / (35.4 - 12.1) * (15.56 - 12.1) + 51
    assert(aqiByKey(("21.0_105.75", 1704067200L)).exists(v => math.abs(v - want) < 1e-12))
    assert(aqiByKey(("21.0_105.75", 1704070800L)).contains(8.5)) // breakpoint gap → fallback
    assert(aqiByKey(("20.75_106.75", 1704067200L)).isEmpty) // null pm2_5 → null aqi

    // 4. Point-in-time training read (aqi_predict_hn.py:18-47 shape)
    val entity = Seq(
      ("21.0_105.75", java.sql.Timestamp.valueOf("2024-01-01 01:30:00")),
      ("21.0_105.75", java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      ("20.5_106.25", java.sql.Timestamp.valueOf("2024-01-01 01:00:00")) // no history
    ).toDF("entity_id", "event_timestamp")
    val pit = PointInTime.historicalFeatures(entity, feats, Seq("entity_id"),
      "event_timestamp", "feature_timestamp", Seq("aqi"), Some("7 DAYS"), Seq("dt"))
    val got = pit.select("entity_id", "event_timestamp", "aqi").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("21.0_105.75", "2024-01-01 01:30:00.0")).contains(8.5)) // latest = 01:00 row
    assert(got(("21.0_105.75", "2024-01-01 00:30:00.0"))
      .exists(v => math.abs(v - want) < 1e-12)) // only the 00:00 row qualifies
    assert(got(("20.5_106.25", "2024-01-01 01:00:00.0")).isEmpty) // apology path

    // 5. Online snapshot + lookup (latest wins; unknown key → nulls)
    val snap = OnlineStore.latestSnapshot(feats, Seq("entity_id"), "feature_timestamp", Seq("dt"))
    val lookedUp = OnlineStore.lookup(
      Seq("21.0_105.75", "9.9_9.9").toDF("entity_id"), snap, Seq("entity_id"), "feature_timestamp")
    val online = lookedUp.select("entity_id", "aqi").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(online("21.0_105.75").contains(8.5)) // the 01:00 reading is latest
    assert(online("9.9_9.9").isEmpty)

    // 6. Serving transforms on the looked-up row
    val served = Serving.withAqiLevel(Serving.nextHourFeatures(
      lookedUp.where(col("entity_id") === "21.0_105.75")))
    val row = served.select("hour", "next_hour", "last_hour_aqi", "aqi_level_label").collect().head
    assert(row.getInt(0) == 1 && row.getInt(1) == 2)
    assert(row.getDouble(2) == 8.5 && row.getString(3) == "Good")

    // 7. City resolution from free text (agent.py:29-33,56); duplicate
    //    query texts must each keep their own row
    val asks = Seq("AQI in Hanoi today?", "AQI in Hanoi today?", "how is Hai Phong",
      "what about mars").toDF("q")
    val rows = Serving.resolveCity(asks, "q")
      .select("q", "entity_id").collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
    assert(rows.length == 4, "duplicate queries must not collapse")
    val resolved = rows.toMap
    assert(resolved("AQI in Hanoi today?").contains("21.0_105.75"))
    assert(resolved("how is Hai Phong").contains("20.75_106.75"))
    assert(resolved("what about mars").isEmpty) // the apology path
  }
}
