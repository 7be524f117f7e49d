package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.fs.{FeatureStore, PointInTime, Registry}

/** The unified facade must run the reference's training and serving scripts
  * shape-for-shape: `store.get_historical_features(entity_df, features=
  * ["aqi_info_v1:hour", ...])` (model/aqi_predict_hn.py:18-47, including
  * the lag + dropna post-processing) and `store.get_online_features(
  * features, entity_rows)` (agent/aqi-agent/app/agent.py:73-76). */
class StoreFacadeSpec extends SparkSpec {
  import spark.implicits._

  private val entityId = "21.0_105.75"
  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2025-05-01 ${h}%02d:00:00")

  // hourly aqi_info history: feature at hour h carries aqi = 10*h
  private lazy val history = (0 until 24).map(h =>
    (entityId, ts(h), h, 1, 5, 10.0 * h, h.toLong))
    .toDF("entity_id", "feature_timestamp", "hour", "day", "dayOfWeek", "aqi", "fid")

  private lazy val store = new FeatureStore(
    Registry.defaultRegistry(),
    Map("aqi_info" -> history),
    tieBreaks = Map("aqi_info" -> Seq("fid")))

  private val refs = Seq("aqi_info_v1:hour", "aqi_info_v1:day",
    "aqi_info_v1:dayOfWeek", "aqi_info_v1:aqi")

  test("get_historical_features: reference entity_df shape, PIT-correct values") {
    // entity_df = entity_id × hourly event_timestamps (aqi_predict_hn.py:18-22);
    // probes at :30 so each should see the feature of the SAME hour
    val entityDf = (0 until 24).map(h =>
      (entityId, Timestamp.valueOf(f"2025-05-01 ${h}%02d:30:00")))
      .toDF("entity_id", "event_timestamp")
    val out = store.getHistoricalFeatures(entityDf, refs)
    assert(out.columns.toSeq ==
      Seq("entity_id", "event_timestamp", "hour", "day", "dayOfWeek", "aqi"))
    val rows = out.orderBy("event_timestamp")
      .select("hour", "aqi").as[(Int, Double)].collect()
    assert(rows.length == 24)
    rows.zipWithIndex.foreach { case ((h, aqi), i) =>
      assert(h == i && aqi == 10.0 * i, s"probe $i matched wrong feature row")
    }
  }

  test("get_historical_features: TTL excludes stale features; unknown entity → nulls") {
    val entityDf = Seq(
      (entityId, Timestamp.valueOf("2025-05-20 00:00:00")), // > 7d after history
      ("no_such_entity", ts(5))
    ).toDF("entity_id", "event_timestamp")
    val out = store.getHistoricalFeatures(entityDf, refs)
    assert(out.count() == 2)
    assert(out.where(col("aqi").isNotNull).count() == 0)
  }

  test("training post-processing: lag + dropna over the facade read (script steps 2)") {
    val entityDf = (0 until 24).map(h => (entityId, ts(h)))
      .toDF("entity_id", "event_timestamp")
    val training = store.getHistoricalFeatures(entityDf, refs)
    // training_df['last_hour_aqi'] = aqi.shift(1); dropna (aqi_predict_hn.py:40-47)
    val withLag = PointInTime.withLag(training, Seq("entity_id"),
      "event_timestamp", "aqi", "last_hour_aqi", 1, Nil).na.drop()
    val rows = withLag.orderBy("event_timestamp")
      .select("aqi", "last_hour_aqi").as[(Double, Double)].collect()
    assert(rows.length == 23) // first row dropped by the shift
    rows.zipWithIndex.foreach { case ((aqi, prev), i) =>
      assert(aqi == 10.0 * (i + 1) && prev == 10.0 * i)
    }
  }

  test("get_online_features: latest row per entity_rows key; absent key → nulls") {
    val keys = Seq(entityId, "absent").toDF("entity_id")
    val out = store.getOnlineFeatures(refs, keys)
    assert(out.columns.toSeq == Seq("entity_id", "hour", "day", "dayOfWeek", "aqi"))
    val byKey = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byKey(entityId).getInt(1) == 23 && byKey(entityId).getDouble(4) == 230.0)
    assert(byKey("absent").isNullAt(4))
  }

  test("get_online_features: asOf + view TTL expires stale snapshots to null") {
    val keys = Seq(entityId).toDF("entity_id")
    val fresh = store.getOnlineFeatures(refs, keys,
      asOf = Some(to_timestamp(lit("2025-05-02 00:00:00"))))
    assert(fresh.collect().head.getDouble(4) == 230.0)
    val stale = store.getOnlineFeatures(refs, keys,
      asOf = Some(to_timestamp(lit("2025-06-01 00:00:00")))) // > 7d TTL
    assert(stale.collect().head.isNullAt(4))
  }

  test("production wiring: facade over a real OfflineStore table") {
    import graft.fs.{FeatureStore, OfflineStore}
    val root = java.nio.file.Files.createTempDirectory("graft-facade-store").toString
    val offline = OfflineStore(spark, root)
    // day-partitioned feature history, two entities
    offline.append("aqi_info", history
      .withColumn("year", year(col("feature_timestamp")))
      .withColumn("month", month(col("feature_timestamp")))
      .withColumn("day", dayofmonth(col("feature_timestamp"))))
    val store = FeatureStore(offline, Registry.defaultRegistry(),
      tieBreaks = Map("aqi_info" -> Seq("fid")))

    val entityDf = Seq((entityId, ts(10))).toDF("entity_id", "event_timestamp")
    val hist = store.getHistoricalFeatures(entityDf, refs).collect().head
    assert(hist.getAs[Double]("aqi") == 100.0 && hist.getAs[Int]("hour") == 10)

    val online = store.getOnlineFeatures(refs, Seq(entityId).toDF("entity_id")).collect().head
    assert(online.getAs[Double]("aqi") == 230.0)

    // the snapshot is frozen at first use: appends after materialization
    // stay invisible until an explicit refresh (the Feast materialize step)
    val later = Seq((entityId, Timestamp.valueOf("2025-05-02 03:00:00"), 3, 2, 6, 999.0, 99L))
      .toDF("entity_id", "feature_timestamp", "hour", "day", "dayOfWeek", "aqi", "fid")
    offline.append("aqi_info", later
      .withColumn("year", year(col("feature_timestamp")))
      .withColumn("month", month(col("feature_timestamp")))
      .withColumn("day", dayofmonth(col("feature_timestamp"))))
    val frozen = store.getOnlineFeatures(refs, Seq(entityId).toDF("entity_id")).collect().head
    assert(frozen.getAs[Double]("aqi") == 230.0, "cached snapshot must be frozen pre-refresh")
    store.refreshOnline("aqi_info_v1")
    val refreshed = store.getOnlineFeatures(refs, Seq(entityId).toDF("entity_id")).collect().head
    assert(refreshed.getAs[Double]("aqi") == 999.0, "refreshOnline must see the append")
  }

  test("multi-view resolution joins each requested view once") {
    val refs2 = Seq("aqi_info_v1:aqi", "aqi_info_v2:hour")
    val entityDf = Seq((entityId, ts(5))).toDF("entity_id", "event_timestamp")
    val out = store.getHistoricalFeatures(entityDf, refs2)
    val r = out.collect().head
    assert(out.columns.toSeq == Seq("entity_id", "event_timestamp", "aqi", "hour"))
    assert(r.getDouble(2) == 50.0 && r.getInt(3) == 5)
  }
}
