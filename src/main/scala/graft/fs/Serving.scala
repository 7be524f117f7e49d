package graft.fs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-path transforms: next-hour prediction inputs + AQI level labels.
  *
  * Re-expresses the agent's inference prep (agent/aqi-agent/app/agent.py:88-112)
  * as columnar transforms over a looked-up feature row.
  */
object Serving {

  /** Given looked-up online features (hour, day, dayOfWeek, aqi, ...), build
    * the next-hour prediction input row with clock rollover (agent.py:88-90)
    * and keep the current AQI as the lag feature. */
  def nextHourFeatures(df: DataFrame): DataFrame = {
    val (h, d, w) = Expressions.nextHour(col("hour"), col("day"), col("dayOfWeek"))
    df.withColumn("next_hour", h)
      .withColumn("next_day", d)
      .withColumn("next_dayOfWeek", w)
      .withColumn("last_hour_aqi", col("aqi"))
  }

  /** Attach the human-readable AQI bucket (agent.py:103-107). */
  def withAqiLevel(df: DataFrame, aqiCol: String = "aqi", out: String = "aqi_level_label"): DataFrame =
    df.withColumn(out, Expressions.aqiLevel(col(aqiCol)))

  /** The reference's city → entity-key map (agent.py:29-33). */
  val CityEntities: Seq[(String, String)] = Seq(
    ("hanoi", "21.0_105.75"),
    ("hai phong", "20.75_106.75"),
    ("thai binh", "20.5_106.25"))

  /** Resolve free-text queries to entity keys by case-insensitive substring
    * city match (agent.py:56's lower/contains). Unmatched rows keep a null
    * entity_id — the caller's "no data for that city" path. Broadcast join
    * against the tiny city table; ambiguous texts resolve to the first
    * matching city in [[CityEntities]] order (deterministic). Row identity
    * comes from a synthetic id, so duplicate query texts each keep their
    * own output row (an all-columns window would merge them). */
  def resolveCity(queries: DataFrame, textCol: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cities = CityEntities.zipWithIndex
      .map { case ((c, e), i) => (c, e, i) }.toDF("__city", "__entity", "__ord")
    queries
      .withColumn("__qid", monotonically_increasing_id())
      .join(broadcast(cities), contains(lower(col(textCol)), col("__city")), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__qid"))
          .orderBy(col("__ord").asc_nulls_last)))
      .where(col("__rn") === 1)
      .withColumn("city", col("__city"))
      .withColumn("entity_id", col("__entity"))
      .drop("__city", "__entity", "__ord", "__rn", "__qid")
  }
}
