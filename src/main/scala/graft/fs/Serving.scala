package graft.fs

import org.apache.spark.sql.DataFrame
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
}
