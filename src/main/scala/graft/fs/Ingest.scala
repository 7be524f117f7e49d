package graft.fs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest: raw JSON → typed, normalized, day-partitioned Parquet.
  *
  * Replaces the reference's driver-side `ijson` streaming parse + 25k-row
  * pandas batching + per-batch Arrow writes (airflow/dags/load.py:119-199)
  * with a single executor-parallel schema'd JSON scan and one distributed
  * partitioned write — Spark's reader is already incremental per input split,
  * so the hand-rolled batching disappears.
  */
object Ingest {

  /** Read raw records (JSONL or a JSON array file — multiLine handles the
    * reference's single-array format from extract.py:52-108). Malformed
    * numerics become null (cast semantics), matching the reference's
    * `to_numeric(errors='coerce')` (load.py:129). */
  def readRawJson(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(Schemas.rawRecord)
      .option("multiLine", multiLine)
      .json(path)

  /** Type-normalize: round the 10 float columns to 2 dp, derive partition
    * columns from the unix-seconds `dt`. Ref: load.py:121-132. */
  def normalize(df: DataFrame): DataFrame = {
    val rounded = (Schemas.pollutantCols ++ Seq("lat", "lon")).foldLeft(df) { (d, c) =>
      d.withColumn(c, round(col(c), 2))
    }
    val ts = to_timestamp(from_unixtime(col("dt")))
    rounded
      .withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
  }

  /** Day-partitioned Parquet write. Spark does the grouping, file naming and
    * schema the reference loader hand-rolled (load.py:150-182); partition
    * values are unpadded (`month=6`) exactly like the reference's layout. */
  def writePartitioned(df: DataFrame, root: String): Unit =
    df.write.mode("append").partitionBy("year", "month", "day").parquet(root)

  /** Byte-format-parity twin of the reference's raw landing file
    * (extract.py:52-108): ONE file holding a JSON array — `[` + records
    * joined by `",\n"` + `]`, record fields in schema order. Serialization
    * runs distributed (`toJSON` over executors, JSONL parts); only the
    * final assembly streams bytes through the driver (O(1) memory, no row
    * ever materialized driver-side), which is the honest cost of a
    * single-file format — the partitioned parquet sink remains the scale
    * path, this exists for compatibility with consumers of the reference's
    * landing file. Framing (`[`, `",\n"`, `]`) matches byte-for-byte;
    * records are compact JSON (json.dumps pads with `", "`/`": "` — a
    * semantically identical difference). Null-valued fields are rendered
    * explicitly (`"x":null`) like the reference's json.dumps: `toJSON`
    * would silently omit them, so records are serialized with
    * `to_json(struct(*), ignoreNullFields=false)` instead. */
  def writeJsonArray(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    import java.nio.charset.StandardCharsets.UTF_8
    val spark = df.sparkSession
    val tmp = new Path(path + "_jsonl_tmp")
    df.select(to_json(struct(col("*")), Map("ignoreNullFields" -> "false")).as("value"))
      .write.mode("overwrite").text(tmp.toString)
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(dst, true)
    try {
      out.write('[')
      var first = true
      val parts = fs.listStatus(tmp)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      for (part <- parts) {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(part.getPath), UTF_8))
        try {
          var line = in.readLine()
          while (line != null) {
            if (!first) out.write(",\n".getBytes(UTF_8))
            out.write(line.getBytes(UTF_8))
            first = false
            line = in.readLine()
          }
        } finally in.close()
      }
      out.write(']')
    } finally out.close()
    fs.delete(tmp, true)
  }

  /** Full feature derivation: calendar columns + entity key + native AQI.
    * One linear lineage — the whole reference Spark job
    * (write_to_bigquery.py:78-110) as a single Catalyst plan. */
  def deriveFeatures(df: DataFrame): DataFrame = {
    val ts = to_timestamp(from_unixtime(col("dt")))
    df.withColumn("feature_timestamp", ts)
      .withColumn("hour", hour(ts))
      .withColumn("day", dayofmonth(ts))
      .withColumn("dayOfWeek", dayofweek(ts))
      .withColumn("entity_id", Expressions.entityId(col("lat"), col("lon")))
      .withColumn("aqi", Expressions.aqiPm25(col("pm2_5")))
      .select("entity_id", "feature_timestamp", "dt", "lat", "lon", "aqi", "hour", "day", "dayOfWeek")
  }
}
