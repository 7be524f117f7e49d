package graft.fs

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table the engine touches — reads always
  * pass a schema (the reference infers on read, write_to_bigquery.py:78;
  * explicit schemas are the scale-safe choice: no sampling pass, no drift).
  * Shapes per FIXTURES.md.
  */
object Schemas {

  /** Raw pollution record (one grid point × one hour).
    * Ref fields: airflow/dags/extract.py:75-88. */
  val rawRecord: StructType = StructType(Seq(
    StructField("dt", LongType, nullable = false),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("aqi_level", LongType),
    StructField("co", DoubleType),
    StructField("no", DoubleType),
    StructField("no2", DoubleType),
    StructField("o3", DoubleType),
    StructField("so2", DoubleType),
    StructField("pm2_5", DoubleType),
    StructField("pm10", DoubleType),
    StructField("nh3", DoubleType)
  ))

  val pollutantCols: Seq[String] =
    Seq("co", "no", "no2", "o3", "so2", "pm2_5", "pm10", "nh3")

  /** Feature row (offline store `aqi_info` projection).
    * Ref: write_to_bigquery.py:110 + FIXTURES.md §3. */
  val featureRow: StructType = StructType(Seq(
    StructField("entity_id", StringType, nullable = false),
    StructField("feature_timestamp", TimestampType),
    StructField("dt", LongType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("aqi", DoubleType),
    StructField("hour", IntegerType),
    StructField("day", IntegerType),
    StructField("dayOfWeek", IntegerType)
  ))

  /** Metadata tables. Ref: write_to_bigquery.py:139-147,179-208. */
  val lineage: StructType = StructType(
    Seq("name", "version", "source", "transformation_file", "timestamp")
      .map(StructField(_, StringType)))

  val featureMetadata: StructType = StructType(
    Seq("feature_name", "version", "formula", "description", "created_at")
      .map(StructField(_, StringType)))

  /** Extension tables (driver testdata, FIXTURES.md §7). */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  /** Multimodal: opaque binary payload + typed metadata (extension). */
  val mediaAsset: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))
  ))
}
