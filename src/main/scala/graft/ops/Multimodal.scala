package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment) behind [[StubCodec]] — a deterministic fake that derives
  * plausible metadata from the bytes. Everything around it is real Spark:
  * the schema, the `mapPartitions` batch shape (one codec instance per
  * partition, reused across rows — exactly how a JNI/FFM decoder would be
  * held), partitioning, and the columnar feature outputs.
  */
object Multimodal {

  val decodedMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("checksum", LongType)
  ))

  /** Deterministic fake codec. A real deployment swaps this for an FFI
    * decoder (libjpeg/ffmpeg); the Spark plumbing is identical. */
  object StubCodec {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Long, Long) = {
      val n = if (payload == null) 0 else payload.length
      var h = 1125899906842597L // deterministic FNV-ish checksum
      var i = 0
      while (i < n) { h = h * 31 + payload(i); i += 1 }
      val width = 64 + math.floorMod(h, 512).toInt
      val height = 64 + math.floorMod(h >> 9, 512).toInt
      val durationMs = if (mediaType == "image") 0L else 1000L + math.floorMod(h >> 18, 60000L)
      (width, height, durationMs, h)
    }
  }

  /** Decode pass: binary assets → typed metadata. `mapPartitions` so a real
    * codec would be initialized once per partition, not per row. */
  def decodeMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val enc = RowEncoder.encoderFor(decodedMetaSchema)
    assets
      .select("asset_id", "media_type", "payload")
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val (w, h, d, ck) = StubCodec.decode(mt, payload)
          Row(id, mt, if (payload == null) 0L else payload.length.toLong, w, h, d, ck)
        }
      }(enc)
  }

  /** Pure-SQL metadata surface (oracle-friendly twin of the stub): byte
    * length + deterministic pseudo-dimensions computed columnar. */
  def metaColumns(assets: DataFrame): DataFrame =
    assets
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("width", (col("n_bytes") % 640 + 1).cast("int"))
      .withColumn("height", (col("n_bytes") % 480 + 1).cast("int"))
      .drop("payload")

  /** Resize planning: target dimensions fitting a bounding box, aspect ratio
    * preserved, never upscaled — the columnar metadata half of a real resize
    * (the pixel work happens in the stubbed codec). Input must carry
    * width/height columns (e.g. [[metaColumns]] output). */
  def resizeMeta(assets: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    assets
      .withColumn("out_width", greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("out_height", greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** Frame-sample stub: for video assets, emit one row per sampled frame
    * offset (every `everyMs`) — the explode shape a real frame extractor
    * produces; payload decode is stubbed to byte slices. */
  def sampleFrames(assets: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val withDur = decodeMeta(assets).where(col("media_type") === "video")
    withDur
      .withColumn("frame_ms", explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select("asset_id", "frame_ms", "width", "height")
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("feature", ArrayType(FloatType, containsNull = false))
  ))

  /** Feature-extraction pass: binary payload → fixed-dim embedding. The
    * model forward pass is STUBBED (deterministic bytes→float projection);
    * the Spark plumbing is the real thing a GPU/ONNX extractor needs —
    * `mapPartitions` so the model loads once per partition and rows batch
    * through it, fixed `ArrayType(FloatType)` output schema ready for the
    * similarity/dedup operators. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets
      .select("asset_id", "media_type", "payload")
      .mapPartitions { rows =>
        // per-partition model init would go here (session, weights, device)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val vec = new Array[Float](dim)
          var h = 1469598103934665603L
          val n = if (payload == null) 0 else payload.length
          var i = 0
          while (i < n) {
            h = (h ^ payload(i)) * 1099511628211L
            vec(i % dim) += (h % 1000L).toFloat / 1000f
            i += 1
          }
          Row(r.getLong(0), r.getString(1), vec.toSeq)
        }
      }(enc)
  }

  /** Build a media-asset frame from any (id, string) source — test fixture
    * helper that treats text bytes as the opaque payload. */
  def assetsFromText(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio").otherwise("video").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      map(lit("origin"), lit("text-fixture")).as("meta")
    )
}
