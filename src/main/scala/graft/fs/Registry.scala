package graft.fs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Feature registry: typed catalog of entities and feature views.
  *
  * Mirrors the Feast objects the reference registers
  * (feast/features/aqi_feature.py:6-45) as plain Scala case classes held in
  * an in-memory registry; `listViews`/`describe` cover the catalog surface
  * (feast/check_metadata.py:6-16).
  */
object Registry {

  final case class Entity(name: String, joinKeys: Seq[String], description: String = "")

  final case class Field(name: String, dtype: DataType, description: String = "")

  final case class FeatureView(
      name: String,
      entity: Entity,
      fields: Seq[Field],
      source: String,
      timestampField: String = "feature_timestamp",
      ttl: java.time.Duration = java.time.Duration.ofDays(7),
      online: Boolean = true,
      tags: Map[String, String] = Map.empty
  ) {
    def schema: StructType = StructType(fields.map(f => StructField(f.name, f.dtype)))
    def featureRefs: Seq[String] = fields.map(f => s"$name:${f.name}")
  }

  /** A parsed "view:field" feature reference (model/aqi_predict_hn.py:25-33). */
  final case class FeatureRef(view: String, field: String)

  def parseRef(ref: String): FeatureRef = ref.split(":", 2) match {
    case Array(v, f) => FeatureRef(v, f)
    case _           => throw new IllegalArgumentException(s"feature ref must be view:field, got '$ref'")
  }

  final class FeatureRegistry {
    private var views = Vector.empty[FeatureView]
    private var entities = Vector.empty[Entity]

    def applyEntity(e: Entity): this.type = { entities = entities.filterNot(_.name == e.name) :+ e; this }
    def applyView(v: FeatureView): this.type = { views = views.filterNot(_.name == v.name) :+ v; this }

    def listViews: Seq[FeatureView] = views
    def listEntities: Seq[Entity] = entities
    def view(name: String): FeatureView =
      views.find(_.name == name).getOrElse(throw new NoSuchElementException(s"no feature view '$name'"))

    /** Catalog render — the engine's `check_metadata` equivalent. */
    def describe(spark: SparkSession): DataFrame = {
      import spark.implicits._
      views
        .map(v =>
          (v.name, v.entity.name, v.fields.map(f => s"${f.name}:${f.dtype.simpleString}").mkString(","),
            v.source, v.ttl.toDays, v.online))
        .toDF("name", "entity", "fields", "source", "ttl_days", "online")
    }

    /** Resolve feature refs to (view, projected field names), grouped per view. */
    def resolve(refs: Seq[String]): Map[FeatureView, Seq[String]] =
      refs.map(parseRef).groupBy(_.view).map { case (v, rs) => view(v) -> rs.map(_.field) }
  }

  /** One JSON row per view for registry persistence. `ttlSeconds` is the
    * current format; `ttlDays` is read for registries written by the
    * earlier day-granularity format (a persisted catalog must stay
    * loadable across engine versions).
    *
    * NOT `private`: the Dataset encoder's generated `SafeProjection` lives
    * outside this object and cannot reference a private nested class —
    * Janino fails to compile and Spark silently falls back to interpreted
    * projection (an ERROR CodeGenerator line per run masking real codegen
    * regressions). Public-but-internal is the codegen-clean shape. */
  final case class PersistedField(name: String, dtype: String, description: String)
  final case class PersistedView(
      name: String, entityName: String, joinKeys: Seq[String], entityDescription: String,
      fields: Seq[PersistedField], source: String, timestampField: String,
      ttlSeconds: Option[Long], ttlDays: Option[Long], online: Boolean,
      tags: Map[String, String]) {
    def ttl: java.time.Duration = ttlSeconds.map(java.time.Duration.ofSeconds)
      .orElse(ttlDays.map(java.time.Duration.ofDays))
      .getOrElse(java.time.Duration.ZERO)
  }

  /** Persist the registry as JSON under `path` (any Hadoop-visible FS) —
    * the engine's equivalent of Feast's registry.db. Overwrites. */
  def save(spark: SparkSession, registry: FeatureRegistry, path: String): Unit = {
    import spark.implicits._
    registry.listViews.map { v =>
      // seconds, not days: toDays would silently truncate sub-day TTLs
      PersistedView(v.name, v.entity.name, v.entity.joinKeys, v.entity.description,
        v.fields.map(f => PersistedField(f.name, f.dtype.catalogString, f.description)),
        v.source, v.timestampField, Some(v.ttl.toSeconds), None, v.online, v.tags)
    }.toDS().coalesce(1).write.mode("overwrite").json(path)
  }

  /** Load a registry persisted by [[save]]. */
  def load(spark: SparkSession, path: String): FeatureRegistry = {
    import spark.implicits._
    val rows = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[PersistedView]].schema)
      .json(path).as[PersistedView].collect()
    val r = new FeatureRegistry
    rows.foreach { p =>
      val e = Entity(p.entityName, p.joinKeys, p.entityDescription)
      r.applyEntity(e)
      r.applyView(FeatureView(p.name, e,
        p.fields.map(f => Field(f.name, DataType.fromDDL(f.dtype), f.description)),
        p.source, p.timestampField, p.ttl, p.online, p.tags))
    }
    r
  }

  /** The reference's registry content, re-expressed (aqi_feature.py:6-45). */
  def defaultRegistry(): FeatureRegistry = {
    import org.apache.spark.sql.types._
    val entity = Entity("entity_id", Seq("entity_id"), "lat_lon grid cell")
    val fields = Seq(
      Field("hour", IntegerType, "hour of day"),
      Field("day", IntegerType, "day of month"),
      Field("dayOfWeek", IntegerType, "1=Sunday..7=Saturday (Spark convention)"),
      Field("aqi", DoubleType, "EPA PM2.5 AQI")
    )
    val r = new FeatureRegistry
    r.applyEntity(entity)
    r.applyView(FeatureView("aqi_info_v1", entity, fields, "aqi_info", tags = Map("version" -> "v1")))
    r.applyView(FeatureView("aqi_info_v2", entity, fields, "aqi_info", tags = Map("version" -> "v2")))
    r
  }
}
