package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query surface itself lives in [[Queries]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end training path: derive features → point-in-time join → lag
    * (the reference's aqi_predict_hn.py:18-47 shape). */
  def entry(spark: SparkSession): DataFrame =
    Queries.flagship(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops DuckDB can't express
    * (xxhash64-based sketches, the mapPartitions stub codec, the registry
    * catalog) → driver records a rows-only check for those. */
  def oracleSql: Map[String, String] = Queries.oracles
}
