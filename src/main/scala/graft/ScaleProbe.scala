package graft
import org.apache.spark.sql.SparkSession

/** Scaling probe for SCALE.md: times the as-of/latest/derive paths at sf0.1
  * and at a 10×-deeper-history copy under /tmp/sfbig. Regenerate that copy
  * with pyarrow (preserving the NANOS timestamp type):
  * {{{
  * t = pq.read_table('/root/testdata/sf0.1/events.parquet')
  * big = pa.concat_tables([t.set_column(t.schema.get_field_index('event_id'),
  *   'event_id', pc.add(t['event_id'], k*10_000_000)) for k in range(10)])
  * pq.write_table(big, '/tmp/sfbig/events.parquet')  # + copy other tables
  * }}}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, dir: String): Unit = {
      val t0 = System.nanoTime()
      val n = Queries.all(name)(spark, dir).count()
      println(f"PROBE $name%-24s $dir%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    // warm-up
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count()
    for (q <- Seq("q_latest_per_key", "q_asof_join_merge", "q_asof_join", "q_derive_features")) {
      time(q, "/root/testdata/sf0.1")
      time(q, "/tmp/sfbig")
    }
    spark.stop()
  }
}
