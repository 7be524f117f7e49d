package graft
import org.apache.spark.sql.SparkSession

/** Scaling probe for SCALE.md: times the as-of/latest/derive paths and the
  * heavy extension operators at sf0.1 and at a scaled copy under /tmp/sfbig
  * (events ×10 history depth, documents ×3, embeddings ×10 — each copy's ids
  * offset). Regenerate with pyarrow (preserving the NANOS timestamp type):
  * {{{
  * t = pq.read_table('/root/testdata/sf0.1/events.parquet')
  * big = pa.concat_tables([t.set_column(t.schema.get_field_index('event_id'),
  *   'event_id', pc.add(t['event_id'], k*10_000_000)) for k in range(10)])
  * pq.write_table(big, '/tmp/sfbig/events.parquet')
  * # documents: range(3) on doc_id (+k*1_000_000); embeddings: range(10) on
  * # vec_id; copy the other tables unchanged
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
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    def time(q: String, dir: String): Unit = timed(s"$q @ $dir")(Queries.all(q)(spark, dir).count())
    // warm-up
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count()
    for (q <- Seq("q_latest_per_key", "q_asof_join_merge", "q_asof_join", "q_derive_features",
        "q_minhash_pairs", "q_kmeans_iter", "q_ngram_jaccard",
        "q_range_join", "q_range_join_merge", "q_ivf_refined_topk")) {
      time(q, "/root/testdata/sf0.1")
      time(q, "/tmp/sfbig")
    }
    // the stop-gram pruning knob that keeps the Jaccard self-join near-linear:
    // at ×3 duplicated docs every gram's df triples (candidate pairs ×9) —
    // pruning grams shared by >25 docs bounds the quadratic term
    val docs = spark.read.parquet("/tmp/sfbig/documents.parquet")
    timed("ngramJaccard maxNgramFreq=25 @ sfbig")(
      graft.ops.Dedup.ngramJaccard(docs, n = 3, threshold = 0.1, maxNgramFreq = Some(25)).count())
    // same trade for the simhash block join: ×3 duplicated docs triple every
    // block value's frequency (candidates ×9); the cap bounds the fan-out
    time("q_simhash_neardup", "/tmp/sfbig")
    timed("simhashNearDup maxBlockFreq=50 @ sfbig")(
      graft.ops.Dedup.simhashNearDup(docs, maxBlockFreq = Some(50)).count())
    spark.stop()
  }
}
