package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** The custom codegen'd graft_dot expression vs the portable HOF form. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (2L, Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
    (3L, Array.empty[Float], Array.empty[Float])
  ).toDF("id", "a", "b")

  test("graft_dot is registered by GraftExtensions") {
    assert(spark.catalog.functionExists("graft_dot"))
  }

  test("native and HOF dot products are bit-identical") {
    val diff = vecs.select(
      call_function("graft_dot", col("a"), col("b")).as("n"),
      Similarity.dot(col("a"), col("b")).as("h"))
      .where(col("n") =!= col("h") || col("n").isNull =!= col("h").isNull)
    assert(diff.isEmpty)
  }

  test("known value, empty arrays, and length mismatch semantics") {
    val r = vecs.select(col("id"), call_function("graft_dot", col("a"), col("b")))
      .as[(Long, Option[Double])].collect().toMap
    assert(math.abs(r(1L).get - 32.0) < 1e-6)
    assert(r(3L).contains(0.0)) // empty · empty = 0 (same as HOF aggregate seed)
    val mismatch = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b"))).collect().head
    assert(mismatch.isNullAt(0))
    // mirrors the HOF form: zip_with pads with null -> null result
    val hofMismatch = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).collect().head
    assert(hofMismatch.isNullAt(0))
  }

  test("double-typed arrays and mixed float/double inputs work") {
    val d = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    val got = d.select(call_function("graft_dot", col("a"), col("b"))).as[Double].collect()
    assert(got.head == 13.0)
    val mixed = Seq((Array(1.5f, 2.5f), Array(2.0, 4.0))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b"))).as[Double].collect()
    assert(mixed.head == 13.0)
  }

  test("the expression participates in whole-stage codegen") {
    // a local relation would be constant-folded away — use a real scan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(call_function("graft_dot", col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*") && l.contains("Project")),
      s"expected codegen'd project:\n$plan")
  }

  test("similarity operators route through the native function when available") {
    // embeddingStats still matches its oracle-arithmetic under the native path
    val df = Seq((1L, Array(3f, 4f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.embeddingStats(df).select("l2_norm").as[Double].collect()
    assert(got.head == 5.0)
  }
}
