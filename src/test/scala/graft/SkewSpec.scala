package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Skew}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the shape that melts a single reducer
  private lazy val big = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 7}", i.toDouble)
  }.toDF("k", "v")

  private lazy val small = Seq(("hot", 10), ("k1", 1), ("k2", 2), ("k3", 3)).toDF("k", "w")

  test("saltedJoin result is identical to the plain join") {
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "w").as[(String, Double, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "v", "w").as[(String, Double, Int)].collect().sorted.toSeq
    assert(salted == plain)
    // the salt must actually spread the hot key across buckets
    val spread = big.withColumn("__salt", floor(rand(42L) * 8).cast("int"))
      .where(col("k") === "hot").select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("saltedJoin preserves left-outer misses") {
    val plain = big.join(small, Seq("k"), "left").count()
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8, joinType = "left").count()
    assert(salted == plain)
  }

  test("saltedSum matches the direct aggregate exactly") {
    val direct = big.groupBy("k").agg(sum("v").as("s"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(big, Seq("k"), "v", "s", salts = 8)
      .as[(String, Double)].collect().toMap
    assert(salted.keySet == direct.keySet)
    // sums of the same doubles in different order: compare with tolerance
    salted.foreach { case (k, s) => assert(math.abs(s - direct(k)) < 1e-6) }
  }

  test("exactByDigest groups the same duplicates as exact()") {
    val docs = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "cc"), (5L, "bb"))
      .toDF("doc_id", "text")
    val byText = Dedup.exact(docs).select("doc_id").as[Long].collect().toSet
    val byDigest = Dedup.exactByDigest(docs).select("doc_id").as[Long].collect().toSet
    assert(byDigest == byText)
    assert(byDigest == Set(1L, 2L, 4L))
  }
}
