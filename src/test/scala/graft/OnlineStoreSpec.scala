package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.fs.OnlineStore

class OnlineStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val hist = Seq(
    ("a", ts("2024-01-01 00:00:00"), 1.0, 1L),
    ("a", ts("2024-01-03 00:00:00"), 3.0, 2L),
    ("a", ts("2024-01-03 00:00:00"), 4.0, 3L), // ts tie -> max tieBreak id wins
    ("b", ts("2024-01-02 00:00:00"), 9.0, 4L)
  ).toDF("k", "t", "v", "id")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "id").as[(String, Double, Long)].collect().toSet

  test("latestSnapshot keeps one row per key — argmax by (ts, tieBreak)") {
    val got = OnlineStore.latestSnapshot(hist, Seq("k"), "t", Seq("id"))
    assert(snap(got) == Set(("a", 4.0, 3L), ("b", 9.0, 4L)))
  }

  test("windowed twin computes the identical snapshot") {
    val a = OnlineStore.latestSnapshot(hist, Seq("k"), "t", Seq("id"))
    val b = OnlineStore.latestSnapshotWindowed(hist, Seq("k"), "t", Seq("id"))
    assert(snap(a) == snap(b))
  }

  test("writeOnline upsert is idempotent and takes newer rows") {
    val snapshot = OnlineStore.latestSnapshot(hist, Seq("k"), "t", Seq("id"))
    val updates = Seq(
      ("a", ts("2024-01-04 00:00:00"), 7.0, 9L), // newer -> replaces
      ("b", ts("2024-01-01 00:00:00"), 0.0, 8L), // older -> ignored
      ("c", ts("2024-01-01 00:00:00"), 5.0, 7L)  // new key -> inserted
    ).toDF("k", "t", "v", "id")
    val once = OnlineStore.writeOnline(snapshot, updates, Seq("k"), "t", Seq("id"))
    val twice = OnlineStore.writeOnline(once, updates, Seq("k"), "t", Seq("id"))
    val want = Set(("a", 7.0, 9L), ("b", 9.0, 4L), ("c", 5.0, 7L))
    assert(snap(once) == want)
    assert(snap(twice) == want) // re-upserting the same rows is a no-op
  }

  test("lookup left-joins and nulls features past TTL") {
    val snapshot = Seq(
      ("a", ts("2024-01-10 00:00:00"), 1.0),
      ("b", ts("2024-01-01 00:00:00"), 2.0)
    ).toDF("k", "t", "v")
    val keys = Seq("a", "b", "zz").toDF("k")
    val got = OnlineStore.lookup(keys, snapshot, Seq("k"), "t",
      ttl = Some("7 DAYS"), asOf = Some(lit(ts("2024-01-11 00:00:00"))))
      .select("k", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("a" -> Some(1.0), "b" -> None, "zz" -> None))
  }

  test("pointLookupCache matches lookup per key — incl. TTL expiry and absent keys") {
    val snapshot = Seq(
      ("a", ts("2024-01-10 00:00:00"), 1.0),
      ("b", ts("2024-01-01 00:00:00"), 2.0), // past TTL at asOf
      ("c", ts("2024-01-11 00:00:00"), 3.0)
    ).toDF("k", "t", "v")
    val asOf = ts("2024-01-11 00:00:00")
    val probeKeys = Seq("a", "b", "c", "zz")

    val viaJoin = OnlineStore.lookup(probeKeys.toDF("k"), snapshot, Seq("k"), "t",
      ttl = Some("7 DAYS"), asOf = Some(lit(asOf)))
      .collect()
      .map(r => r.getString(0) -> Map("t" -> r.get(1), "v" -> r.get(2)))
      .toMap

    val cache = OnlineStore.pointLookupCache(snapshot, Seq("k"), "t",
      ttl = Some(java.time.Duration.ofDays(7)))
    assert(cache.size == 3)
    val viaCache = probeKeys.map(k => k -> cache.get(Seq(k), asOf.toInstant)).toMap

    assert(viaCache == viaJoin) // differential: map get ≡ broadcast join
    // no TTL -> raw row served as-is
    val raw = OnlineStore.pointLookupCache(snapshot, Seq("k"), "t")
    assert(raw.get(Seq("b")) == Map("t" -> ts("2024-01-01 00:00:00"), "v" -> 2.0))
  }
}
