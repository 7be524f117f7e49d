package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset surface: case-class Encoders, typed transforms, and a
  * custom Aggregator — the compile-time-checked face of the same engine
  * (the DataFrame operators remain the hot path; this proves the typed
  * API interoperates with them). */
// Encoder-bearing case classes must be top-level — inner classes of a test
// suite can't be resolved by the encoder's outer-scope machinery.
case class TypedEvent(event_id: Long, user_id: Long, event_type: String, value: Double)

class TypedApiSpec extends SparkSpec {
  import spark.implicits._
  import TypedApiSpec.MeanAgg
  type Event = TypedEvent
  private lazy val ds: Dataset[Event] = {
    // events.ts is TIMESTAMP(NANOS): schema conversion needs the long mode
    // even when the column is pruned away
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }

  test("typed filter + groupByKey + custom Aggregator matches the untyped plan") {
    val typed = ds.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .agg(MeanAgg.toColumn.name("mean_value"))
      .collect().toMap
    val untyped = ds.toDF().where(col("event_type") === "purchase")
      .groupBy("user_id").agg(avg("value").as("mean_value"))
      .as[(Long, Double)].collect().toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-9) }
  }

  test("typed map/flatMap compose with DataFrame operators in one plan") {
    val enriched = ds.map(e => e.copy(value = e.value * 2))
      .toDF()
      .groupBy("event_type").agg(round(sum("value"), 2).as("doubled_sum"))
    val base = ds.toDF().groupBy("event_type").agg(round(sum("value") * 2, 2).as("doubled_sum"))
    val a = enriched.as[(String, Double)].collect().toMap
    val b = base.as[(String, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-6) }
  }
}

object TypedApiSpec {
  /** Two-field mean aggregator (sum, count). */
  object MeanAgg extends Aggregator[TypedEvent, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), e: TypedEvent): (Double, Long) = (b._1 + e.value, b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
