package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles without the `percentile` aggregate's per-group value
  * buffer.
  *
  * Spark's exact `percentile` aggregate materializes every group's value
  * multiset in executor memory (an OpenHashMap per group inside the
  * aggregation buffer) — on 100 TB groups that is an OOM, not a slowdown.
  * This formulation is the spillable twin: ONE shuffle on the group key,
  * then rank arithmetic over externally-sorted windows —
  *
  *   - `row_number` over (group, value) gives each row its 0-indexed rank;
  *   - the group size arrives from an unordered count window on the SAME
  *     partitioning (no extra exchange);
  *   - the interpolated percentile p sits at position p·(n−1); the rows at
  *     `floor` and `ceil` of that position contribute `(hi−pos)·v` and
  *     `(pos−lo)·v` — exactly `Percentile.getPercentile`'s formula, so the
  *     result is bit-identical to the aggregate (IEEE addition of the two
  *     contributions is commutative, so the final sum can't drift);
  *   - a plain hash aggregate sums the (almost all null) contributions.
  *
  * Window sort state is Spark's external sorter — it spills; group size no
  * longer bounds memory. k distinct value columns cost k sorts over one
  * exchange. That is the 100×-scale trade: more sort I/O, zero OOM surface.
  */
object Quantiles {

  /** One requested percentile: `p` of `valueCol`, emitted as `alias`. */
  final case class Spec(valueCol: String, p: Double, alias: String) {
    require(p >= 0.0 && p <= 1.0, s"percentile must be in [0,1], got $p")
  }

  /** Exact interpolated percentiles per `groupCol` group, plus a row count
    * `n` — the drop-in twin of a `groupBy(g).agg(percentile(...), ...)`
    * (same values after the caller-visible `roundTo` rounding, same oracle). */
  def rankedPercentiles(
      df: DataFrame,
      groupCol: String,
      specs: Seq[Spec],
      roundTo: Int = 4
  ): DataFrame = {
    require(specs.nonEmpty, "need at least one percentile spec")
    val g = col(groupCol)
    val valueCols = specs.map(_.valueCol).distinct
    // NULL parity with the percentile aggregate (which ignores NULLs
    // entirely): rank arithmetic runs over PER-COLUMN non-null counts
    // (`count(col)` skips nulls) with nulls ordered LAST, so non-null rows
    // occupy ranks 0..n_i-1 and a null row (rank ≥ n_i > pos) can never
    // match the interpolation positions. One shared count would shift every
    // position whenever columns have different null sets. The caller-visible
    // `n` stays the total ROW count (the frame's own row-count column).
    // All windows share the group partitioning -> one exchange, k sorts.
    val sized = valueCols.zipWithIndex.foldLeft(
      df.withColumn("__n", count(lit(1)).over(Window.partitionBy(g)))) {
      case (d, (vc, i)) =>
        d.withColumn(s"__nn_$i", count(col(vc)).over(Window.partitionBy(g)))
    }
    val ranked = valueCols.zipWithIndex.foldLeft(sized) { case (d, (vc, i)) =>
      d.withColumn(s"__rn_$i",
        row_number().over(Window.partitionBy(g).orderBy(col(vc).asc_nulls_last)))
    }
    val aggs = specs.map { sp =>
      val i = valueCols.indexOf(sp.valueCol)
      val rn0 = (col(s"__rn_$i") - 1).cast("long")
      val pos = lit(sp.p) * (col(s"__nn_$i") - 1).cast("double") // 0-indexed
      val lo = floor(pos)
      val hi = ceil(pos)
      val v = col(sp.valueCol).cast("double")
      // Percentile.getPercentile verbatim: lo==hi -> the value itself;
      // otherwise linear interpolation split across the two ranked rows
      val contrib = when(rn0 === lo && lo === hi, v)
        .when(rn0 === lo, (hi.cast("double") - pos) * v)
        .when(rn0 === hi, (pos - lo.cast("double")) * v)
      round(sum(contrib), roundTo).as(sp.alias)
    } :+ count(lit(1)).as("n")
    ranked.groupBy(g).agg(aggs.head, aggs.tail: _*)
  }
}
