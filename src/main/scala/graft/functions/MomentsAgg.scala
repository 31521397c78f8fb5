package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer power sums for one (x, y) pair of long-valued columns. */
final case class Moments(n: Long, sx: Long, sxx: Long, sy: Long, syy: Long, sxy: Long)

/** Derived descriptive statistics — each a fixed double expression over
  * the exact integer sums (one division / sqrt per statistic, identical
  * IEEE op order to the SQL formulation in `Relational.statsKernel`). */
final case class MomentStats(
    n: Long, mean_qty: Double, var_qty: Double, sd_qty: Double, corr_qty_line: Double)

/** The descriptive-stats kernel as a TYPED `Aggregator` — the public
  * typed-Dataset aggregation API, deliberately a DIFFERENT machinery
  * class from the engine's Catalyst-internal aggregates (three
  * `TypedImperativeAggregate`s and the declarative [[BitmapAgg]]): an
  * `Aggregator` is what a LIBRARY USER writes without touching Catalyst —
  * case-class buffers through `Encoders.product`, plain Scala
  * reduce/merge, `.toColumn` into `groupByKey.agg`. The buffer is six
  * longs (constant width, map-side combined through the standard
  * object-hash-aggregate path), and `finish` computes each statistic as
  * ONE fixed double expression over the exact integer sums — the same
  * cross-engine-determinism discipline as the SQL twin `r_stats_kernel`,
  * whose oracle this aggregator shares verbatim (partition-order
  * independence comes free: longs add exactly in any order).
  *
  * Input is the full grouped element (flag, x, y); the key field rides
  * along untouched because `groupByKey.agg` hands the aggregator whole
  * rows. */
object MomentsAgg extends Aggregator[(String, Long, Long), Moments, MomentStats] {

  override def zero: Moments = Moments(0L, 0L, 0L, 0L, 0L, 0L)

  override def reduce(b: Moments, a: (String, Long, Long)): Moments = {
    val (_, x, y) = a
    Moments(b.n + 1, b.sx + x, b.sxx + x * x, b.sy + y, b.syy + y * y, b.sxy + x * y)
  }

  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sx + b.sx, a.sxx + b.sxx,
      a.sy + b.sy, a.syy + b.syy, a.sxy + b.sxy)

  override def finish(m: Moments): MomentStats = {
    val varQty = (m.n * m.sxx - m.sx * m.sx).toDouble /
      (m.n * (m.n - 1)).toDouble
    MomentStats(
      n = m.n,
      mean_qty = m.sx.toDouble / m.n.toDouble,
      var_qty = varQty,
      sd_qty = math.sqrt(varQty),
      corr_qty_line = (m.n * m.sxy - m.sx * m.sy).toDouble /
        (math.sqrt((m.n * m.sxx - m.sx * m.sx).toDouble) *
          math.sqrt((m.n * m.syy - m.sy * m.sy).toDouble)))
  }

  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[MomentStats] = Encoders.product[MomentStats]
}
