package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the §2.7 U2 extension surface): numerically
  * stable streaming variance via Welford's online algorithm with the
  * Chan et al. parallel merge — the mergeable form is what makes it correct
  * under Spark's partial/final aggregation at any partition count.
  *
  * Usable as a typed `Aggregator` on `Dataset`s or registered through
  * `functions.udaf` for DataFrame/SQL use.
  */
case class VarState(n: Long, mean: Double, m2: Double)

object WelfordVar extends Aggregator[Double, VarState, Double] {
  override def zero: VarState = VarState(0L, 0.0, 0.0)

  override def reduce(s: VarState, x: Double): VarState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    VarState(n, mean, s.m2 + d * (x - mean))
  }

  /** Chan/Golub/LeVeque pairwise merge. */
  override def merge(a: VarState, b: VarState): VarState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      VarState(
        n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }
  }

  /** Sample variance (n-1 denominator, like `var_samp`); NaN below 2 obs. */
  override def finish(s: VarState): Double =
    if (s.n < 2) Double.NaN else s.m2 / (s.n - 1)

  override def bufferEncoder: Encoder[VarState] = Encoders.product[VarState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
