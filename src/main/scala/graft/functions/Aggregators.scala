package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates (`org.apache.spark.sql.expressions.Aggregator`)
  * — the custom-AGGREGATE extension surface, complementing this package's
  * custom scalar codegen expressions. Usable three ways: as a
  * `TypedColumn` on `Dataset[T]` (`.toColumn`), as a DataFrame column
  * function (via `udaf`), and from SQL once registered
  * (`GraftExtensions.install`).
  *
  * Determinism: the buffer is exact decimal arithmetic
  * (`BigDecimal.valueOf(double)` = the double's shortest decimal
  * representation), so partial aggregation is associative and commutative
  * — results are bit-identical across partitionings and merge orders,
  * unlike a naive double-sum buffer. The price is ObjectHashAggregate
  * (JVM objects, no codegen): for a PLAIN sum prefer the decimal-cast
  * builtin (the `decSum` pattern in Queries); an Aggregator earns its
  * keep for composed aggregates like this ratio of co-summed terms,
  * which a builtin cannot keep in one exact buffer.
  */
object Aggregators {

  /** Exact-buffer weighted mean: Σ(w·x) / Σ(w) with decimal partials and
    * one double division at finish (num and den each exactly rounded to
    * double, so any engine summing the same decimals agrees bit-for-bit).
    * Inputs are (value, weight); zero total weight finishes to NaN.
    */
  object WeightedMean
      extends Aggregator[(Double, Long), (JBigDecimal, Long), Double] {
    override def zero: (JBigDecimal, Long) = (JBigDecimal.ZERO, 0L)
    override def reduce(b: (JBigDecimal, Long),
                        in: (Double, Long)): (JBigDecimal, Long) =
      (b._1.add(JBigDecimal.valueOf(in._1)
        .multiply(JBigDecimal.valueOf(in._2))), b._2 + in._2)
    override def merge(a: (JBigDecimal, Long),
                       b: (JBigDecimal, Long)): (JBigDecimal, Long) =
      (a._1.add(b._1), a._2 + b._2)
    override def finish(b: (JBigDecimal, Long)): Double =
      if (b._2 == 0L) Double.NaN else b._1.doubleValue() / b._2.toDouble
    // system decimal encoder is DecimalType(38, 18): the buffer's scale is
    // bounded by the value's decimal places (quality scores carry <= 6),
    // so storage through it stays exact
    override def bufferEncoder: Encoder[(JBigDecimal, Long)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DataFrame/SQL-facing weighted mean: `weighted_mean(x, w)`. */
  val weighted_mean: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(WeightedMean)
}
