package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.14: the typed-UDAF extension surface. The reference demonstrates a
  * composite-accumulator `AggregateFunction` (`AvgTs`,
  * `HotItems.scala:87-97`: (sum, count) → average of timestamps); this is
  * the Spark `Aggregator[IN, BUF, OUT]` restatement. Built-ins stay
  * preferred (`avg` is one line and codegen'd) — this type exists to pin
  * the extension point for aggregations Catalyst lacks.
  */
object TypedAggregators {

  /** Incremental average with an explicit (sum, count) accumulator. */
  class AvgLong extends Aggregator[Long, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Long): (Long, Long) =
      (b._1 + a, b._2 + 1)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2) // partial aggregation: map-side combine
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / b._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val avgLong: AvgLong = new AvgLong
}
