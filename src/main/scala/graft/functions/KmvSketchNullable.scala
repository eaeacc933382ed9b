package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** [[KmvSketch]] over a NULLABLE hash column — null inputs are skipped,
  * matching SQL aggregate semantics (`count(DISTINCT v)` ignores nulls)
  * and the batch profile's explicit pre-filter. Exists for single-pass
  * aggregations that must keep null-bearing rows in the SAME groupBy the
  * sketch runs in (the streaming profile: one aggregation is all a
  * streaming query gets, so null counters and the sketch share it).
  * Everything else delegates to [[KmvSketch]] — same buffer, same merge,
  * same estimator — so a null-free column sketches identically through
  * either entry point. */
object KmvSketchNullable extends Aggregator[java.lang.Long, Array[Long], Long] {
  override def zero: Array[Long] = KmvSketch.zero
  override def reduce(b: Array[Long], h: java.lang.Long): Array[Long] =
    if (h == null) b else KmvSketch.reduce(b, h.longValue())
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvSketch.merge(a, b)
  override def finish(b: Array[Long]): Long = KmvSketch.finish(b)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
