package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (the Dataset-native custom aggregation
  * API — case-class buffer, compile-time row types via Encoders):
  * exact integer order stats over (key, cents) pairs. Spark plans it
  * as a regular partial+final aggregate (map-side combine through
  * `merge`), so the typed safety costs nothing at the exchange; all
  * fields are exact integers, so the result hash-checks cross-engine.
  */
object TypedStats {

  /** Buffer/output: count, exact cent sum, min, max. */
  final case class CentStats(n: Long, cents: Long, mn: Long, mx: Long)

  /** IN = (groupKeyAlreadyApplied, cents) tuple element of the typed
    * Dataset; the key is handled by groupByKey outside. */
  object CentStatsAgg extends Aggregator[(String, Long), CentStats, CentStats] {
    override def zero: CentStats =
      CentStats(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: CentStats, a: (String, Long)): CentStats =
      CentStats(b.n + 1, b.cents + a._2, math.min(b.mn, a._2), math.max(b.mx, a._2))
    override def merge(x: CentStats, y: CentStats): CentStats =
      CentStats(x.n + y.n, x.cents + y.cents,
        math.min(x.mn, y.mn), math.max(x.mx, y.mx))
    override def finish(b: CentStats): CentStats = b
    override def bufferEncoder: Encoder[CentStats] = Encoders.product
    override def outputEncoder: Encoder[CentStats] = Encoders.product
  }
}
