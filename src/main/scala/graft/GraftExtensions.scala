package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.expressions.QuantizedDot

/**
 * Session extensions for the graft engine: registers the native expressions
 * (currently [[graft.expressions.QuantizedDot]]).
 *
 * Install either at build time —
 * `SparkSession.builder.withExtensions(new GraftExtensions)` or
 * `--conf spark.sql.extensions=graft.GraftExtensions` — or at runtime on an
 * existing session with [[GraftExtensions.register]] (idempotent), which is
 * what the driver-contract query entry points do.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("quantized_dot"),
      QuantizedDot.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizedDot(children(0), children(1))))
  }
}

object GraftExtensions {
  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantizedDot(children(0), children(1)),
      "scala_udf")
}
