package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{MinhashSigs, QuantizedDot}

/**
 * Session extensions for the graft engine: registers the native expressions
 * ([[graft.expressions.QuantizedDot]], [[graft.expressions.MinhashSigs]]).
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
      GraftExtensions.buildQuantizedDot))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      MinhashSigs.info,
      GraftExtensions.buildMinhashSigs))
  }
}

object GraftExtensions {

  private val buildQuantizedDot: Seq[Expression] => Expression =
    children => QuantizedDot(children(0), children(1))

  private val buildMinhashSigs: Seq[Expression] => Expression = { children =>
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sigs: $what must be an integer literal, got $other")
    }
    MinhashSigs(
      children(0),
      intLit(children(1), "numHashes"),
      intLit(children(2), "shingle"))
  }

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot", buildQuantizedDot, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", buildMinhashSigs, "scala_udf")
  }
}
