package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{DocKernels, MinhashSigs, QuantizedDot}

/**
 * Session extensions for the graft engine: registers the native expressions
 * ([[graft.expressions.QuantizedDot]], [[graft.expressions.MinhashSigs]],
 * and the per-document kernels in [[graft.expressions.DocKernels]]).
 *
 * Install either at build time —
 * `SparkSession.builder.withExtensions(new GraftExtensions)` or
 * `--conf spark.sql.extensions=graft.GraftExtensions` — or at runtime on an
 * existing session with [[GraftExtensions.register]] (idempotent), which is
 * what the driver-contract query entry points do.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private val functions: Seq[
      (String, org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)] = Seq(
    ("quantized_dot", QuantizedDot.info,
      (c: Seq[Expression]) => QuantizedDot(c(0), c(1))),
    ("minhash_sigs", MinhashSigs.info,
      (c: Seq[Expression]) => MinhashSigs(
        c(0),
        intLit(c(1), "minhash_sigs", "numHashes"),
        intLit(c(2), "minhash_sigs", "shingle"))),
    ("simhash32", DocKernels.simhashInfo,
      (c: Seq[Expression]) => DocKernels.Simhash32(c(0))),
    ("min_shingle_hash", DocKernels.minShingleInfo,
      (c: Seq[Expression]) => DocKernels.MinShingleHash(
        c(0), intLit(c(1), "min_shingle_hash", "n"))),
    ("repetition_stats", DocKernels.repetitionInfo,
      (c: Seq[Expression]) => DocKernels.RepetitionStats(c(0))),
    ("lang_id", DocKernels.langIdInfo,
      (c: Seq[Expression]) => DocKernels.LangId(c(0))))

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
