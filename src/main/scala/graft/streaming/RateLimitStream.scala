package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/**
 * Sketch-backed per-key ingest rate limiting — the streaming consumer of
 * the Count-Min machinery ([[graft.expressions.CmsSketch]]) the profiling
 * side already speaks: admit each key's documents until its TOTAL admitted
 * count reaches `cap`, then reject, across an unbounded stream.
 *
 * Why a sketch and not keyed state: a `flatMapGroupsWithState` counter is
 * exact but carries one state slot per DISTINCT key ever seen — on a
 * 100 TB crawl feed (key = domain, licence holder, dedup cluster…) that
 * state grows without bound and every micro-batch shuffles into it. The
 * CMS form holds ONE fixed O(d·w) counter matrix on the driver,
 * accumulated by elementwise addition (CMS merge IS addition —
 * [[graft.ops.Profile.cmsMergeAll]]), and each micro-batch costs one
 * shuffle-free partial-combined `cms_sketch` aggregation plus a per-row
 * codegen'd estimate probe. No per-key state anywhere.
 *
 * The error trade is ONE-SIDED, which is exactly what a cap wants: CMS
 * estimates never undercount, so `estimate ≥ admitted_so_far` and the cap
 * is NEVER exceeded — the guarantee; collisions can only overcount
 * (≤ εN w.h.p. at w = ⌈e/ε⌉), so a colliding key may be throttled EARLY —
 * the bounded, documented cost. Admission within a batch is deterministic:
 * rows rank per key by `orderCol`, and row r of key k is admitted iff
 * `estimate_before_batch(k) + r ≤ cap`. Only ADMITTED rows are added to
 * the sketch (rejected rows consume no quota).
 *
 * Deployment shape: the limiter is a driver-held batch transition —
 * exactly the [[StatementStream]] `foreachBatch` discipline. [[attach]]
 * wires it; [[admit]] is the pure per-batch function the spec drives.
 */
object RateLimitStream {

  /** One accumulated-then-probed limiter instance. NOT thread-safe across
    * streams — one instance per streaming query (the foreachBatch callback
    * is serial within a query). */
  final class CmsRateLimiter(
      keyCol: String, orderCol: String, cap: Long, d: Int = 8, w: Int = 8192) {
    require(cap >= 0, s"cap must be >= 0, got $cap")
    require(d >= 1 && d <= 32, s"d must be in [1, 32], got $d")
    require(w >= 2, s"w must be >= 2, got $w")

    private var sketch: Option[Seq[Seq[Long]]] = None

    /** The accumulated counter matrix (for persistence/inspection) —
      * storable and re-foldable via [[graft.ops.Profile.cmsMergeAll]]. */
    def currentSketch: Option[Seq[Seq[Long]]] = sketch

    /** Admit `batch`'s rows against the accumulated sketch, fold the
      * admitted keys back in, return the admitted rows (same schema). */
    def admit(batch: DataFrame): DataFrame = {
      graft.GraftExtensions.register(batch.sparkSession)
      val rank = row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(orderCol)))
      val prior = sketch match {
        case None => lit(0L)
        case Some(sk) => estExpr(col(keyCol).cast("string"), sk, d, w)
      }
      val admitted = batch
        .withColumn("_rk", rank)
        .withColumn("_est", prior)
        .where(col("_est") + col("_rk") <= cap)
        .drop("_rk", "_est")
        .localCheckpoint() // pin admissions before the sketch moves on
      val skRow = admitted
        .agg(call_function("cms_sketch", col(keyCol).cast("string"), lit(d), lit(w)))
        .collect()(0)
      if (!skRow.isNullAt(0)) {
        // Row.getSeq yields mutable ArraySeqs — normalize to immutable
        val add: Seq[Seq[Long]] =
          skRow.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq
        sketch = Some(sketch match {
          case None => add
          case Some(prev) =>
            prev.zip(add).map { case (ra, rb) => ra.zip(rb).map { case (a, b) => a + b } }
        })
      }
      admitted
    }
  }

  /** Per-row CMS point estimate against a DRIVER-HELD matrix — the same
    * md5-affine bucket family the kernel fills and
    * [[graft.ops.Profile.cmsEstimates]] probes, with the matrix riding as
    * literals instead of a broadcast row. */
  private def estExpr(key: Column, sketch: Seq[Seq[Long]], d: Int, w: Int): Column = {
    val h = conv(substring(md5(key.cast("binary")), 1, 8), 16, 10).cast("long")
    (0 until d).map { i =>
      val bkt = (h * lit(2L * i + 1) + lit(98765L * i + 12345L)) %
        lit(2147483647L) % lit(w)
      element_at(typedlit(sketch(i)), (bkt + 1).cast("int"))
    }.reduce(least(_, _))
  }

  /** Wire a limiter into a stream: `foreachBatch` applies [[CmsRateLimiter.admit]]
    * and hands the admitted rows to `sink`. */
  def attach(
      stream: DataFrame, keyCol: String, orderCol: String, cap: Long,
      d: Int = 8, w: Int = 8192)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val limiter = new CmsRateLimiter(keyCol, orderCol, cap, d, w)
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val admitted = limiter.admit(batch)
      // the admit checkpoint's blocks must not outlive the micro-batch
      // (the round-5 block-manager-residue lesson): release after the sink
      // has consumed the rows
      try sink(admitted, id)
      finally admitted.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
  }

  /** [[attach]] + start with a query name (memory-sink-free convenience). */
  def start(
      stream: DataFrame, keyCol: String, orderCol: String, cap: Long,
      d: Int = 8, w: Int = 8192)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    attach(stream, keyCol, orderCol, cap, d, w)(sink).start()
}
