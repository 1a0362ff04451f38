package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Bpe

/**
 * `BpeEncode(tokens, merges)` — per-document byte-pair encoding: each
 * whitespace token is split into its learned subwords ([[graft.ops.Bpe]]
 * semantics) and the per-token pieces concatenate into one subword
 * sequence per document. A pure per-row function — zero shuffles, the
 * same scale shape as the other document kernels.
 *
 * The merge table is part of the EXPRESSION (learned once per corpus via
 * [[graft.ops.TextOps.learnBpeMerges]], then closed over), riding to
 * executors as a codegen reference object — not a join, because every row
 * needs the whole table and it is vocabulary-sized, not corpus-sized.
 * A merge table is not literal-expressible in a SQL call, so the SQL name
 * `bpe_encode` binds a SPECIFIC learned table at registration time via
 * [[graft.GraftExtensions.registerBpe]]; use [[graft.ops.TextOps.bpeEncode]]
 * after registering.
 *
 * A bounded per-executor memo caches token→pieces: corpus token
 * distributions are Zipfian, so the hit rate is high and the cache stays
 * vocabulary-shaped.
 */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: IndexedSeq[(String, String)] = merges.toIndexedSeq
  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  private val MemoCap = 100000

  /** Called from both interpreted eval and generated code. */
  def encodeTokens(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val w = tokens.getUTF8String(t).toString
        var pieces = memo.get(w)
        if (pieces == null) {
          pieces = Bpe.encode(w, mergeArr, ranks)
            .map(UTF8String.fromString).toArray
          if (memo.size() < MemoCap) memo.putIfAbsent(w, pieces)
        }
        var j = 0
        while (j < pieces.length) { out.add(pieces(j)); j += 1 }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(a: Any): Any =
    encodeTokens(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encodeTokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
