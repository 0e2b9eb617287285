package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rolling-hash winnowing fingerprints (Schleimer et al.,
  * SIGMOD'03) — replaces the last hot-path Scala UDF
  * (`Text.winnow`): a UDF forces a serialization fence and breaks the
  * whole-stage-codegen span right where `Dedup.winnowPairsFast` spends
  * its map-side time; a native expression keeps the scan → normalize →
  * winnow → explode pipeline in one generated loop. The kernel itself
  * stays an ordinary static method ([[RollingWinnow.compute]]) that the
  * generated code calls directly — the standard Spark shape for complex
  * kernels (regexp, json): no per-row closure dispatch, no Row
  * conversion, and the expression remains codegen-compatible.
  *
  * Semantics are IDENTICAL to the UDF it replaces: polynomial rolling
  * hash (base 257) over JVM chars of the k-gram at each position,
  * minimum per sliding window of `window` hashes, distinct, sorted.
  * Inputs shorter than k produce an empty array; a NULL input is NULL
  * (the UDF returned an empty array — indistinguishable downstream,
  * where the result is always exploded).
  */
case class RollingWinnow(child: Expression, k: Int, window: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects a string column, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    RollingWinnow.compute(s.asInstanceOf[UTF8String].toString, k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingWinnow.compute($c.toString(), $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingWinnow =
    copy(child = newChild)
}

object RollingWinnow {
  /** The winnowing kernel: rolling k-gram hashes, window minima,
    * distinct (first occurrence), ascending sort. Bit-identical to the
    * Scala UDF this expression replaced (same base-257 recurrence over
    * JVM chars). */
  def compute(s: String, k: Int, window: Int): ArrayData = {
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    var h = 0L
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    i = 0
    while (i < s.length) {
      if (i < k) h = h * B + s.charAt(i)
      else h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
      if (i >= k - 1) hs(i - k + 1) = h
      i += 1
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var w = 0
    while (w + window <= n) {
      var m = hs(w); var j = 1
      while (j < window) { if (hs(w + j) < m) m = hs(w + j); j += 1 }
      out += m
      w += 1
    }
    new GenericArrayData(out.toArray.sorted)
  }
}
