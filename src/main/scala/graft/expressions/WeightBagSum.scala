package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Hashing-trick bag-of-words weight sum — the codegen'd kernel behind
  * [[graft.functions.Text.classifierScoreOf]] (r20, guide §4; the r19
  * verdict's listed candidate). The HOF fold it replaces,
  * `aggregate(toks, 0.0, (acc, t) => acc + element_at(w, bucket(t)+1))`
  * with `bucket(t) = md5-first-8-hex(t) % dim`, is a
  * HigherOrderFunction — excluded from whole-stage codegen, so every
  * row paid |toks| interpreted Catalyst evaluations, each allocating a
  * 32-char hex string + substring + NumberConverter parse for the
  * bucket (the pre-[[Md5Prefix]] chain) and boxing the double
  * accumulator per step. This expression is one primitive loop: digest
  * the token's UTF-8 bytes, take the first 8 hex digits as a long
  * ([[Md5Prefix.prefixOf]] — the SAME arithmetic the corpus-standard
  * [[graft.operators.Sampling.hashBucket]] formula compiles to), index
  * the weight table, accumulate.
  *
  * Value contract — matches the fold exactly:
  *   - NULL token array → NULL (null-intolerant unary, like the HOF);
  *   - empty array → 0.0;
  *   - a NULL element hashes the `hashBucket` NULL sentinel
  *     ("\u0000graft_null" — the coalesce inside the bucket formula),
  *     so it contributes that bucket's weight, exactly as the fold did;
  *   - accumulation is left-to-right IEEE double addition starting at
  *     0.0 — the fold's exact sequence, so results are bit-identical.
  *
  * The weight table is a constructor reference (shipped via the
  * codegen reference array, not as dim inline literals — the
  * [[PqKernels]] lesson: large literal tables blow janino's method
  * limit); `dim` is its length.
  */
case class WeightBagSum(child: Expression, weights: Array[Double])
  extends UnaryExpression {
  require(weights.nonEmpty, "graft_weight_sum: weights must be non-empty")

  private val dim = weights.length

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_weight_sum"

  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_weight_sum expects array<string>, got $other")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val cn = containsNull
    val md = Md5Prefix.localDigest()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val bytes =
        if (cn && arr.isNullAt(i)) WeightBagSum.nullSentinelBytes
        else arr.getUTF8String(i).getBytes
      md.reset()
      acc += weights((Md5Prefix.prefixOf(md.digest(bytes), 8) % dim).toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Prefix.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val md = ctx.addMutableState("java.security.MessageDigest", "weightBagMd",
      v => s"""$v = $cls.newDigest();""")
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    val sentinel = ctx.addReferenceObj("nullSentinel",
      WeightBagSum.nullSentinelBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bytes = ctx.freshName("bytes")
      val elemBytes =
        if (containsNull) s"$a.isNullAt($i) ? $sentinel : $a.getUTF8String($i).getBytes()"
        else s"$a.getUTF8String($i).getBytes()"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte[] $bytes = $elemBytes;
         |  $md.reset();
         |  $acc += $wRef[(int) ($cls.prefixOf($md.digest($bytes), 8) % $dim)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WeightBagSum =
    copy(child = newChild)
}

object WeightBagSum {
  /** The [[graft.operators.Sampling.hashBucket]] NULL sentinel — a null
    * key coalesces to this string before hashing, so a null token
    * contributes the sentinel bucket's weight (one definition of the
    * bytes; the formula's string literal lives in Sampling). */
  val nullSentinelBytes: Array[Byte] =
    "\u0000graft_null".getBytes(java.nio.charset.StandardCharsets.UTF_8)
}
