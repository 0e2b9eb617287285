package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hamming distance between two sign-bit signatures (`ARRAY<BIGINT>`
  * words): popcount of the XOR, summed — the codegen'd kernel behind
  * [[graft.operators.Similarity.hammingDist]] (r19, guide §4). The
  * `aggregate(zip_with(...))` higher-order chain it replaces is
  * interpreted per evaluation AND allocates the zipped intermediate
  * array — and this expression sits in JOIN conditions (banded pair
  * verification) and the s_hamming coarse scan, where it runs once per
  * candidate pair / per (corpus row × query). Same HOF→native move as
  * [[DotProduct]]; the hot loop is Long.bitCount over ArrayData.
  *
  * Value contract — matches
  * `aggregate(zip_with(a, b, (x,y) -> bit_count(x ^ y)), 0L, +)`
  * exactly: either array NULL → NULL; different lengths → NULL
  * (zip_with pads with NULL, poisoning the sum); any NULL element →
  * NULL. */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"
  override def nullable: Boolean = true

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming expects array<bigint>, got ${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lcn, rcn) = (containsNull(left), containsNull(right))
    var acc = 0L
    var i = 0
    while (i < n) {
      if ((lcn && x.isNullAt(i)) || (rcn && y.isNullAt(i))) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullChecks = Seq(
        if (containsNull(left)) Some(s"$a.isNullAt($i)") else None,
        if (containsNull(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val elemNullGuard =
        if (nullChecks.isEmpty) ""
        else s"if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullGuard
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
