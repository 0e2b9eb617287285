package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Positional any-equal over two string arrays: the codegen'd kernel
  * behind the first-matching-band guard in [[graft.operators.Dedup.minhashLsh]]
  * and the streaming curation text lane (r19 round 1, guide §4). The
  * HOF chain it replaces —
  * `exists(zip_with(a, b, (x, y) -> x = y), m -> m)` — is interpreted
  * per evaluation and allocates the zipped boolean array, and it sits
  * in the band-bucket self-JOIN CONDITION, so it runs once per raw
  * band collision (k× the candidate count on k-band-agreeing pairs).
  *
  * Value contract — matches the HOF form exactly, including Spark's
  * default three-valued `exists` logic:
  *   - either array NULL → NULL;
  *   - zip_with pads the shorter array with NULL, and `x = y` with a
  *     NULL side is NULL — so positions past the shorter length yield
  *     NULL comparisons, as do NULL elements;
  *   - any position with both elements non-null and equal → TRUE;
  *   - otherwise NULL if any comparison was NULL, else FALSE.
  * (Both call sites equi-join on `band`, so the arrays have equal
  * length and non-null md5 elements in practice — the full contract is
  * kept so the swap is a pure plan change.) */
case class BandMatch(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_band_match"
  override def nullable: Boolean = true

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_band_match expects array<string>, got ${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    val n = math.max(nx, ny)
    val (lcn, rcn) = (containsNull(left), containsNull(right))
    var sawNull = false
    var i = 0
    while (i < n) {
      if (i >= nx || i >= ny || (lcn && x.isNullAt(i)) || (rcn && y.isNullAt(i)))
        sawNull = true
      else if (x.getUTF8String(i).equals(y.getUTF8String(i)))
        return true
      i += 1
    }
    if (sawNull) null else false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val sawNull = ctx.freshName("sawNull")
      val found = ctx.freshName("found")
      val nullChecks = Seq(
        if (containsNull(left)) Some(s"$a.isNullAt($i)") else None,
        if (containsNull(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val elemNullCond =
        (Seq(s"$i >= $nx", s"$i >= $ny") ++ nullChecks).mkString(" || ")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |boolean $sawNull = false;
         |boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($elemNullCond) {
         |    $sawNull = true;
         |  } else if ($a.getUTF8String($i).equals($b.getUTF8String($i))) {
         |    $found = true;
         |    break;
         |  }
         |}
         |if ($found) {
         |  ${ev.value} = true;
         |} else if ($sawNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = false;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BandMatch =
    copy(left = newLeft, right = newRight)
}
