package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest run of EQUAL ADJACENT elements in a string array — the
  * codegen'd kernel behind [[graft.functions.Text.topFraction]] (r19,
  * guide §4): the `aggregate` higher-order fold it replaces is a
  * HigherOrderFunction, which whole-stage codegen cannot compile, so
  * every row paid |array| interpreted Catalyst evaluations plus a
  * (prev, run, best) struct allocation per element. This is the same
  * HOF→native move as [[DotProduct]]; the hot loop is a primitive int
  * run-counter over ArrayData.
  *
  * Value contract — matches the fold
  * `aggregate(arr, (prev=null,run=0,best=0), (acc,x) -> (x,
  *  if (acc.prev != null && x = acc.prev) acc.run+1 else 1,
  *  greatest(best, run)), acc -> acc.best)` exactly:
  *   - input array NULL → NULL (null-intolerant unary);
  *   - empty array → 0;
  *   - a NULL element never equals anything (x = prev is NULL → run
  *     restarts at 1), and a run of NULLs stays at 1 — identical to the
  *     fold's three-valued `===`.
  * Callers sort first (`array_sort`) when they want the modal count;
  * the expression itself only measures adjacent runs. */
case class MaxRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_run"

  private def containsNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_max_run expects array<string>, got $other")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cn = containsNull
    var best = 0
    var run = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (cn && arr.isNullAt(i)) { run = 1; prev = null }
      else {
        val cur = arr.getUTF8String(i)
        run = if (prev != null && prev.equals(cur)) run + 1 else 1
        prev = cur
      }
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val u = classOf[UTF8String].getName
      val nullBranch =
        if (containsNull)
          s"if ($a.isNullAt($i)) { $run = 1; $prev = null; } else"
        else ""
      s"""
         |int $n = $a.numElements();
         |int $best = 0;
         |int $run = 0;
         |$u $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullBranch {
         |    $u $cur = $a.getUTF8String($i);
         |    $run = ($prev != null && $prev.equals($cur)) ? $run + 1 : 1;
         |    $prev = $cur;
         |  }
         |  if ($run > $best) $best = $run;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxRunLength =
    copy(child = newChild)
}
