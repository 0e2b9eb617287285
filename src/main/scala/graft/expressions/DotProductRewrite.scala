package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot product
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  *
  * into the codegen'd [[DotProduct]] native expression — so a user who
  * writes the idiomatic-but-interpreted HOF form (per-element lambda
  * dispatch + an intermediate array allocation) transparently gets the
  * primitive fused loop. This is the engine-extension layer of SURVEY
  * §7.3: a `Rule[LogicalPlan]` injected via [[GraftExtensions]]
  * (`spark.sql.extensions`) or `spark.experimental.extraOptimizations`
  * on a live session.
  *
  * The match is deliberately strict (multiply of the two zip lambda
  * variables, fold of literal-0 by plain addition, identity finish) —
  * anything else keeps its original semantics untouched.
  *
  * Semantics-preserving in ALL cases, not just the well-formed ones
  * (an optimizer rule has no business changing results):
  *   - [[DotProduct]] returns NULL for ragged arrays and null elements,
  *     exactly like the zip_with null-padding + fold poisoning it
  *     replaces — no `containsNull` restriction is needed on the match;
  *   - when the matched multiply runs in FLOAT precision (the uncasted
  *     `(x, y) -> x * y` lambda over two float arrays), the rewrite
  *     passes `floatMul = true` so the native loop rounds each product
  *     to float first, bit-identical to the HOF tree; the cast-to-double
  *     formulation keeps the exact double multiply.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => stripCast(child)
    case other => other
  }

  private def isFloatingArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** x * y where x, y are exactly the two lambda variables (any cast). */
  private def isVarTimesVar(body: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    body match {
      case Multiply(l, r, _) =>
        val (sl, sr) = (stripCast(l), stripCast(r))
        vars.size == 2 && ((sl, sr) match {
          case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
            Set(a.exprId, b.exprId) == vars.map(_.exprId).toSet
          case _ => false
        })
      case _ => false
    }

  /** acc + v over exactly the fold's two lambda variables. */
  private def isAccPlusVar(body: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    body match {
      case Add(l, r, _) =>
        (stripCast(l), stripCast(r)) match {
          case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
            vars.size == 2 && Set(a.exprId, b.exprId) == vars.map(_.exprId).toSet
          case _ => false
        }
      case _ => false
    }

  /** The zero must make the ACCUMULATOR double-typed: a bare float or
    * int zero literal gives the aggregate a FloatType/IntegerType
    * result, and rewriting that to the DoubleType [[DotProduct]] would
    * change both the schema and the rounding of the running sum —
    * exactly the semantics change this rule promises never to make.
    * (Scala's `0.0f == 0` cooperative equality made the old bare
    * `Literal(0, _)` case match a float zero.) */
  private def isZero(e: Expression): Boolean = e match {
    case Literal(v, DoubleType) => v == 0.0
    case Cast(child, DoubleType, _, _) => isZeroLit(child)
    case _ => false
  }

  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(null, _) => false
    case Literal(v, _) => v == 0 || v == 0.0 || v == 0.0f
    case Cast(child, _, _, _) => isZeroLit(child)
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mulBody, zipVars, _)),
            zero,
            LambdaFunction(addBody, aggVars, _),
            finish)
          if isFloatingArray(a) && isFloatingArray(b) && isZero(zero) &&
            isVarTimesVar(mulBody,
              zipVars.collect { case v: NamedLambdaVariable => v }) &&
            isAccPlusVar(addBody,
              aggVars.collect { case v: NamedLambdaVariable => v }) &&
            isIdentityFinish(finish) =>
        DotProduct(a, b, floatMul = mulBody.dataType == FloatType)
    }
}
