package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotF

/** Catalyst optimizer rule: rewrite the builtin dot-product shape
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               0d, (acc, v) -> acc + v) }}}
  *
  * into the fused native kernel [[graft.functions.DotF]] — no
  * intermediate product array, no interpreted lambda frames, one
  * codegen'd loop (the SURVEY §4 "builtin-HOF lambdas run interpreted"
  * finding, fixed at the PLAN level so even hand-written SQL gets the
  * kernel).
  *
  * The rewrite is SEMANTICS-PRESERVING on any `array<float>` inputs:
  *   - a null ELEMENT makes the builtin chain yield NULL; [[DotF]]
  *     implements the same contract (per-element null check, NULL out);
  *   - `zip_with` pads ragged arrays with NULL, making the builtin
  *     yield NULL on length mismatch; the rewrite keeps that contract
  *     by guarding the kernel with `if(size(a) = size(b), dot_f, null)`
  *     — equal-length inputs (the embedding contract) fold through the
  *     fast path, ragged inputs produce the same NULL as before.
  *
  * Accumulation order (left-to-right double adds) is identical on both
  * sides, so values are bit-equal, not just approximately equal —
  * spec-asserted. Inject via `spark.sql.extensions=
  * graft.functions.GraftExtensions`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def castToDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(xe, ye, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(le, re, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          if isFloatArray(a) && isFloatArray(b) &&
            isZeroDouble(zero) &&
            ((castToDoubleOf(xe, x) && castToDoubleOf(ye, y)) ||
              (castToDoubleOf(xe, y) && castToDoubleOf(ye, x))) &&
            ((sameVar(le, acc) && sameVar(re, v)) ||
              (sameVar(le, v) && sameVar(re, acc))) &&
            sameVar(fin, facc) =>
        If(EqualTo(Size(a), Size(b)), DotF(a, b), Literal(null, DoubleType))
    }
}
