package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two `array<float>` columns in double precision
  * (whole-stage codegen, same tight loop as [[CosineSimilarity]]).
  *
  * Exists so an O(n²) cosine pair join can hoist the two per-VECTOR norm
  * loops out of the per-PAIR hot path (guide §1.2 "per-task work"):
  * `cosine(a, b) == dot(a, b) / (vecnorm(a) * vecnorm(b))` is
  * BIT-IDENTICAL to [[CosineSimilarity]] — the dot term accumulates in the
  * same sequential order, [[VecNorm]] accumulates each norm in the same
  * sequential order and applies the same final `Math.sqrt`, and IEEE-754
  * `/` and `*` of the identical operands give the identical double — while
  * evaluating one array loop per pair instead of three.
  *
  * Null semantics match the cosine expression when composed as above: a
  * length mismatch yields null here (so the quotient is null), and a
  * zero norm makes the caller's `when(norm = 0, null)` guard fire exactly
  * where cosine returned null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // can produce null from non-null inputs (length mismatch)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dp = 0.0
    var i = 0
    while (i < n) {
      dp += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dp = ctx.freshName("dp")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dp = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dp += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $dp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of an `array<float>` column in double precision:
  * `sqrt(sum(x_i^2))` with the SAME sequential accumulation and final
  * `Math.sqrt` as the norm terms inside [[CosineSimilarity]] — see
  * [[DotProduct]] for the bit-identity argument. A zero vector yields 0.0
  * (the caller guards the division, mirroring cosine's null-on-zero-norm).
  */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      na += xv * xv
      i += 1
    }
    math.sqrt(na)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val fn = ctx.freshName("vecNorm")
      val funcName = ctx.addNewFunction(fn,
        s"""
           |private double $fn(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  int n = arr.numElements();
           |  double na = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    double xv = (double) arr.getFloat(i);
           |    na += xv * xv;
           |  }
           |  return java.lang.Math.sqrt(na);
           |}
         """.stripMargin)
      s"$funcName($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
