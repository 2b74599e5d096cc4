package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: random-hyperplane LSH bucket of an
  * `array<float>` vector — the sign bit of `planes` pseudo-random
  * hyperplane dot products packed into a long.
  *
  * Replaces the interpreted `aggregate`/`zip_with`-per-plane Column
  * formulation on the ANN/embedding-dedup hot path: higher-order
  * functions evaluate per element through the interpreter (the same trap
  * measured ~80x on cosine), while this emits one tight planes x dim loop
  * into whole-stage codegen.
  *
  * Hyperplane components are derived deterministically from
  * (seed, plane, dim-index) via a splitmix-style mix — identical on every
  * executor with zero broadcast, and identical to [[graft.operators.Ann]]'s
  * previous Column formulation (same component function).
  */
case class HyperplaneBucket(child: Expression, planes: Int, seed: Long, dim: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, "1 <= planes <= 63")

  // plane-major components, precomputed once at plan time (planes x dim
  // doubles; 8x64 = 4 KiB — far below broadcast-worthy)
  private lazy val components: Array[Double] =
    HyperplaneBucket.components(planes, dim, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // exact-dim contract: a length-mismatched vector buckets as 0L (all
    // sign bits 0), matching the interpreted zip_with/aggregate
    // formulation where any mismatch nulls the dot product
    if (v.numElements() != dim) return 0L
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      val off = p * dim
      while (d < dim) { dot += v.getFloat(d) * components(off + d); d += 1 }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val comps = ctx.addReferenceObj("components", components, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      // mismatched-length vectors bucket as 0L (parity with the
      // interpreted formulation's nulled dot -> all bits 0)
      s"""
         |${ev.value} = 0L;
         |if ($v.numElements() == $dim) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $dot = 0.0;
         |    int $off = $p * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $dot += (double) $v.getFloat($d) * $comps[$off + $d];
         |    }
         |    if ($dot >= 0) ${ev.value} |= (1L << $p);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** Deterministic pseudo-random hyperplane component for (seed, plane p,
    * dimension d): zero-mean in [-0.5, 0.5), splitmix-style mix.
    */
  def component(p: Int, d: Int, seed: Long): Double = {
    var x = seed + p.toLong * 0x9e3779b97f4a7c15L + d.toLong * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x = x ^ (x >>> 31)
    ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
  }

  def components(planes: Int, dim: Int, seed: Long): Array[Double] = {
    val a = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dim) { a(p * dim + d) = component(p, d, seed); d += 1 }
      p += 1
    }
    a
  }
}
