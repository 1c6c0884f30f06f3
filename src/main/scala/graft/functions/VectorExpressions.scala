package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the similarity hot path.
  *
  * `Similarity.dot` could be expressed as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — correct, but it
  * materializes an intermediate array per row and walks it twice. For
  * ANN scoring (|queries|·|corpus| rows at 100 TB) that allocation is
  * the hot loop, so this is the "custom Expression beats composition"
  * case: one fused loop, with whole-stage codegen via doGenCode, and
  * identical left-to-right double accumulation (so DuckDB-oracle
  * results are unchanged).
  */
final case class VectorDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(
      s"vector_dot expects array inputs, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature as one fused pass: `planes` sign
  * bits packed into a long. The hyperplane components are ±1 derived
  * from a splitmix64 avalanche of (plane, dim) — deterministic, no RNG
  * state, identical in interpreted eval and generated code. Replaces
  * `planes` separate zip_with+aggregate passes per row.
  */
final case class HyperplaneLshSignature(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_signature expects array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val xv = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        proj += xv * VectorExpressions.planeSign(p, i)
        i += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val i = ctx.freshName("i"); val z = ctx.freshName("z")
      val proj = ctx.freshName("proj"); val sig = ctx.freshName("sig")
      // splitmix64 of ((p << 32) | i), inlined so the generated code
      // needs no external calls; must mirror planeSign exactly
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $z = ((((long)$p) << 32) | (long)$i) + 0x9e3779b97f4a7c15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    $z = $z ^ ($z >>> 31);
         |    $proj += (double)$a.$get($i) * ((($z & 1L) == 1L) ? 1.0 : -1.0);
         |  }
         |  if ($proj > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshSignature =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftColumnBridge

  /** ±1 hyperplane component from a splitmix64 avalanche of
    * (plane, dim) — the interpreted twin of the generated code. */
  def planeSign(plane: Int, dim: Int): Double = {
    var z = ((plane.toLong << 32) | dim.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  /** Column wrapper: fused dot product of two float/double arrays.
    * (Spark 4's Column wraps a ColumnNode; the bridge adapts catalyst
    * Expressions back into Columns.) */
  def vectorDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrapper: packed hyperplane-LSH sign bits. */
  def lshSignature(v: Column, planes: Int): Column =
    GraftColumnBridge.column(HyperplaneLshSignature(
      GraftColumnBridge.expression(v), planes))
}
