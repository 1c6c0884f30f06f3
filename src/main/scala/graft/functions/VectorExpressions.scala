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

/** Top-`nProbe` nearest IVF cells of a vector against a CODEBOOK
  * MATRIX carried as ONE reference object — the scale form of cell
  * assignment. The previous shape inlined every centroid as literal
  * array nodes inside an `array_max(array(struct(cosine(...))))`
  * tree: fine at 16 cells, but a 4-64k-cell codebook becomes a
  * 100k+-node expression that breaks codegen limits and serializes
  * per task as plan, not data. Here the matrix rides
  * `ctx.addReferenceObj` (broadcast to executors inside the task
  * binary once), the loop is fused codegen, and — critically —
  * assignment stays a NARROW projection: a broadcast-join + per-row
  * argmax formulation would have to aggregate |corpus|×nCells joined
  * rows back to |corpus| (one exchange of the full corpus with its
  * vectors), which is exactly the shuffle IVF exists to avoid at
  * 100 TB.
  *
  * Semantics are IDENTICAL to the literal tree: per cell
  * `cos = dot(v, c) / (norm(v) * norm(c))` with the zero guard
  * (norms accumulated left-to-right; centroid norms precomputed —
  * same deterministic fold), ranking by (cos DESC, cell id ASC).
  * Returns `array<long>` of the `nProbe` best cell ids;
  * `element_at(..., 1)` is the single-cell assignment. */
final case class NearestCells(child: Expression,
                              cents: Array[Array[Double]],
                              ids: Array[Long],
                              nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty && cents.length == ids.length, "codebook shape")
  require(nProbe >= 1 && nProbe <= cents.length, "nProbe in [1, nCells]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

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
        s"nearest_cells expects array<float|double>, got $other")
  }

  /** sqrt of the left-to-right self-dot — must mirror the row-side
    * accumulation exactly (it does: same loop order). */
  private lazy val centNorms: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  /** Insertion-ranked (cos DESC, id ASC) top-nProbe — the shared
    * kernel of interpreted eval; generated code mirrors it. */
  private def rank(x: ArrayData): ArrayData = {
    val f = isFloat
    val n = x.numElements()
    var vAcc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      vAcc += xv * xv; i += 1
    }
    val vNorm = math.sqrt(vAcc)
    val bestCos = new Array[Double](nProbe)
    val bestId = new Array[Long](nProbe)
    java.util.Arrays.fill(bestCos, java.lang.Double.NEGATIVE_INFINITY)
    java.util.Arrays.fill(bestId, Long.MaxValue)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var acc = 0.0; var j = 0
      while (j < m) {
        val xv = if (f) x.getFloat(j).toDouble else x.getDouble(j)
        acc += xv * cent(j); j += 1
      }
      val d = vNorm * centNorms(c)
      val cos = if (d == 0) 0.0 else acc / d
      val id = ids(c)
      // insert if better than the current worst kept. Comparisons go
      // through Double.compare — NaN ranks GREATEST (Spark's SQL
      // ordering), so a garbage vector whose cosines are all NaN
      // still lands deterministically in the lowest-id cell instead
      // of silently matching NO cell and vanishing from every result
      // (primitive <,> are both false against NaN).
      def beats(cosA: Double, idA: Long, cosB: Double, idB: Long): Boolean = {
        val cmp = java.lang.Double.compare(cosA, cosB)
        cmp > 0 || (cmp == 0 && idA < idB)
      }
      var k = nProbe - 1
      if (beats(cos, id, bestCos(k), bestId(k))) {
        while (k > 0 && beats(cos, id, bestCos(k - 1), bestId(k - 1))) {
          bestCos(k) = bestCos(k - 1); bestId(k) = bestId(k - 1); k -= 1
        }
        bestCos(k) = cos; bestId(k) = id
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestId)
  }

  override def nullSafeEval(v: Any): Any = rank(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the whole kernel (matrix loop + insertion rank) runs through
    // ONE reference to this expression instance — the matrix ships as
    // a task-binary reference object either way, and delegating to
    // the interpreted kernel keeps the two paths impossible to skew
    val self = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $self.kernel($a);")
  }

  /** public entry for generated code */
  def kernel(x: ArrayData): ArrayData = rank(x)

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
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

  /** Column wrapper: top-nProbe nearest IVF cell ids against a
    * codebook matrix (one referenced object, narrow projection). */
  def nearestCells(v: Column, cents: Array[(Long, Seq[Double])],
                   nProbe: Int): Column =
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(v),
      cents.map(_._2.toArray), cents.map(_._1), nProbe))
}
