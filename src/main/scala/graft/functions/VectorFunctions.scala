package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float-vector columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why custom (SURVEY §4.2.3 / builder preference order (b)): the
  * composable formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is evaluated INTERPRETED per element (higher-order functions don't
  * participate in codegen) and allocates an intermediate array per
  * row — measured two orders of magnitude slower on the minhash
  * analog. This expression compiles to a tight primitive loop inside
  * the surrounding WholeStageCodegen stage: no allocation, no virtual
  * calls per element.
  *
  * Semantics match the HOF formulation bit-for-bit: left-to-right
  * accumulation in double of float·float products (so DuckDB-oracle
  * parity is preserved — `list_cosine_similarity(CAST(.. AS DOUBLE[]))`
  * accumulates the same way).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemType(left).isDefined && elemType(right).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private lazy val leftIsFloat = elemType(left).contains(FloatType)
  private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $getA * $getB;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** All PQ subspace codes of a float vector in ONE codegen'd
  * expression: for each of `nSub` subspaces, the argmax over `ksub`
  * codebook entries of the micro-unit subvector dot product, ties to
  * the lower code — bit-identical to the composed
  * `greatest(struct(floor(dot(slice(v), cbLit))·1e6+0.5, -j))` chain
  * it replaces, including the left-to-right double accumulation the
  * SQL oracles replay.
  *
  * Why custom (the same (b)-preference as [[FloatVecDot]]): the
  * composed form expands to 128 dot kernels + 128 struct allocations +
  * 8 sixteen-way struct comparisons PER ROW; the generated projection
  * method grows past what HotSpot will JIT and the whole encode runs
  * interpreted — measured 25.5 s for a 200k-row encode at the 100×
  * probe scale (~128 µs/row). This expression is one small method with
  * a three-deep primitive loop over a referenced float[] codebook:
  * same arithmetic, ~100× less bytecode.
  */
case class FloatPqEncode(child: Expression, cb: Array[Float],
                         nSub: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(cb.length == nSub * ksub * dsub, "codebook shape mismatch")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val codes = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var best = Long.MinValue
      var bj = 0
      var j = 0
      while (j < ksub) {
        var sum = 0.0
        var d = 0
        val vbase = m * dsub
        val cbase = (m * ksub + j) * dsub
        while (d < dsub && vbase + d < n) {
          sum += v.getFloat(vbase + d).toDouble * cb(cbase + d).toDouble
          d += 1
        }
        val pd = math.floor(sum * 1000000.0 + 0.5).toLong
        if (pd > best) { best = pd; bj = j }
        j += 1
      }
      codes(m) = bj
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val sum = ctx.freshName("sum")
      val pd = ctx.freshName("pd")
      s"""
         |int $n = $v.numElements();
         |int[] $codes = new int[$nSub];
         |for (int $m = 0; $m < $nSub; $m++) {
         |  long $best = Long.MIN_VALUE; int $bj = 0;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $sum = 0.0;
         |    for (int $d = 0; $d < $dsub && $m * $dsub + $d < $n; $d++) {
         |      $sum += (double) $v.getFloat($m * $dsub + $d)
         |        * (double) $cbRef[($m * $ksub + $j) * $dsub + $d];
         |    }
         |    long $pd = (long) java.lang.Math.floor($sum * 1000000.0 + 0.5);
         |    if ($pd > $best) { $best = $pd; $bj = $j; }
         |  }
         |  $codes[$m] = $bj;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatPqEncode =
    copy(child = newChild)
}

object VectorFunctions {
  import ColumnBridge.{toColumn, toExpr}

  /** codegen'd dot product over array<float> columns. */
  def vec_dot(a: Column, b: Column): Column =
    toColumn(FloatVecDot(toExpr(a), toExpr(b)))

  /** L2 norm via the same kernel. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** cosine similarity — identical association order to the
    * Similarity.cosine HOF formulation it replaces.
    */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** all PQ subspace codes in one codegen'd kernel; `cb(m)(j)` is the
    * dsub-dim sub-centroid j of subspace m.
    */
  def pq_encode(v: Column, cb: Array[Array[Array[Float]]]): Column = {
    val nSub = cb.length; val ksub = cb(0).length; val dsub = cb(0)(0).length
    toColumn(FloatPqEncode(toExpr(v), cb.flatten.flatten, nSub, ksub, dsub))
  }
}
