package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float|double>`.
  *
  * Why a custom `Expression`: the expression-chain formulation of a 64-dim
  * dot product (64 multiplies + 63 adds as a tree) exceeds janino's 64KB
  * generated-method limit once it sits inside a join stage, kicking the
  * whole stage out of codegen. This pair generates a tight loop instead —
  * O(1) bytecode regardless of dimension, whole-stage-codegen friendly, and
  * numerically IDENTICAL to the left-associated chain (sequential
  * accumulation in element order), which the DuckDB verification oracle
  * depends on.
  *
  * Null semantics: null input array, or a null element, yields null (same
  * as the chain formulation, where any null element nulls the sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // Mismatched dimensions are a caller bug: a truncated dot product is a
    // plausible-but-wrong score, so surface it as null, never a number.
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Argmax-of-cosine cell assignment against a LITERAL centroid table:
  * `score_i = dot(v, c_i) / ||c_i||` (the query/vector norm is constant per
  * row, so dividing by it cannot change the argmax), first index wins ties.
  *
  * Why a dedicated kernel: the expression-chain formulation builds
  * nlist × dim literal nodes — at nlist=1024, dim=768 that is ~1.6M
  * expression nodes and a guaranteed janino 64KB blowout. This is a nested
  * loop: O(1) bytecode regardless of nlist/dim, and each dot product is
  * sequential in element order, bitwise-identical to the SQL chain the
  * DuckDB verification oracle runs.
  *
  * Null semantics: null vector, a null element, or a centroid/vector
  * dimension mismatch yields null (a cell id from a truncated score would
  * be plausible-but-wrong).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val ctrOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => right.foldable
      case _ => false
    }
    if (vecOk && ctrOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "nearest_centroid expects (array<float|double>, " +
          "foldable array<array<double>>), got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val ctrs = cs.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val vF = vecIsFloat
    var best = -1
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < ctrs.numElements()) {
      val c = ctrs.getArray(i)
      if (c.numElements() != n) return null
      var dot = 0.0
      var nc = 0.0
      var j = 0
      while (j < n) {
        if (vec.isNullAt(j) || c.isNullAt(j)) return null
        val x = if (vF) vec.getFloat(j).toDouble else vec.getDouble(j)
        val y = c.getDouble(j)
        dot += x * y
        nc += y * y
        j += 1
      }
      val s = dot / math.sqrt(nc)
      if (s > bestScore) { bestScore = s; best = i }
      i += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val vGet = if (vecIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val nc = ctx.freshName("nc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val arrayData = classOf[ArrayData].getName
      s"""
         |int $n = $v.numElements();
         |int $best = -1;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; !${ev.isNull} && $i < $cs.numElements(); $i++) {
         |  $arrayData $c = $cs.getArray($i);
         |  if ($c.numElements() != $n) { ${ev.isNull} = true; break; }
         |  double $dot = 0.0;
         |  double $nc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($v.isNullAt($j) || $c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    double $s = (double) $v.$vGet($j);
         |    $dot += $s * $c.getDouble($j);
         |    $nc += $c.getDouble($j) * $c.getDouble($j);
         |  }
         |  if (!${ev.isNull}) {
         |    double $s = $dot / java.lang.Math.sqrt($nc);
         |    if ($s > $bestScore) { $bestScore = $s; $best = $i; }
         |  }
         |}
         |if ($best < 0) { ${ev.isNull} = true; }
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_nearest_centroid"
}

/** Exact integer dot product over `array<int>` → long.
  *
  * The int8-quantization scale path ([[graft.operators.Quantize]]) scores
  * candidates on quantized vectors: 4× less memory traffic than float32
  * and exact 64-bit integer accumulation — no float rounding at all, so
  * ranking is trivially reproducible on any engine (the DuckDB oracle
  * sums BIGINTs). Same loop-kernel rationale as [[DotProduct]]: O(1)
  * bytecode for any dimension, whole-stage-codegen friendly.
  *
  * Null semantics match [[DotProduct]]: null array, null element, or a
  * dimension mismatch yields null.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int_dot_product expects array<int>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_int_dot"
}

object VectorFunctions {
  /** Dot product as a Column — codegen'd loop, order-identical to the
    * left-associated expression chain. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(expr(a), expr(b)))

  /** Exact integer dot product over `array<int>` (quantized vectors). */
  def intDotNative(a: Column, b: Column): Column =
    ColumnBridge.column(IntDotProduct(expr(a), expr(b)))

  /** L2 norm via the same kernel (`sqrt(dot(a, a))`). */
  def normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))

  /** Index of the nearest centroid (argmax of `dot/||c||`, first wins). */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(expr(vec),
      expr(org.apache.spark.sql.functions.typedlit(centroids))))

  private def expr(c: Column): Expression = ColumnBridge.expression(c)
}
