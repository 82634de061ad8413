package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst expressions for embedding math.
  *
  * The builtin route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) evaluates
  * higher-order lambdas interpreted per element and allocates an
  * intermediate array per row — at millions of candidate pairs × 64 dims
  * that dominates similarity-search runtime. These expressions generate a
  * tight primitive loop inside whole-stage codegen instead: no allocation,
  * no virtual calls, SIMD-friendly.
  *
  * Element nulls are not expected (embeddings are dense parquet floats);
  * like Spark's own vector ops we read primitives directly.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double> (callers cast at ingest)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a double array — same codegen rationale as [[DotProduct]]. */
case class L2Norm(child: Expression) extends UnaryExpression {

  // input must already be array<double>
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Per-vector int8 quantization manifest in ONE pass, no explode: max-abs
  * scale, then the quantized vector's integer aggregates
  * (checksum = Σqᵢ, qnorm = Σqᵢ², saturation count). The explode-based
  * restatement multiplies row volume ×dims through a vec_id exchange just
  * to compute per-vector reductions; this expression keeps the whole
  * manifest inside the scan's codegen stage — zero shuffle at any corpus
  * size. Rounding matches the repo discipline exactly: +1e-9 nudge then
  * half-up — the same arithmetic the DuckDB oracle states, so the output
  * stays hash-exact. Zero and empty vectors yield the all-zero manifest.
  * Inputs must be FINITE: a NaN element is skipped by the max-abs scan
  * and rounds to q=0 (Math.round(NaN) == 0), a partial manifest rather
  * than a sentinel — non-finite embeddings are an upstream data bug (the
  * oracle's CAST(ROUND(NaN)) errors outright), so callers should screen
  * them before quantizing.
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  // input must already be array<double> (callers cast at ingest)
  override def dataType: DataType = StructType(Seq(
    StructField("scale_q", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("qnorm", LongType, nullable = false),
    StructField("n_sat", LongType, nullable = false)))
  override def prettyName: String = "int8_quant_stats"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) { val av = math.abs(x.getDouble(i)); if (av > ma) ma = av; i += 1 }
    var checksum = 0L; var qnorm = 0L; var nSat = 0L
    if (ma > 0) {
      i = 0
      while (i < n) {
        val q = math.round(127.0 * x.getDouble(i) / ma + 1e-9)
        checksum += q; qnorm += q * q
        if (q == 127L || q == -127L) nSat += 1
        i += 1
      }
    }
    val scaleQ = if (ma == 0) 0L else math.round(ma / 127.0 * 1e9 + 1e-9)
    new GenericInternalRow(Array[Any](scaleQ, checksum, qnorm, nSat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ma = ctx.freshName("ma"); val av = ctx.freshName("av")
      val cs = ctx.freshName("cs"); val qn = ctx.freshName("qn")
      val ns = ctx.freshName("ns"); val q = ctx.freshName("q")
      val sq = ctx.freshName("sq"); val arr = ctx.freshName("arr")
      s"""
         |int $n = $a.numElements();
         |double $ma = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $av = java.lang.Math.abs($a.getDouble($i));
         |  if ($av > $ma) $ma = $av;
         |}
         |long $cs = 0L; long $qn = 0L; long $ns = 0L;
         |if ($ma > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $q = java.lang.Math.round(127.0 * $a.getDouble($i) / $ma + 1e-9);
         |    $cs += $q; $qn += $q * $q;
         |    if ($q == 127L || $q == -127L) $ns++;
         |  }
         |}
         |long $sq = ($ma == 0) ? 0L : java.lang.Math.round($ma / 127.0 * 1e9 + 1e-9);
         |Object[] $arr = new Object[4];
         |$arr[0] = java.lang.Long.valueOf($sq);
         |$arr[1] = java.lang.Long.valueOf($cs);
         |$arr[2] = java.lang.Long.valueOf($qn);
         |$arr[3] = java.lang.Long.valueOf($ns);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API over the native expressions. */
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  def l2_norm(a: Column): Column =
    bridge.column(L2Norm(bridge.expression(a)))

  def int8_quant_stats(a: Column): Column =
    bridge.column(Int8QuantStats(bridge.expression(a)))
}
