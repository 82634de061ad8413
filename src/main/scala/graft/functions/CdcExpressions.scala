package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scan as ONE per-row pass.
  *
  * The restatement route (explode every position, hash a W-char substring
  * per position) allocates n substrings and runs n digest calls per
  * document — at corpus scale the digest dominates the whole chunking
  * pass. This expression keeps the classic CDC shape instead: a
  * POLYNOMIAL rolling hash (base 257, modulus 10⁹+7, exact BIGINT
  * arithmetic — the Rabin–Karp form every CDC system uses) advanced one
  * codepoint at a time, emitting the boundary positions directly. One
  * scan, zero allocation per position, no digest.
  *
  * Boundary definition (exact, engine-reproducible): with prefix hashes
  * H(0)=0, H(i) = (H(i−1)·257 + codepoint_i) mod P, window hash
  * w(i) = ((H(i) − H(i−W)·(257^W mod P)) mod P + P) mod P, a boundary
  * falls after codepoint i ∈ [W, n−1] iff w(i) ≡ 0 (mod D); the document
  * end n is always a boundary. Positions count CODEPOINTS (Spark
  * `substring`/`length` and DuckDB `substr`/`length` agree on
  * codepoints), so the DuckDB oracle replays the identical recurrence as
  * a recursive CTE and hash-matches.
  */
case class CdcBoundaries(child: Expression, w: Int, d: Int)
    extends UnaryExpression {
  require(w >= 1 && d >= 1, "CDC needs window >= 1 and divisor >= 1")

  // SQL-reachable (GraftExtensions registers cdc_boundaries), so misuse
  // over a non-string column must fail at ANALYSIS, not as a codegen
  // ClassCastException mid-job (AbstractDataType is private[sql], hence
  // checkInputDataTypes rather than ExpectsInputTypes)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries requires a STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String], w, d)

  // the scan is a stateful loop — codegen stays a single static call, so
  // the expression still lives inside whole-stage codegen (no fallback
  // row-by-row interpretation)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundaries.boundaries($c, $w, $d);")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  val Base = 257L
  val Mod = 1000000007L

  /** 257^w mod P. */
  def basePow(w: Int): Long = {
    var r = 1L
    var i = 0
    while (i < w) { r = r * Base % Mod; i += 1 }
    r
  }

  /** The boundary scan (also the codegen target — must stay static). */
  def boundaries(s: UTF8String, w: Int, d: Int): ArrayData = {
    val str = s.toString
    val bw = basePow(w)
    val ring = new Array[Long](w + 1) // H(i) for the last w+1 prefixes
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0   // codepoint count so far
    var ci = 0  // char (UTF-16) index
    val len = str.length
    while (ci < len) {
      val cp = str.codePointAt(ci)
      ci += Character.charCount(cp)
      h = (h * Base + cp) % Mod
      i += 1
      ring(i % (w + 1)) = h
      if (i >= w && ci < len) { // i == n is appended below, never tested
        val hw = ring((i - w) % (w + 1))
        val x = ((h - hw * bw % Mod) % Mod + Mod) % Mod
        if (x % d == 0) out += i
      }
    }
    if (i > 0) out += i
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column, w: Int, d: Int): Column =
    bridge.column(CdcBoundaries(bridge.expression(text), w, d))
}
