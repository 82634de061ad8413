package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-linear text-quality model contract, shared by the Spark
  * expression AND the DuckDB oracle SQL (both sides are generated from
  * these constants, so the engines can never drift).
  *
  * Shape: the public fastText / CCNet-style quality classifier — hash each
  * token into one of [[Buckets]] feature buckets, look up an integer
  * weight, sum. The hash is the repo-standard engine-portable md5Long
  * (first 8 md5-hex chars as BIGINT); the weight table is a deterministic
  * affine mix of the bucket id (same declared-stub discipline as
  * `ops/Multimodal`'s byte codec: no trained weights ship in this
  * container, so the MODEL is synthetic while the operator shape —
  * tokenize, hash, weigh, reduce, threshold — is the real, tested
  * production plumbing; swapping trained weights in means replacing
  * [[weight]]'s affine mix with a ≤[[Buckets]]-entry broadcast lookup
  * under the identical bucket contract).
  *
  * All arithmetic is overflow-free i64: bucket < 2^15, × [[WeightMul]]
  * (< 2^32) < 2^47. Weights are integers in [-[[WeightCenter]],
  * [[WeightMod]]−1−[[WeightCenter]]], so the per-document sum is EXACT and
  * order-independent — the one double division (the logit) happens once at
  * the end, per the integer-quantized-means discipline (SCALE.md §7).
  */
object HashedLinearModel {
  val Buckets = 32768L
  /** Knuth's multiplicative-hash constant — spreads consecutive buckets. */
  val WeightMul = 2654435761L
  val WeightAdd = 104729L
  /** Odd modulus ⇒ weights take every value in [-1000, 1000]. */
  val WeightMod = 2001L
  val WeightCenter = 1000L

  def weight(bucket: Long): Long =
    (bucket * WeightMul + WeightAdd) % WeightMod - WeightCenter

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Integer weight of one token: md5Long(token) % Buckets → affine weight.
    * The first 8 md5-hex chars are exactly the first 4 digest bytes
    * big-endian, so this reproduces `Dedup.md5Long` without hex-string
    * round-trips. Called from generated code (static forwarder).
    */
  def tokenWeight(t: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(t.getBytes)
    val h = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    weight(h % Buckets)
  }
}

/** Per-document hashed-linear classifier score: Σ over an array<string> of
  * tokens of [[HashedLinearModel.tokenWeight]] — the whole model evaluation
  * in ONE pass inside whole-stage codegen, zero shuffle at any corpus size.
  *
  * The restatements all lose at 100 TB: explode + groupBy(doc_id) shuffles
  * every TOKEN of the corpus through an exchange just to compute a
  * row-local reduction, and an `aggregate()` array lambda evaluates
  * interpreted per element (the repo-wide higher-order-lambda ban). Null
  * array elements are skipped (the tokenizer never produces them; skipping
  * matches SUM-over-unnest oracle semantics if one ever appears).
  */
case class HashedLinearScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_linear_score"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        acc += HashedLinearModel.tokenWeight(arr.getUTF8String(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $acc += graft.functions.HashedLinearModel.tokenWeight($a.getUTF8String($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object TextModelFunctions {
  /** Column API over [[HashedLinearScore]]. */
  def hashed_linear_score(tokens: Column): Column =
    bridge.column(HashedLinearScore(bridge.expression(tokens)))
}
