package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen expression.
  *
  * The 100 TB pattern this enables: when a small frame (a daily ingest
  * batch) must be matched against a huge one (the existing corpus), build
  * a Bloom filter over the SMALL side's join keys on the driver, ship it
  * inside the plan, and filter the huge side's scan with it BEFORE the
  * shuffle — the big side's exchange then carries only rows that might
  * match, O(true collisions + fpp·corpus) instead of O(corpus). Bloom
  * filters have no false negatives, so as a PRE-filter ahead of an exact
  * equi-join the rewrite is lossless: false positives survive the scan
  * but die in the join, and the final output is bit-identical (the
  * pattern `Dedup.lshCandidatesAcrossBloom` hash-checks against the
  * unfiltered oracle).
  *
  * The filter ships as its serialized bytes (`BloomFilter` is Spark's
  * `util.sketch` — in-box, stable serialized form) and is deserialized
  * once per executor codegen instance, not per row. Interpreted fallback
  * deserializes lazily on first eval.
  */
case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(a: Any): Any =
    bloom.mightContainLong(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val cls = classOf[BloomFilter].getName
    val field = ctx.addMutableState(cls, "bloomFilter", v =>
      s"""try {
         |  $v = $cls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $field.mightContainLong($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Count-min-sketch point estimate as a codegen expression: the frequency
  * side of the mergeable-sketch family (Bloom = membership, HLL++ =
  * cardinality, t-digest = quantiles, CMS = per-key counts). The sketch is
  * built distributed by Spark's `count_min_sketch` aggregate (counter
  * sums — commutative, so the sketch is identical under any partial-agg
  * order), ships in the plan as its serialized bytes, and each probe is a
  * d-row counter lookup. CMS guarantees est ≥ true count, and
  * est ≤ true + ε·N with confidence 1−δ — the checked-query gate.
  *
  * Child is a STRING column; the probe hashes the UTF8 bytes exactly as
  * the aggregate added them.
  */
case class CmsEstimate(cmsBytes: Array[Byte], child: Expression)
    extends UnaryExpression {
  import org.apache.spark.util.sketch.CountMinSketch
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  override def nullSafeEval(a: Any): Any =
    cms.estimateCount(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("cmsBytes", cmsBytes, "byte[]")
    val cls = classOf[CountMinSketch].getName
    val field = ctx.addMutableState(cls, "cmsSketch", v =>
      s"""try {
         |  $v = $cls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $field.estimateCount($a.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

/** [[CmsEstimate]] with the sketch as a COLUMN (BinaryType) instead of a
  * plan literal: the lazy form — the sketch aggregate stays a 1-row frame
  * inside the plan (cross-joined broadcast), so building the query plan
  * triggers no driver action and an empty corpus (NULL sketch, zero probe
  * rows) never deserializes anything. The deserialized sketch is memoized
  * per byte-array CONTENT (`Arrays.equals`, not reference — UnsafeRow's
  * `getBinary` returns a fresh copy per access, so a reference memo would
  * never hit under codegen): consecutive rows probing the same broadcast
  * sketch pay one vectorized memcmp instead of the ~100 KB deserialize +
  * allocation per row. Content equality keeps the memo exact — no
  * fingerprint aliasing can ever reuse the wrong sketch.
  */
case class CmsEstimateOf(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.util.sketch.CountMinSketch
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate_of"

  @transient private var lastBytes: Array[Byte] = _
  @transient private var cms: CountMinSketch = _

  override def nullSafeEval(b: Any, k: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    // Arrays.equals short-circuits on the same-reference and
    // length-mismatch cases, so the common paths are cheap
    if (!java.util.Arrays.equals(bytes, lastBytes)) {
      cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    }
    lastBytes = bytes
    cms.estimateCount(
      k.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[CountMinSketch].getName
    val lastField = ctx.addMutableState("byte[]", "cmsLastBytes")
    val cmsField = ctx.addMutableState(cls, "cmsOfSketch")
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"""if (!java.util.Arrays.equals($b, $lastField)) {
         |  try {
         |    $cmsField = $cls.readFrom(new java.io.ByteArrayInputStream($b));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |}
         |$lastField = $b;
         |${ev.value} = $cmsField.estimateCount($k.getBytes());""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateOf =
    copy(left = newLeft, right = newRight)
}

object SketchFunctions {
  /** Column API over [[BloomMightContain]]: does `key` (a LONG column)
    * possibly belong to `bloom`? Serializes the filter once at plan
    * construction.
    */
  def bloom_might_contain(bloom: BloomFilter, key: Column): Column = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    bridge.column(BloomMightContain(out.toByteArray, bridge.expression(key)))
  }

  /** Column API over [[CmsEstimate]]: the sketch's estimated count of
    * `key` (a STRING column), from serialized count-min-sketch bytes
    * (Spark's `count_min_sketch` aggregate output).
    */
  def cms_estimate(cmsBytes: Array[Byte], key: Column): Column =
    bridge.column(CmsEstimate(cmsBytes, bridge.expression(key)))

  /** Column API over [[CmsEstimateOf]]: the estimated count of `key`
    * (STRING column) under `cms` (BINARY column — typically a 1-row
    * broadcast aggregate of `count_min_sketch`).
    */
  def cms_estimate_of(cms: Column, key: Column): Column =
    bridge.column(CmsEstimateOf(bridge.expression(cms), bridge.expression(key)))
}
