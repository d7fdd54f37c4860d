package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element access helpers shared by the vector expressions. Vectors are
  * `array<float>` or `array<double>` columns; all math is done in
  * double, accumulated in index order (deterministic across partitions
  * and engines).
  */
private[graft] object VecUtil {
  def elementType(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array type, got $other")
  }

  /** Mismatched dimensionality is a data error, not a math input: the
    * reference raises ValueError (utils/similarity.py validation) and
    * silently truncating to min(length) would return plausible-but-wrong
    * similarities for malformed rows.
    */
  def requireSameDim(op: String, n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"$op: vector dimensions differ: $n vs $m")

  /** Java source for the same check inside generated code. */
  def dimCheckSrc(op: String, n: String, m: String): String =
    s"""if ($n != $m) throw new IllegalArgumentException(
       |  "$op: vector dimensions differ: " + $n + " vs " + $m);""".stripMargin

  /** Java source for `(double) arr.get<T>(i)`. */
  def getterSrc(et: DataType, arr: String, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case other => throw new IllegalArgumentException(s"unsupported vector element type $other")
  }

  def get(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported vector element type $other")
  }
}

/** Exact cosine similarity between two vectors, the rerank primitive of
  * the reference engine (reference: lshrs/utils/similarity.py:26
  * cosine_similarity — dot product of L2-normalized vectors). NULL when
  * either vector has zero norm (the reference raises ValueError;
  * SQL-land surfaces that as NULL).
  *
  * Single-pass, codegen'd, no allocation — stays inside
  * WholeStageCodegen so a 100 TB rerank never leaves generated code.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val lt = VecUtil.elementType(left.dataType)
  private lazy val rt = VecUtil.elementType(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VecUtil.requireSameDim(prettyName, a.numElements(), b.numElements())
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = VecUtil.get(lt, a, i); val y = VecUtil.get(rt, b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |${VecUtil.dimCheckSrc(prettyName, s"$a.numElements()", s"$b.numElements()")}
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${VecUtil.getterSrc(lt, a, i)};
         |  double $y = ${VecUtil.getterSrc(rt, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of two vectors (double accumulation, index order). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private lazy val lt = VecUtil.elementType(left.dataType)
  private lazy val rt = VecUtil.elementType(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VecUtil.requireSameDim(prettyName, a.numElements(), b.numElements())
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += VecUtil.get(lt, a, i) * VecUtil.get(rt, b, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |${VecUtil.dimCheckSrc(prettyName, s"$a.numElements()", s"$b.numElements()")}
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${VecUtil.getterSrc(lt, a, i)}) * (${VecUtil.getterSrc(rt, b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact integer dot product of two integer code vectors (any of
  * tinyint/smallint/int/bigint elements; accumulation in int64) — the
  * quantized ANN prefilter primitive
  * ([[graft.ann.Quantize.quantizedTopK]], which stores codes as
  * `array<tinyint>` so the scan really is 1 byte per component).
  * int8-scale codes can't overflow below ~2^46 dims. A tight codegen
  * loop: the higher-order `zip_with`+`aggregate` form evaluates a
  * lambda object per element and measured ~5× slower on the same scan.
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot_product"

  private lazy val lt = VecUtil.elementType(left.dataType)
  private lazy val rt = VecUtil.elementType(right.dataType)

  // dispatch hoisted OUT of the per-element loop: a DataType match per
  // element measured a 60% slowdown on the interpreted (aggregate-
  // child) path
  private def longGetter(et: DataType): (ArrayData, Int) => Long = et match {
    case ByteType    => (a, i) => a.getByte(i).toLong
    case ShortType   => (a, i) => a.getShort(i).toLong
    case IntegerType => (a, i) => a.getInt(i).toLong
    case LongType    => (a, i) => a.getLong(i)
    case other => throw new IllegalArgumentException(s"unsupported code element type $other")
  }
  @transient private lazy val getA = longGetter(lt)
  @transient private lazy val getB = longGetter(rt)

  private def longGetterSrc(et: DataType, arr: String, i: String): String = et match {
    case ByteType    => s"(long) $arr.getByte($i)"
    case ShortType   => s"(long) $arr.getShort($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case LongType    => s"$arr.getLong($i)"
    case other => throw new IllegalArgumentException(s"unsupported code element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VecUtil.requireSameDim(prettyName, a.numElements(), b.numElements())
    val n = a.numElements()
    var dot = 0L
    var i = 0
    while (i < n) { dot += getA(a, i) * getB(b, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |${VecUtil.dimCheckSrc(prettyName, s"$a.numElements()", s"$b.numElements()")}
         |int $n = $a.numElements();
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${longGetterSrc(lt, a, i)}) * (${longGetterSrc(rt, b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance between two packed bit-code arrays (array<long>):
  * Σ Long.bitCount(a ^ b) in a codegen tight loop — the scoring kernel
  * of the 1-bit ANN tier ([[graft.ann.Quantize.binaryTopK]]). The HOF
  * form (`aggregate(zip_with(...))`) measured ~0.95× brute force at
  * 500k×1000 serving (lambda evaluation per element swallowed the
  * byte-shrink win); this expression is the same tight-loop fix as
  * [[IntDotProduct]].
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VecUtil.requireSameDim(prettyName, a.numElements(), b.numElements())
    val n = a.numElements()
    var d = 0L
    var i = 0
    while (i < n) { d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |${VecUtil.dimCheckSrc(prettyName, s"$a.numElements()", s"$b.numElements()")}
         |int $n = $a.numElements();
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric-Distance-Computation score: Σ_s tab[s·k + codes[s]] over
  * a PQ code array (array<tinyint|smallint|int>, length m) and a
  * per-query lookup table (array<double>, length m·k) — the inner loop
  * of PQ serving (Jégou et al. 2011 §ADC;
  * [[graft.ann.Pq.pqTopKOnCodes]]). `k` is recovered as tabLen / m, so
  * the expression needs no constructor parameter and any (m, k) layout
  * mismatch fails loudly instead of mis-indexing.
  *
  * The HOF form (`aggregate(sequence(0,m-1), acc + element_at(...))`)
  * evaluates a lambda object per subspace per candidate — the same
  * interpreted-per-element pattern measured 1.5× slower for
  * [[HammingDistance]] and ~5× for [[IntDotProduct]]; this is the same
  * tight-loop fix.
  */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  // fail MISUSE at analysis, not first-task execution: a mistyped SQL
  // call (array<float> table, string codes, ...) surfaces as the
  // standard plan-time error instead of a mid-job task failure (the
  // runtime guards below stay as the codegen/eval backstop)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType | ShortType | IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<tinyint|smallint|int> codes, array<double> table), " +
            s"got (${l.catalogString}, ${r.catalogString})")
    }

  private lazy val ct = VecUtil.elementType(left.dataType)

  // the loop reads the table via getDouble — on any other element type
  // (e.g. array<float> through the session-registered SQL function)
  // that reads misaligned bytes and returns silently wrong scores, so
  // refuse loudly like the code side does
  private lazy val tabTypeChecked: Unit = VecUtil.elementType(right.dataType) match {
    case DoubleType => ()
    case other => throw new IllegalArgumentException(
      s"$prettyName: lookup table must be array<double>, got element type $other")
  }

  // dispatch hoisted out of the per-subspace loop (IntDotProduct lesson)
  private def codeGetter(et: DataType): (ArrayData, Int) => Int = et match {
    case ByteType    => (a, i) => a.getByte(i).toInt
    case ShortType   => (a, i) => a.getShort(i).toInt
    case IntegerType => (a, i) => a.getInt(i)
    case other => throw new IllegalArgumentException(s"unsupported code element type $other")
  }
  @transient private lazy val getCode = codeGetter(ct)

  private def codeGetterSrc(et: DataType, arr: String, i: String): String = et match {
    case ByteType    => s"(int) $arr.getByte($i)"
    case ShortType   => s"(int) $arr.getShort($i)"
    case IntegerType => s"$arr.getInt($i)"
    case other => throw new IllegalArgumentException(s"unsupported code element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    tabTypeChecked
    val codes = l.asInstanceOf[ArrayData]
    val tab = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val tl = tab.numElements()
    if (m == 0 || tl % m != 0) throw new IllegalArgumentException(
      s"$prettyName: table length $tl is not a multiple of code length $m")
    val k = tl / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = getCode(codes, s)
      // an out-of-range code would silently read another subspace's slot
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"$prettyName: code $c out of range [0, $k) in subspace $s")
      acc += tab.getDouble(s * k + c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      tabTypeChecked // validated at codegen time — generated code is double-only
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |if ($m == 0 || $b.numElements() % $m != 0) throw new IllegalArgumentException(
         |  "$prettyName: table length " + $b.numElements() + " is not a multiple of code length " + $m);
         |int $k = $b.numElements() / $m;
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $c = ${codeGetterSrc(ct, a, s)};
         |  if ($c < 0 || $c >= $k) throw new IllegalArgumentException(
         |    "$prettyName: code " + $c + " out of range [0, " + $k + ") in subspace " + $s);
         |  $acc += $b.getDouble($s * $k + $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 (Euclidean) norm of a vector (reference: lshrs/utils/norm.py:4). */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  private lazy val et = VecUtil.elementType(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val x = VecUtil.get(et, a, i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = ${VecUtil.getterSrc(et, a, i)};
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** L2-normalize a vector to unit length → `array<double>`; NULL for the
  * zero vector (reference raises "Cannot normalize zero vector",
  * lshrs/utils/norm.py:56). Interpreted eval only — normalization is
  * not on the 100 TB hot path (cosine_sim normalizes inline).
  */
case class L2Normalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  private lazy val et = VecUtil.elementType(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = VecUtil.get(et, a, i); s += x * x; i += 1 }
    if (s == 0.0) null
    else {
      val norm = math.sqrt(s)
      val out = new Array[Any](n)
      i = 0
      while (i < n) { out(i) = VecUtil.get(et, a, i) / norm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dense `array<float>` assembly from a doc's sparse hash-embed
  * entries: `entries` is `array<struct<dim: long, w: long>>`, the
  * output is length `d` with `(float)(w / nrm)` at each in-range dim
  * and 0.0f elsewhere — exactly the
  * `transform(sequence(0, d-1), i -> coalesce(cast(element_at(mp, i) /
  * nrm as float), 0.0f))` it replaces, which ran as an INTERPRETED
  * higher-order function (CodegenFallback) doing a per-element map
  * lookup: d interpreted evals per document on every scoring/serving
  * path (r15: measured as the dominant cost of classifier serving).
  * Codegen'd single pass over the ≤d entries instead.
  */
case class SparseToDense(entries: Expression, nrm: Expression, d: Int)
    extends BinaryExpression {
  require(d > 0, s"sparse_to_dense: d must be positive, got $d")
  override def left: Expression = entries
  override def right: Expression = nrm
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "sparse_to_dense"

  override def nullSafeEval(e: Any, n: Any): Any = {
    val a = e.asInstanceOf[ArrayData]
    val norm = n.asInstanceOf[Double]
    val out = new Array[Float](d)
    var i = 0
    val m = a.numElements()
    while (i < m) {
      val row = a.getStruct(i, 2)
      val dim = row.getLong(0)
      if (dim >= 0L && dim < d.toLong)
        out(dim.toInt) = (row.getLong(1).toDouble / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val dim = ctx.freshName("dim")
      s"""
         |float[] $out = new float[$d];
         |int $m = $a.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $a.getStruct($i, 2);
         |  long $dim = $row.getLong(0);
         |  if ($dim >= 0L && $dim < ${d}L) {
         |    $out[(int) $dim] = (float) (((double) $row.getLong(1)) / $n);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(entries = l, nrm = r)
}
