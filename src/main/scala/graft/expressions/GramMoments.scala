package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Second-moment accumulator for d-dim vectors: count, per-dimension
  * sums, and the upper triangle of the Σ x·xᵀ Gram matrix — the
  * sufficient statistics of PCA in one O(d²)-state buffer.
  */
final class GramState(val d: Int) {
  var n: Long = 0L
  val s: Array[Double] = new Array[Double](d)
  val g: Array[Double] = new Array[Double](d * (d + 1) / 2)

  def update(x: Array[Double]): Unit = {
    n += 1
    var i = 0
    var t = 0
    while (i < d) {
      s(i) += x(i)
      var j = i
      while (j < d) { g(t) += x(i) * x(j); j += 1; t += 1 }
      i += 1
    }
  }

  def merge(o: GramState): Unit = {
    n += o.n
    var i = 0
    while (i < s.length) { s(i) += o.s(i); i += 1 }
    var t = 0
    while (t < g.length) { g(t) += o.g(t); t += 1 }
  }
}

/** `gram_moments(vec, d) → struct(n, sums, gram)` — one-pass
  * map-side-partial sufficient statistics for PCA over an
  * `array<float|double>` column. The classic two-shuffle PCA trap is
  * exploding n·d² (i, j, xᵢxⱼ) rows through an aggregation; this
  * aggregate keeps the WHOLE second-moment state in one
  * d(d+1)/2-slot buffer per partition (the [[TopKByScore]] bounded-
  * buffer idiom applied to moments), so the corpus pass is a narrow
  * scan and the shuffle is #partitions × O(d²) bytes — independent
  * of n, the same cost class at 100 TB as at 100 MB. The d×d
  * eigensolve downstream is driver arithmetic on one collected row.
  */
case class GramMoments(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramState] with UnaryLike[Expression] {

  require(d > 0, "dimension must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("gram", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "gram_moments"

  private lazy val elemType = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array<float|double> input, got $other")
  }

  override def createAggregationBuffer(): GramState = new GramState(d)

  override def update(buf: GramState, input: InternalRow): GramState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"$prettyName: vector of dim ${arr.numElements()}, expected $d")
      val x = new Array[Double](d)
      var i = 0
      elemType match {
        case FloatType => while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
        case _ => while (i < d) { x(i) = arr.getDouble(i); i += 1 }
      }
      buf.update(x)
    }
    buf
  }

  override def merge(buf: GramState, other: GramState): GramState = {
    buf.merge(other); buf
  }

  override def eval(buf: GramState): Any =
    new GenericInternalRow(Array[Any](
      buf.n, new GenericArrayData(buf.s.map(x => x: Any)),
      new GenericArrayData(buf.g.map(x => x: Any))))

  override def serialize(buf: GramState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * (buf.s.length + buf.g.length))
    bb.putLong(buf.n)
    buf.s.foreach(bb.putDouble)
    buf.g.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new GramState(d)
    st.n = bb.getLong
    var i = 0
    while (i < st.s.length) { st.s(i) = bb.getDouble; i += 1 }
    var t = 0
    while (t < st.g.length) { st.g(t) = bb.getDouble; t += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): GramMoments =
    copy(child = newChild)
}
