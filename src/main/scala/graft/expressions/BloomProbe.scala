package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(fingerprint) → boolean` over a BROADCAST Bloom
  * filter — the codegen probe for the Bloom-gated ingest paths
  * ([[graft.dedup.Dedup.bloomDedup]],
  * [[graft.streaming.Streams.dedupStreamAgainstCorpus]]).
  *
  * Spark exposes no public Catalyst surface for
  * `BloomFilter.mightContainLong`, so before this the probe was the
  * engine's last hot-path Scala UDF: a per-row lambda closing the
  * whole-stage-codegen span on the batch side of a 100 TB ingest. Here
  * the filter rides the expression as a `Broadcast` handle (shipped
  * once per executor, NOT per task — a production filter is ~GB), is
  * resolved to a local field once per generated-class instance, and the
  * probe is one virtual call inside the codegen projection — same span
  * discipline as [[DeflateSize]] / [[CharEntropyStats]].
  */
case class BloomMightContain(child: Expression, bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint fingerprint, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    bc.value.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // unwrap the broadcast ONCE per generated-class instance — the
    // per-row code is a single mightContainLong call on a local field
    val filter = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $filter.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
