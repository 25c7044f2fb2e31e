package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Catalyst TypedImperativeAggregate over [[TDigest]] — the mergeable,
  * checkpointable quantile sketch the north star asks for ("quantiles via
  * t-digest"). Partial states serialize to bytes, so per-partition sketches
  * can be persisted in the ledger and merged across resumed runs — the
  * capability `percentile_approx` doesn't expose (SURVEY.md §4.2).
  *
  * Two eval shapes:
  *  - [[TDigestQuantiles]] → array<double> of quantiles at `probabilities`
  *  - [[TDigestSketch]]    → binary (the serialized digest itself, for
  *    ledger persistence / later merging)
  */
abstract class TDigestAggBase extends TypedImperativeAggregate[TDigest]
    with UnaryLike[Expression] {
  def compression: Int

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => other.toString.toDouble
      }
      buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: TDigest, input: TDigest): TDigest = {
    buffer.merge(input); buffer
  }

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes

  override def deserialize(storageFormat: Array[Byte]): TDigest =
    TDigest.fromBytes(storageFormat)

  override def nullable: Boolean = true
}

case class TDigestQuantiles(
    child: Expression,
    probabilities: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TDigestAggBase {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def eval(buffer: TDigest): Any =
    if (buffer.total <= 0) null
    else new GenericArrayData(probabilities.map(buffer.quantile).toArray)
  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestQuantiles =
    copy(child = c)
  override def prettyName: String = "tdigest_quantiles"
}

case class TDigestSketch(
    child: Expression,
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TDigestAggBase {
  override def dataType: DataType = BinaryType
  override def eval(buffer: TDigest): Any = buffer.toBytes
  override def withNewMutableAggBufferOffset(o: Int): TDigestSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestSketch =
    copy(child = c)
  override def prettyName: String = "tdigest_sketch"
}

object TDigestAgg {
  import org.apache.spark.sql.GraftColumnBridge

  private def exprOf(c: Column): Expression = GraftColumnBridge.expression(c)
  private def toCol(e: Expression): Column = GraftColumnBridge.column(e)

  /** Column API: quantiles of `c` at `probs` via a mergeable t-digest. */
  def tdigestQuantiles(c: Column, probs: Seq[Double], compression: Int = 100): Column =
    toCol(TDigestQuantiles(exprOf(c), probs, compression).toAggregateExpression())

  /** Column API: the serialized digest (binary) — persist in the ledger,
    * merge later with [[TDigest.fromBytes]] + [[TDigest.merge]].
    */
  def tdigestSketch(c: Column, compression: Int = 100): Column =
    toCol(TDigestSketch(exprOf(c), compression).toAggregateExpression())
}
