package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a native Catalyst aggregate — the
  * mergeable-sketch shape (Agarwal et al., "Mergeable Summaries", PODS'12)
  * that finds frequent tokens WITHOUT shuffling the full vocabulary: each
  * partition folds its token stream into at most `k` counters
  * (Misra–Gries 1982), the exchange carries one bounded summary per
  * partition, and merging is count-union followed by subtracting the
  * (k+1)-th largest count — which preserves the MG error bound, so the
  * merged summary is guaranteed to contain EVERY token with true count
  * > N/(k+1). Callers pick k against their support threshold T (k+1 > N/T)
  * and get a candidate superset to verify exactly in a second bounded
  * pass; the sketch itself never feeds user-facing counts.
  *
  * Buffer is a live JVM hash map between updates (TypedImperativeAggregate
  * serializes only at shuffle boundaries). Keys arriving from UnsafeRow
  * buffers are memory-reused by the scanner, so they are CLONED before
  * being stored — holding a reference to the scanner's buffer is the
  * classic UTF8String aliasing bug.
  *
  * The decrement-all branch is O(k) when it fires; a production tuning for
  * adversarial streams is the lazy global-offset variant, but the branch
  * only triggers when distinct-tokens-per-partition exceeds k, which the
  * caller sizes against (and the merge-side subtraction is where the bound
  * really gets enforced).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, s"misra_gries needs a positive counter budget, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", StringType), StructField("est", LongType))))
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a string argument, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String]
      b.get(w) match {
        case Some(c) => b(w) = c + 1
        case None if b.size < k => b(w.clone()) = 1L
        case None =>
          // classic MG: a full table and a new token decrement EVERYTHING
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          b.foreach { case (t, c) => if (c == 1L) dead += t else b(t) = c - 1 }
          dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[UTF8String, Long],
      o: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    // deserialized maps own their keys — no clone needed on this path
    o.foreach { case (t, c) => b(t) = b.getOrElse(t, 0L) + c }
    if (b.size > k) {
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - 1 - k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b.foreach { case (t, c) => if (c <= d) dead += t else b(t) = c - d }
      dead.foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(b.toArray.sortBy(_._1).map { case (w, c) =>
      InternalRow(w, c): Any
    })

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (w, c) =>
      val bytes = w.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val wb = new Array[Byte](len)
      in.readFully(wb)
      b(UTF8String.fromBytes(wb)) = in.readLong()
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  protected override def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
