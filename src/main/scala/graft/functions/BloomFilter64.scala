package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter bitmap over a BIGINT key column as a native Catalyst
  * aggregate — the shuffle-reduction sketch for semi-joins whose build
  * side is too large to broadcast as ROWS but trivially small as BITS:
  * each partition folds its keys into an m-bit bitmap (k double-hashed
  * positions per key), partials merge by OR (one bitmap per partition
  * crosses the wire, never the keys), and the merged bitmap pre-filters
  * the probe side MAP-SIDE before its exchange. False positives pass (and
  * are removed by the exact join that follows); false negatives are
  * impossible, so the pre-filter never changes the result — only the
  * bytes shuffled. Deterministic (SplitMix64 double hashing, no seed
  * material outside the key), so plans replay identically.
  */
case class BloomAgg(
    child: Expression,
    bits: Int,
    hashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bloom_agg needs a power-of-two bit count >= 64 (whole words), got $bits")
  require(hashes > 0, s"bloom_agg needs a positive hash count, got $hashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs a bigint argument, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter64.add(b, v.asInstanceOf[Long], hashes)
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val bytes = new Array[Byte](b.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    b.foreach(bb.putLong)
    bytes
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  protected override def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Membership probe against a COLLECTED bloom bitmap (a bounded driver
  * value: m/8 bytes regardless of build-side cardinality — collecting it
  * is the point, unlike collecting keys). The bitmap rides the plan as a
  * reference object; the probe is a static call inside whole-stage
  * codegen, so the pre-filter costs two multiplies and k bit tests per
  * row at scan speed.
  */
case class BloomMightContain(child: Expression, bitmap: Array[Byte],
    hashes: Int) extends UnaryExpression {

  private lazy val words: Array[Long] = BloomFilter64.fromBytes(bitmap)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a bigint argument, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  protected override def nullSafeEval(input: Any): Any =
    BloomFilter64.contains(words, input.asInstanceOf[Long], hashes)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomFilter64.contains($w, $c, $hashes)")
  }

  protected override def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFilter64 {

  /** SplitMix64 finalizer — the standard 64-bit mixer; called from both
    * interpreted eval and generated code.
    */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Kirsch–Mitzenmacher double hashing: position i = h1 + i·h2. The odd
    * step guarantees all k positions are distinct mod the power-of-two
    * width. ONE definition shared by add and contains — the zero-false-
    * negative invariant is exactly "both sides derive identical
    * positions", so the formula must not exist twice.
    */
  private def seed1(key: Long): Long = mix(key)
  private def seed2(key: Long): Long = mix(key ^ 0x9e3779b97f4a7c15L) | 1L
  private def position(h1: Long, h2: Long, i: Int, m: Long): Long =
    ((h1 + i * h2) & Long.MaxValue) % m

  def add(words: Array[Long], key: Long, k: Int): Unit = {
    val m = words.length.toLong * 64
    val h1 = seed1(key); val h2 = seed2(key)
    var i = 0
    while (i < k) {
      val pos = position(h1, h2, i, m)
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  def contains(words: Array[Long], key: Long, k: Int): Boolean = {
    val m = words.length.toLong * 64
    val h1 = seed1(key); val h2 = seed2(key)
    var i = 0
    while (i < k) {
      val pos = position(h1, h2, i, m)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}
