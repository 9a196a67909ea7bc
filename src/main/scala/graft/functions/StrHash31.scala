package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 31-bit polynomial string hash
  * (OracleHash): h = fold (h·31 + codepoint) mod (2^31 - 1).
  *
  * Semantically identical to the column-API fold
  * `aggregate(split(s,""), 0L, (h,c) => (h*31 + ascii(c)) % P31)` and to
  * the DuckDB twin `list_reduce(list_prepend(0, list_transform(
  * string_split(s,''), c -> ascii(c))), ...)` — but evaluated as ONE tight
  * JVM loop per row instead of a per-character higher-order-function chain
  * (each HOF step pays a lambda dispatch and a single-char UTF8String), so
  * the minhash/simhash/clean-corpus shingle hashing stays cheap at scale.
  * Iterates CODEPOINTS (not UTF-16 units) to match DuckDB's per-character
  * ascii() on non-BMP input too.
  *
  * Participates in whole-stage codegen via a static call — the same
  * pattern Spark's own string intrinsics use.
  */
case class StrHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strhash31 needs a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "strhash31"

  protected override def nullSafeEval(input: Any): Any =
    StrHash31.hash(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrHash31.hash($c)")

  protected override def withNewChildInternal(newChild: Expression): StrHash31 =
    copy(child = newChild)
}

object StrHash31 {
  final val P31 = 2147483647L

  /** Called from both interpreted eval and generated code. Decodes code
    * points straight off the UTF8String's UTF-8 bytes — no per-row
    * java.lang.String copy (the hot shingle-hash path calls this once per
    * shingle; the copy was the only allocation left in the loop).
    */
  def hash(s: UTF8String): Long = hashRange(s, 0, s.numBytes())

  /** Hash of the codepoints in byte range [from, until) — the shingle
    * windows of [[MinHashSig]] hash sub-slices of one UTF8String without
    * materializing per-shingle strings. `until` must be ≤ numBytes (both
    * callers derive it from numBytes); range bounds on multi-byte
    * boundaries decode exactly like a standalone slice.
    */
  def hashRange(s: UTF8String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    val n = until
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = b0
      var len = 1
      // Malformed input must stay SAFE and deterministic: a lone
      // continuation byte (0x80-0xbf) is consumed as a 1-byte value, and a
      // truncated multi-byte sequence is clamped to the buffer end —
      // UTF8String.getByte is an UNCHECKED Platform read, so indexing past
      // numBytes would read adjacent heap/off-heap memory (nondeterministic
      // hashes at best, a memory-safety violation at worst). Valid UTF-8 —
      // everything the engine itself produces — decodes identically to
      // String.codePointAt.
      if (b0 >= 0xc0) {
        if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
        else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        if (i + len > n) len = n - i // truncated tail: never over-read
        var j = 1
        while (j < len) { cp = (cp << 6) | (s.getByte(i + j) & 0x3f); j += 1 }
      }
      h = (h * 31 + cp) % P31
      i += len
    }
    h
  }
}
