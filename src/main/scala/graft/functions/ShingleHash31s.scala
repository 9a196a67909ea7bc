package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's SORTED DISTINCT
  * 31-bit shingle-hash set (word `n`-grams, OracleHash polynomial) in one
  * tight JVM pass over the UTF-8 bytes — the set-representation sibling of
  * [[MinHashSig]] (same token walk, same `StrHash31.hashRange` spans, zero
  * per-shingle string allocation).
  *
  * This is the per-document shingle REPRESENTATION for exact-Jaccard
  * verification of LSH candidates: two docs' intersection size is an
  * `array_intersect` of their hash sets, so the verify stage needs no
  * shingle-level explode or shuffle at all — candidate pairs just join the
  * per-doc arrays. The DuckDB twins compute Jaccard over the SAME hashed
  * space (`SELECT DISTINCT doc_id, sh31` — PipelineQueries
  * .minhashPairsCtes), so engine and oracle agree bit-for-bit by
  * construction, hash collisions included (which at 2^31-1 slots and
  * ~10^3 shingles/doc perturb ~1e-3 of PAIRS by at most one intersection
  * count — the standard production representation for shingle dedup).
  *
  * Contract (fail-loud, like [[MinHashSig]]): the document must have ≥ n
  * tokens — callers filter `size(split(text, " ")) >= n` first.
  */
case class ShingleHash31s(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"bad shingle width: n=$n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hash31s needs a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash31s"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHash31s.hashes(input.asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash31s.hashes($c, $n)")

  protected override def withNewChildInternal(newChild: Expression): ShingleHash31s =
    copy(child = newChild)
}

object ShingleHash31s {

  /** Called from both interpreted eval and generated code. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val nb = s.numBytes()
    // token start offsets — identical walk to MinHashSig.sig: a 0x20 byte
    // never occurs inside a UTF-8 multi-byte sequence
    var nTok = 1
    var i = 0
    while (i < nb) { if (s.getByte(i) == 0x20) nTok += 1; i += 1 }
    require(nTok >= n,
      s"shingle_hash31s: $nTok tokens < n=$n (filter size(split(text,' ')) >= n first)")
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = nb + 1 // sentinel: end of token k is starts(k+1) - 1

    val hs = new Array[Long](nTok - n + 1)
    var st = 0
    while (st <= nTok - n) {
      hs(st) = StrHash31.hashRange(s, starts(st), starts(st + n) - 1)
      st += 1
    }
    // sorted-distinct in place: the set representation downstream
    // array_intersect consumes (and the twin's SELECT DISTINCT computes)
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }
}
