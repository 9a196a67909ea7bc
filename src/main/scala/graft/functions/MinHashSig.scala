package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's FULL minhash
  * signature — `numPerms` minima of the affine-permuted 31-bit shingle
  * hashes (OracleHash family) over its word `n`-gram shingles — in one
  * tight JVM pass over the UTF-8 bytes.
  *
  * Semantically identical to the plan it replaces
  * (`explode(shingles) → StrHash31 → groupBy(doc).agg(min(affine_p) × P)`):
  * tokens are the text split on single spaces (empty tokens preserved,
  * exactly like Spark's `split(text, " ")`), and each shingle is the n
  * consecutive tokens joined by " " — which, because every separator is a
  * single space, is precisely the original byte span from the first
  * token's start to the last token's end, hashed codepoint-wise by
  * [[StrHash31.hashRange]] with zero per-shingle allocation. Duplicate
  * shingles don't perturb a MIN, so skipping the old `array_distinct` is
  * exact. Every DuckDB twin is unchanged — same OracleHash arithmetic.
  *
  * Replaces, per shingle row: one interpreted HOF `transform` step, one
  * concat_ws string allocation, one exploded row, and `numPerms`
  * aggregate-buffer updates (the allocation pressure behind the observed
  * full-GC outliers in the 32-perm clean-corpus pass). The signature rows
  * it emits shuffle nothing until LSH banding.
  *
  * Contract (fail-loud, like [[ArrayDotLL]]): the document must have ≥ n
  * tokens — callers filter `size(split(text, " ")) >= n` first, the same
  * gate the exploded plan applied.
  */
case class MinHashSig(child: Expression, n: Int, numPerms: Int)
    extends UnaryExpression {
  require(n >= 1 && numPerms >= 1, s"bad minhash params: n=$n perms=$numPerms")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[UTF8String], n, numPerms)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.sig($c, $n, $numPerms)")

  protected override def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private final val P31 = StrHash31.P31

  /** Affine constants per perm count — derived once per JVM (tiny), the
    * same OracleHash.permA/permB values the SQL twins bake as literals.
    */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def perms(numPerms: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numPerms, np =>
      (Array.tabulate(np)(OracleHash.permA), Array.tabulate(np)(OracleHash.permB)))

  /** Called from both interpreted eval and generated code. */
  def sig(s: UTF8String, n: Int, numPerms: Int): ArrayData = {
    val (as, bs) = perms(numPerms)
    val nb = s.numBytes()
    // token start offsets: a 0x20 byte never occurs inside a UTF-8
    // multi-byte sequence, so byte scanning splits exactly like the
    // regex-" " split (consecutive spaces yield empty tokens, kept)
    var nTok = 1
    var i = 0
    while (i < nb) { if (s.getByte(i) == 0x20) nTok += 1; i += 1 }
    require(nTok >= n,
      s"minhash_sig: $nTok tokens < n=$n (filter size(split(text,' ')) >= n first)")
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = nb + 1 // sentinel: end of token k is starts(k+1) - 1

    val mins = Array.fill(numPerms)(Long.MaxValue)
    var st = 0
    while (st <= nTok - n) {
      val h = StrHash31.hashRange(s, starts(st), starts(st + n) - 1)
      var p = 0
      while (p < numPerms) {
        val v = (h * as(p) + bs(p)) % P31
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      st += 1
    }
    new GenericArrayData(mins)
  }
}
