package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: the full `numHashes`-permutation signature of
  * a document's k-token shingle set in ONE pass over the token array —
  * no shingle explode, no shuffle, no 32-way min aggregation.
  *
  * Why a third custom Expression (after FloatVectorDot/VectorLshSignature):
  * the composable form materializes every shingle as a row
  * (`explode` → n_tokens rows per doc) and shuffles them into a groupBy
  * with `numHashes` min aggregates — at 100 TB that shuffle carries the
  * ENTIRE shingled corpus (~10× the text bytes) just to throw it away
  * into per-doc minima. Sketching is algebraically map-only; this
  * expression makes the plan say so: scan → project, signature built
  * per-row, and the only shuffle left in LSH dedup is the tiny
  * (band, bucket) index.
  *
  * Bit-compatibility contract (the reason this is oracle-safe): shingle
  * hash = first 15 hex chars of md5(shingle UTF-8 bytes) — i.e. the top
  * 60 bits of the digest — taken mod 2^31-1, then the i-th affine
  * permutation (a_i·x + b_i) mod 2^31-1 with the SAME a_i/b_i formula as
  * `graft.ext.Dedup.perm` (and the DuckDB oracle CTEs). Duplicate
  * shingles need no dedup: min over a multiset equals min over its set.
  * Documents with fewer than k tokens produce NULL (the aggregated form
  * simply has no row for them — callers filter nulls, same semantics).
  *
  * DedupSkewSpec/VectorExprSpec-style equality is pinned in
  * MinHashExprSpec: signature-for-signature bit-equality with the
  * explode+groupBy reference form on the real corpus. */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  private val M = 2147483647L // 2^31 - 1

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => (1103515245L * (i + 1) + 12345L) % M)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => (362436069L * (i + 1) + 521288629L) % M)

  /** One digest instance per partition-thread via the expression instance;
    * MessageDigest is not thread-safe but each task evaluates its own
    * deserialized expression tree, so plain lazy instantiation is safe. */
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  /** Called from both eval and generated code (referenced object). */
  def signature(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return null
    var i = 0
    while (i < n) { if (tokens.isNullAt(i)) return null; i += 1 }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var start = 0
    while (start <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(start + j).toString)
        j += 1
      }
      md5.reset()
      val d = md5.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // top 60 bits of the digest == first 15 hex chars parsed base-16
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      val x = (h >>> 4) % M
      var p = 0
      while (p < numHashes) {
        val v = (as(p) * x + bs(p)) % M
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      start += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    signature(input.asInstanceOf[ArrayData])

  /** Codegen: one virtual call into [[signature]] per row. The per-shingle
    * md5 dominates runtime, so inlining the loop into generated Java buys
    * nothing; what matters is staying INSIDE the whole-stage-codegen
    * produce/consume loop (no CodegenFallback row materialization). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $self.signature($a);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
