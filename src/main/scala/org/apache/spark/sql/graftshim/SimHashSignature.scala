package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native SimHash signature: all `chunks`×`bitsPerChunk` majority-vote
  * bits of a document's k-token shingle multiset in ONE pass over the
  * token array — the SimHash sibling of [[MinHashSignature]] (see its
  * scaladoc for the map-only argument: the composable form shuffles the
  * whole shingled corpus into a per-doc aggregation that this expression
  * replaces with a scan-side projection).
  *
  * Bit-compatibility contract: shingle hash = top 60 bits of
  * md5(shingle UTF-8) — identical to `Dedup.shingleHash60` and the
  * DuckDB oracle; bit j of the signature is the sign (≥0) of
  * Σ_shingles (bit j of hash ? +1 : −1), chunk c packs bits
  * c·bitsPerChunk … c·bitsPerChunk+bitsPerChunk−1 little-endian.
  * IMPORTANT divergence from MinHash (where duplicate shingles can't
  * move a min): the vote sum is multiplicity-sensitive, and the
  * aggregated form explodes DISTINCT shingle STRINGS per doc
  * (Dedup.shingles uses array_distinct) — so this expression dedups on
  * the shingle string too, NOT on its hash (two distinct shingles
  * colliding in the 60-bit hash would legitimately vote twice).
  * Documents with < k tokens (no shingles) produce NULL; callers
  * filter, matching the aggregated form's absent rows. */
case class SimHashSignature(child: Expression, k: Int, chunks: Int,
                            bitsPerChunk: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "simhash_sig"

  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")

  /** Called from both eval and generated code (referenced object). */
  def signature(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return null
    var i = 0
    while (i < n) { if (tokens.isNullAt(i)) return null; i += 1 }
    val bits = chunks * bitsPerChunk
    val votes = new Array[Int](bits)
    val seen = new java.util.HashSet[String]()
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
      val shingle = sb.toString
      if (seen.add(shingle)) { // distinct shingle STRINGS only (scaladoc)
        md5.reset()
        val d = md5.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = h >>> 4 // top 60 bits == first 15 md5 hex chars
        var bit = 0
        while (bit < bits) {
          votes(bit) += (if (((h >> bit) & 1L) == 1L) 1 else -1)
          bit += 1
        }
      }
      start += 1
    }
    val out = new Array[Long](chunks)
    var c = 0
    while (c < chunks) {
      var cv = 0L
      var b = 0
      while (b < bitsPerChunk) {
        if (votes(c * bitsPerChunk + b) >= 0) cv |= (1L << b)
        b += 1
      }
      out(c) = cv
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimHashSignature].getName)
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

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}
