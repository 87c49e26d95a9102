package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One lexicon word's encode result: its subword count and subword ids.
  * Values-only (the word itself is the probe key of the broadcast map). */
final class BpeEntry(val nSub: Long, val ids: Array[Long]) extends Serializable

/** Shared pieces of the broadcast-lexicon kernels. */
object LexKernels {
  /** h60 of a token's UTF-8 bytes — bit-identical to the column form
    * `conv(substring(md5(cast(c as binary)), 1, 15), 16, 10)` (see
    * [[graft.operators.Dedup.h60]]): the first 15 hex digits of the MD5
    * are bytes 0..6 plus the high nibble of byte 7. Same bit math as
    * [[TokensH60.kernel]]. */
  def h60(u: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(u.getBytes)
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  private[functions] def checkArrayOfString(name: String, t: DataType): TypeCheckResult =
    t match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<string>, got ${other.catalogString}")
    }
}

/** Native Catalyst expression: the per-document BPE encode statistics in
  * ONE pass over the token array against a BROADCAST lexicon —
  * `BpeDocStats(ws, bc)` returns `struct(n_tokens, n_bpe, ids8)`.
  *
  * Replaces the explode → broadcast-hash-join → per-doc hash-aggregate
  * shape ta17/ta18/sp11 shared (one exploded row and one join probe PER
  * TOKEN OCCURRENCE, plus a collect_list/sort_array/flatten chain for the
  * first-8 slice): here each document is one kernel call that probes a
  * java.util.HashMap once per token. The lexicon rides a
  * [[org.apache.spark.broadcast.Broadcast]] handle — the task binary
  * stays small, executors fetch the map once, and the expression stays
  * inside whole-stage codegen via the [[kernel]] reference call (the
  * TextMetrics/PiiScrub pattern). This is the shape a tokenizer actually
  * deploys at 100 TB: the model rides a broadcast, the corpus never
  * explodes or shuffles.
  *
  * Exactness contract (spec-pinned against the retired explode/join/agg
  * form, including on a PARTIAL lexicon where the join semantics bite):
  *   - `n_tokens` counts non-empty tokens PRESENT IN THE LEXICON — the
  *     inner join dropped misses (with a swapped serving lexicon, OOV
  *     words vanish from the count, and ta17's caller drops all-miss
  *     docs via `n_tokens > 0`, exactly as the join+groupBy did);
  *   - `n_bpe` sums the lexicon's `n_sub` over those same hits (exact
  *     integer sum — order-free);
  *   - `ids8` replicates `slice(flatten(ids of hits among the FIRST 8
  *     NON-EMPTY tokens), 1, 8)` comma-joined: position indexes
  *     non-empty tokens (hit or miss), only hits contribute ids, and the
  *     flattened prefix is cut to 8 ids.
  */
case class BpeDocStats(child: Expression,
    lex: Broadcast[java.util.HashMap[UTF8String, BpeEntry]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    LexKernels.checkArrayOfString(prettyName, child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("ids8", StringType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "bpe_doc_stats"

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val map = lex.value
    var nTok = 0L
    var nBpe = 0L
    var pos = 0L // index over NON-EMPTY tokens, hit or miss
    var ids8n = 0
    val ids8 = new Array[Long](8)
    var idsDone = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok.numBytes() != 0) {
        val e = map.get(tok)
        if (e != null) {
          nTok += 1L
          nBpe += e.nSub
          if (!idsDone && pos < 8) {
            val ids = e.ids
            var k = 0
            while (k < ids.length && ids8n < 8) {
              ids8(ids8n) = ids(k); ids8n += 1; k += 1
            }
            if (ids8n == 8) idsDone = true
          }
        }
        pos += 1L
        if (pos >= 8) idsDone = true
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(ids8n * 6)
    var k = 0
    while (k < ids8n) {
      if (k > 0) sb.append(',')
      sb.append(ids8(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nBpe, UTF8String.fromString(sb.toString)))
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeDocStats", this, classOf[BpeDocStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: the per-document vocab encode + OOV audit
  * in ONE pass over the token array against a BROADCAST vocab —
  * `VocabDocStats(ws, bc, vocabSize, oovBuckets)` returns
  * `struct(n_tokens, n_oov, ids8)`.
  *
  * Replaces ta16's `element_at(typedlit(map), tok)` probes: a Catalyst
  * map literal is ArrayBasedMapData, so EVERY element_at is an O(|vocab|)
  * LINEAR SCAN — three of them per token (id, oov test, ids8) made the
  * "zero-shuffle map-side" plan quadratic-ish in disguise. Here each
  * token is one O(1) HashMap probe; OOV ids fall back to
  * `vocabSize + h60(tok) % oovBuckets` with the exact column-form h60
  * ([[LexKernels.h60]]).
  *
  * Exactness contract (spec-pinned against the typedlit form):
  *   - `n_tokens` counts non-empty tokens (vocab hits AND misses);
  *   - `n_oov` counts non-empty tokens absent from the vocab;
  *   - `ids8` = ids of the FIRST 8 non-empty tokens (hit → vocab id,
  *     miss → hash fallback), comma-joined.
  */
case class VocabDocStats(child: Expression,
    vocab: Broadcast[java.util.HashMap[UTF8String, java.lang.Long]],
    vocabSize: Long, oovBuckets: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    LexKernels.checkArrayOfString(prettyName, child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_oov", IntegerType, nullable = false),
    StructField("ids8", StringType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "vocab_doc_stats"

  /** Kernel shared by interpreted eval and codegen (called per row). */
  def kernel(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val map = vocab.value
    var nTok = 0
    var nOov = 0
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok.numBytes() != 0) {
        val id = map.get(tok)
        if (id == null) nOov += 1
        if (nTok < 8) {
          if (nTok > 0) sb.append(',')
          if (id == null) sb.append(vocabSize + LexKernels.h60(tok) % oovBuckets)
          else sb.append(id.longValue())
        }
        nTok += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nOov, UTF8String.fromString(sb.toString)))
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vocabDocStats", this, classOf[VocabDocStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
