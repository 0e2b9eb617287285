package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First `nibbles` hex digits of md5 as a BIGINT — the codegen'd kernel
  * behind the repo's oracle-portable md5-prefix hash family
  * (r19 round 1, guide §4). The chain it replaces,
  * `conv(substring(md5(x), 1, nibbles), 16, 10).cast("long")`, is
  * codegen'd but allocates a 32-char hex string, a substring slice and
  * a NumberConverter parse PER EVALUATION — and it is the innermost
  * per-element kernel of the dedup family: once per shingle occurrence
  * ([[graft.functions.Text.shingleKey]]), once per distinct shingle ×
  * permutation (minhash signatures), once per token (simhash), once
  * per row × depth (CMS cells), once per row (hash buckets), once per
  * character position (k-gram winnow prints). This expression digests
  * the UTF-8 bytes directly and assembles the value from the first
  * ceil(nibbles/2) digest bytes — no hex encode, no parse, one cached
  * MessageDigest per operator instance.
  *
  * Value contract — matches the conv/substring/md5 chain exactly:
  *   - the value is the big-endian base-16 integer of the first
  *     `nibbles` hex digits of the md5 of the input's UTF-8 bytes
  *     (Spark's md5 implicitly casts STRING → BINARY the same way);
  *   - `nibbles` is capped at 15 (≤ 60 bits) so the value is always a
  *     non-negative BIGINT — the same range conv's decimal string,
  *     cast to long, produced at the existing call sites (15 and 8);
  *   - NULL input → NULL. Empty string hashes like md5("") does.
  */
case class Md5Prefix(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles > 0 && nibbles <= 15,
    s"graft_md5_prefix: nibbles must be in 1..15, got $nibbles")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix expects a string input, got $dt — this kernel is " +
        "deliberately stricter than the conv(substring(md5(x),...)) chain it " +
        "replaces (md5 natively coerces e.g. BINARY); cast the argument to " +
        "STRING explicitly so the digested bytes are unambiguous")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    Md5Prefix.prefixOf(Md5Prefix.localDigest().digest(bytes), nibbles)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Prefix.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val md = ctx.addMutableState("java.security.MessageDigest", "md5prefixMd",
      v => s"""$v = $cls.newDigest();""")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |$md.reset();
         |${ev.value} = $cls.prefixOf($md.digest($c.getBytes()), $nibbles);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest = newDigest()
  }

  def newDigest(): java.security.MessageDigest =
    java.security.MessageDigest.getInstance("MD5")

  private[expressions] def localDigest(): java.security.MessageDigest = {
    val d = tl.get(); d.reset(); d
  }

  /** Big-endian value of the first `nibbles` hex digits of `digest` —
    * hex digit 2i is the high nibble of byte i, digit 2i+1 the low. */
  def prefixOf(digest: Array[Byte], nibbles: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      acc = (acc << 4) | nib
      i += 1
    }
    acc
  }
}
