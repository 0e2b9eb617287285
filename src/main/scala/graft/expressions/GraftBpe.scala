package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer model: an ordered merge table applied
  * over GPT-2-style pre-tokens (Sennrich et al., ACL'16; the
  * pre-tokenize-then-merge shape of GPT-2's tokenizer).
  *
  * Apply semantics (identical in [[GraftBpe]]'s kernel, the DuckDB
  * oracle's delimiter-string `replace` chain, and the trainer
  * `tools/train_bpe.py`): pre-tokenize with
  * `" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"` (leftmost-first
  * alternation — identical in Java regex, RE2 and Python `re`; the
  * trailing `\s+` alternative makes coverage TOTAL, so
  * `concat(tokens) == text` exactly — the detokenize-identity
  * property), split each pre-token into code points, then apply each
  * merge rule IN RANK ORDER as ONE left-to-right non-overlapping pass.
  * For tables produced by BPE training a single pass per rule is
  * exhaustive: a merge's output can never equal either component of
  * its own rule (lengths add), and a rule's components always come
  * from strictly earlier rules — so later rules cannot create new
  * matches for earlier ones.
  *
  * Scale: encoding is embarrassingly parallel (map-only); the kernel
  * memoizes per distinct pre-token (Zipf: the hit rate approaches 1 on
  * natural text), and a rule whose symbols are both absent from the
  * pre-token is skipped via a presence set, so the common cost per
  * pre-token is one hash lookup.
  */
object BpeModel {
  /** THE pre-tokenizer — single source for the encoder kernel, the
    * in-engine trainer ([[graft.operators.BpeTrain]]) and (by copy,
    * with `re.ASCII`) `tools/train_bpe.py`. `\s` is ASCII in Java
    * regex, RE2 AND the tool (which compiles with `re.ASCII` exactly
    * so Unicode whitespace like NBSP classifies identically — as a
    * punctuation run — in all three engines). */
  val PretokRegex = " ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
}

final class BpeModel(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val pretok =
    java.util.regex.Pattern.compile(BpeModel.PretokRegex)

  /** Bounded memo of pre-token → tokens (cleared when full — natural
    * text vocab is Zipf-bounded far below the cap). */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val memoCap = 1 << 16

  private[graft] def codePoints(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  def encodeWord(pt: String): Array[String] = {
    val hit = memo.get(pt)
    if (hit != null) return hit
    var syms = codePoints(pt)
    val present = scala.collection.mutable.HashSet.empty[String]
    syms.foreach(present += _)
    var mi = 0
    while (mi < merges.length && syms.length > 1) {
      val (l, r) = merges(mi)
      if (present.contains(l) && present.contains(r)) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        var merged = false
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; merged = true; i += 2
          } else { out += syms(i); i += 1 }
        }
        if (merged) { syms = out.toArray; present += l + r }
      }
      mi += 1
    }
    if (memo.size >= memoCap) memo.clear()
    memo.put(pt, syms)
    syms
  }

  def encode(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = pretok.matcher(text)
    while (m.find()) out ++= encodeWord(m.group())
    out.toArray
  }
}

/** The committed fixture model (`/graft/bpe/merges.txt`, hex-encoded
  * symbol pairs, produced by `tools/train_bpe.py` on the sf0.001
  * corpus) plus the SQL fragments the DuckDB oracle needs to recompute
  * the identical tokenization. */
object BpeFixture {
  lazy val default: BpeModel = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges.txt")
    require(in != null, "missing resource /graft/bpe/merges.txt (run tools/train_bpe.py)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val merges = src.getLines().filter(_.nonEmpty).map { ln =>
        val Array(a, b) = ln.split(" ", 2)
        (unhex(a), unhex(b))
      }.toArray
      new BpeModel(merges)
    } finally src.close()
  }

  private def unhex(h: String): String =
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")

  /** `(rank, left, right)` VALUES rows for the oracle's rules CTE. */
  def sqlRules: String =
    default.merges.zipWithIndex.map { case ((l, r), i) =>
      s"(${i + 1}, '${sqlEsc(l)}', '${sqlEsc(r)}')"
    }.mkString(", ")

  def ruleCount: Int = default.merges.length

  private def sqlEsc(s: String): String = s.replace("'", "''")
}

/** `graft_bpe(text)`: the full token-string array of a document under
  * the fixture BPE model — real merge-table tokenization, not the
  * pre-tokenizer count estimate of `Text.bpeTokenCount`. NULL text →
  * NULL; `concat(tokens) == text` always (see [[BpeModel]]). Same
  * static-kernel codegen shape as [[RollingWinnow]]: the generated
  * code calls the kernel directly, keeping scan → tokenize → aggregate
  * in one codegen span with no UDF serialization fence. */
case class GraftBpe(child: Expression, model: BpeModel) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe expects a string column, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftBpe.compute(s.asInstanceOf[UTF8String].toString, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdl = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.GraftBpe.compute($c.toString(), $mdl)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftBpe =
    copy(child = newChild)
}

object GraftBpe {
  def compute(s: String, model: BpeModel): GenericArrayData =
    new GenericArrayData(model.encode(s).map(UTF8String.fromString(_): AnyRef))
}
