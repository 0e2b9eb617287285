package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-bit signature packer: the codegen'd kernel behind
  * [[graft.operators.Similarity.signBits]] (r19 round 1, guide §4).
  *
  * The HOF form it replaces builds, PER ROW, one
  * `aggregate(zip_with(slice(vec,...), sequence(...), ...))` chain per
  * 32-bit word — each an interpreted fold that allocates a sequence
  * array, a zipped struct array and a boxed accumulator per step. This
  * expression is one primitive loop over the input vector producing the
  * packed `ARRAY<BIGINT>` directly. It runs once per corpus/query row
  * in the s_hamming family, mm_neardup / mm_frames_neardup, and both
  * curation media lanes (img + audio, per epoch in the stream gate).
  *
  * Value contract — matches the HOF form exactly:
  *   - `words = ceil(dim/32)` result words; bit `i mod 32` of word
  *     `i/32` is set iff `i < dim` AND element `i` exists AND is
  *     non-null AND `> 0` (float elements compare as their exact
  *     double widening, like the implicit cast in the HOF lambda);
  *   - the `> 0` follows SPARK's comparison semantics (Double.compare
  *     total order), not Java's primitive `>`: NaN sorts ABOVE every
  *     value in Catalyst, so a NaN element sets its bit exactly like
  *     the HOF's `when(x > 0d, ...)` did; -0.0 equals 0.0 and leaves
  *     its bit 0 under both orders;
  *   - elements beyond `dim`, missing elements (vec shorter than dim)
  *     and null elements leave their bit 0 — the HOF's otherwise
  *     branch, with zip_with padding a short slice with nulls;
  *   - NULL input vector → an array of `words` NULL words (each
  *     per-word aggregate evaluates to NULL, `array(...)` of them is a
  *     non-null array with null elements), NOT a NULL array — so the
  *     expression itself is never null.
  */
case class SignBits(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, "graft_sign_bits: dim must be positive")

  private val words = (dim + 31) / 32

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_sign_bits"
  // never null at the top level: a null vector packs to [null, ...]
  override def nullable: Boolean = false

  private lazy val elemIsDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val elemContainsNull =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_bits expects array<float> or array<double>, got $dt")
  }

  // shared all-null result for null input vectors (one per expression
  // instance, ADVICE r19 #3): the value is constant and consumers never
  // mutate returned ArrayData, so per-row allocation on null-heavy
  // embedding columns is pure garbage
  @transient private lazy val nullResult = new GenericArrayData(new Array[Any](words))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return nullResult
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      if (!(elemContainsNull && arr.isNullAt(i))) {
        // Spark total order: NaN > 0 is TRUE (see scaladoc)
        val pos = if (elemIsDouble) java.lang.Double.compare(arr.getDouble(i), 0d) > 0
                  else java.lang.Float.compare(arr.getFloat(i), 0f) > 0
        if (pos) out(i / 32) |= 1L << (i % 32)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val arr = childGen.value
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val buf = ctx.freshName("buf")
    val gad = classOf[GenericArrayData].getName
    // Spark total order: NaN > 0 is TRUE (see scaladoc)
    val getter =
      if (elemIsDouble) s"java.lang.Double.compare($arr.getDouble($i), 0D) > 0"
      else s"java.lang.Float.compare($arr.getFloat($i), 0F) > 0"
    val nullGuard = if (elemContainsNull) s"!$arr.isNullAt($i) && " else ""
    // hoisted all-null result (ADVICE r19 #3): constant per expression
    // instance and never mutated by consumers — allocate once per
    // operator, not once per null row
    val nullArr = ctx.addMutableState(gad, "signBitsNullArr",
      v => s"$v = new $gad(new Object[$words]);")
    val code = code"""
      ${childGen.code}
      ArrayData ${ev.value};
      if (${childGen.isNull}) {
        ${ev.value} = $nullArr;
      } else {
        long[] $buf = new long[$words];
        int $n = java.lang.Math.min($dim, $arr.numElements());
        for (int $i = 0; $i < $n; $i++) {
          if ($nullGuard($getter)) {
            $buf[$i / 32] |= 1L << ($i % 32);
          }
        }
        ${ev.value} = new $gad($buf);
      }
    """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}
