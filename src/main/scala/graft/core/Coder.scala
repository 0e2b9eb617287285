package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType

/** A coder is a typed 1→1 column transform used for automatic serde
  * injection, mirroring the reference's coder concept (amient/goconnect
  * `coder/registry.go:11-24`, injection search `pipeline.go:168-197`).
  *
  * Spark-first: a coder is a pure `Column => Column` expression, so every
  * injected coder stays inside whole-stage codegen (no stage boundary, no
  * extra shuffle — at 100 TB an injected serde chain costs exactly what
  * the fused expression costs).
  */
trait Coder extends Serializable {
  def name: String
  def inType: DataType
  def outType: DataType
  def apply(in: Column): Column
}

object Coder {
  def apply(nm: String, in: DataType, out: DataType)(f: Column => Column): Coder =
    new Coder {
      val name = nm
      val inType = in
      val outType = out
      def apply(c: Column): Column = f(c)
    }

  /** Nullability-normalized type view: a KVM struct built from literals
    * or casts carries non-null fields but IS the declared KVM type —
    * coder identity (chain search, [[graft.core.Flow.via]] checks,
    * adapt no-op detection) must never depend on nullability flags. */
  def loose(dt: DataType): DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, loose(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(loose(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(loose(m.keyType), loose(m.valueType), valueContainsNull = true)
      case other => other
    }
  }
}

/** Coder catalog + the greedy injection search.
  *
  * Reference semantics (`pipeline.go:168-197`): depth-bounded (≤5) search
  * for a chain `from ⇒ … ⇒ to`; prefer a direct one-step coder, else
  * recurse on the first coder whose inType matches; fail if unsatisfiable.
  */
final case class CoderRegistry(coders: Seq[Coder]) {
  def ++(more: Seq[Coder]): CoderRegistry = CoderRegistry(coders ++ more)

  /** Find a coder chain converting `from` to `to` (depth ≤ 5). Iterative
    * deepening so the SHORTEST chain wins — same depth bound as the
    * reference but without its greedy-first-match detours. */
  def chain(from: DataType, to: DataType, depth: Int = 5): Option[List[Coder]] =
    (1 to depth).iterator.flatMap(d => chainAt(from, to, d)).nextOption()

  private def chainAt(from: DataType, to: DataType, depth: Int): Option[List[Coder]] = {
    // nullability-loose matching throughout: a flow whose struct fields
    // are non-null (literals, casts) must still match coders declared
    // with default-nullable fields — see [[Coder.loose]]
    val f = Coder.loose(from)
    val t = Coder.loose(to)
    if (depth == 0) return if (f == t) Some(Nil) else None
    coders.find(c => Coder.loose(c.inType) == f && Coder.loose(c.outType) == t) match {
      case Some(direct) => Some(direct :: Nil)
      case None =>
        coders.iterator
          .filter(c => Coder.loose(c.inType) == f)
          .flatMap(c => chainAt(c.outType, to, depth - 1).map(c :: _))
          .nextOption()
    }
  }

  /** Apply the injected chain to a column; error mirrors the reference's
    * "cannot use coders to convert" panic (`pipeline.go:195`). */
  def convert(col: Column, from: DataType, to: DataType): Column =
    chain(from, to) match {
      case Some(cs) => cs.foldLeft(col)((acc, c) => c(acc))
      case None => throw new IllegalArgumentException(
        s"cannot use coders to convert $from => $to")
    }
}
