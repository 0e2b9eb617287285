package graft

import graft.functions.XmlTree
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-less XML tree navigation (ref `coder/xml/node.go:35-191` and
  * the `list-xml-filter-stdout` example's `Children()[0].Children()[0]
  * .Text()` — no StructType supplied anywhere in these tests).
  */
class XmlTreeSpec extends SparkSpec {
  import spark.implicits._

  private def one(xml: String) = Seq(xml).toDF("x")
    .select(XmlTree.tree(col("x")).as("v"))

  test("reference fixture: Children()(0).Children()(0).Text() on <name>Adam</name>") {
    val r = one("<name>Adam</name>")
      .select(XmlTree.childText(col("v"), 0, 0)).head().getString(0)
    assert(r == "Adam")
  }

  test("tag names, attributes, child counts at every level") {
    val df = one("""<doc id="7" kind="a"><meta><source>web</source></meta><body>hi</body></doc>""")
    val doc = XmlTree.child(col("v"), 0)
    val row = df.select(
      XmlTree.tagName(doc),
      XmlTree.attr(doc, "id"),
      XmlTree.attr(doc, "kind"),
      XmlTree.attr(doc, "missing"),
      XmlTree.numChildren(doc),
      XmlTree.tagName(XmlTree.child(doc, 0)),
      XmlTree.childText(XmlTree.child(doc, 0), 0, 0),
      XmlTree.childText(doc, 1, 0)).head()
    assert(row.getString(0) == "doc")
    assert(row.getString(1) == "7" && row.getString(2) == "a")
    assert(row.isNullAt(3))
    assert(row.getInt(4) == 2)
    assert(row.getString(5) == "meta")
    assert(row.getString(6) == "web")
    assert(row.getString(7) == "hi")
  }

  test("text entities are unescaped; comments and PIs are distinct node kinds (node.go kinds)") {
    val df = one("""<r><t>a &amp; b &lt;c&gt;</t><!--note--><?proc do it?></r>""")
    val r = XmlTree.child(col("v"), 0)
    val row = df.select(
      XmlTree.childText(r, 0, 0),              // text child of <t>
      XmlTree.comment(XmlTree.child(r, 1)),    // comment node
      XmlTree.target(XmlTree.child(r, 2)),
      XmlTree.inst(XmlTree.child(r, 2)),
      XmlTree.text(XmlTree.child(r, 1))        // Text() on a comment → null (ref: "")
    ).head()
    assert(row.getString(0) == "a & b <c>")
    assert(row.getString(1) == "note")
    assert(row.getString(2) == "proc" && row.getString(3) == "do it")
    assert(row.isNullAt(4))
  }

  test("mixed content keeps document order; innerText concatenates direct text children") {
    val df = one("<p>one<b>bold</b>two</p>")
    val p = XmlTree.child(col("v"), 0)
    val row = df.select(
      XmlTree.numChildren(p),
      XmlTree.text(XmlTree.child(p, 0)),
      XmlTree.tagName(XmlTree.child(p, 1)),
      XmlTree.text(XmlTree.child(p, 2)),
      XmlTree.innerText(p)).head()
    assert(row.getInt(0) == 3)
    assert(row.getString(1) == "one")
    assert(row.getString(2) == "b")
    assert(row.getString(3) == "two")
    assert(row.getString(4) == "onetwo")
  }

  test("malformed XML decodes to null (permissive coder contract), null stays null") {
    val rows = Seq("<unclosed>", "<a></a>", null.asInstanceOf[String]).toDF("x")
      .select(XmlTree.toJsonTree(col("x")).as("j")).collect()
    assert(rows(0).isNullAt(0))
    assert(!rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("pipeline usage without any schema: the list-xml-filter e2e shape (main.go:42-50)") {
    import graft.core._
    val names = Seq("Adam", "Bart", "Cecilia", "Brenda", "Elliot")
    val sink = new MemorySink
    Pipeline(spark)
      .root(ListSource(names.map(n => s"<name>$n</name>")))
      .mapRaw(XmlTree.tree)                                  // ≙ xml.Decoder (schema-less)
      .map(StringType)(v => XmlTree.childText(v, 0, 0))      // Children()(0).Children()(0).Text()
      .filter(v => !v.contains("B"))
      .mergeOrdered()
      .to(sink)
    assert(sink.values == Seq("Adam", "Cecilia", "Elliot"))
  }

  test("property: generated trees round-trip through serialize → parse → navigate") {
    val rnd = new scala.util.Random(13)
    def escText(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def escAttr(s: String) = escText(s).replace("\"", "&quot;")
    // random small trees: (tag, attrs, children-or-text)
    sealed trait N
    case class T(tag: String, attrs: Map[String, String], kids: Seq[N]) extends N
    case class Txt(s: String) extends N
    val chars = "ab<>&\"x 7é"
    def rndStr() = (0 until 1 + rnd.nextInt(6)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    def gen(depth: Int): T = T(
      "t" + rnd.nextInt(5),
      (0 until rnd.nextInt(3)).map(i => s"a$i" -> rndStr()).toMap,
      if (depth >= 2) Seq(Txt(rndStr()))
      else (0 until 1 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean()) Txt(rndStr()) else gen(depth + 1)
      })
    def ser(n: N): String = n match {
      case Txt(s) => escText(s)
      case T(tag, attrs, kids) =>
        val a = attrs.toSeq.sorted.map { case (k, v) => s""" $k="${escAttr(v)}"""" }.mkString
        s"<$tag$a>${kids.map(ser).mkString}</$tag>"
    }
    val trees = (0 until 40).map(_ => gen(0))
    val df = trees.map(ser).toDF("x").select(XmlTree.tree(col("x")).as("v"))
    val roots = df.select(
      XmlTree.tagName(XmlTree.child(col("v"), 0)),
      XmlTree.numChildren(XmlTree.child(col("v"), 0))).collect()
    trees.zip(roots).foreach { case (t, r) =>
      assert(r.getString(0) == t.tag)
      // adjacent Txt children coalesce in the parsed tree — count the
      // collapsed runs, and empty text serializes to nothing
      val collapsed = t.kids.foldLeft(List.empty[N]) {
        case (Txt(a) :: rest, Txt(b)) => Txt(a + b) :: rest
        case (acc, k) => k :: acc
      }.reverse.filter { case Txt(s) => s.nonEmpty; case _ => true }
      assert(r.getInt(1) == collapsed.size, s"tree ${ser(t)}")
    }
    // attribute values (with quotes/entities/unicode) survive exactly
    val attrTrees = trees.filter(_.attrs.nonEmpty)
    attrTrees.headOption.foreach { t =>
      val (k, v) = t.attrs.head
      val got = Seq(ser(t)).toDF("x")
        .select(XmlTree.attr(XmlTree.child(XmlTree.tree(col("x")), 0), k))
        .head().getString(0)
      assert(got == v, s"attr $k of ${ser(t)}")
    }
  }

  test("numeric character references and CDATA decode as text") {
    val r = one("<r><a>&#x41;&#66;</a><b><![CDATA[raw <not> parsed & kept]]></b></r>")
    val root = XmlTree.child(col("v"), 0)
    val row = r.select(
      XmlTree.childText(root, 0, 0),
      XmlTree.childText(root, 1, 0)).head()
    assert(row.getString(0) == "AB")
    assert(row.getString(1) == "raw <not> parsed & kept")
  }

  test("xml.TreeDecoder is a registered-shape coder (string → variant)") {
    val c = graft.coders.XmlCoder.treeDecoder
    assert(c.inType == StringType && c.outType == VariantType)
    val r = Seq("<k>v</k>").toDF("x")
      .select(XmlTree.childText(
        graft.functions.XmlTree.child(c(col("x")), 0), 0).as("t"))
    assert(r.head().getString(0) == "v")
  }
}
