package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

/** Schema-less XML tree navigation (ref `coder/xml/node.go:35-191`: the
  * `xml.Node` DOM with `TagName/Attr/Children/Text/Comment/Target/Inst/
  * Directive`, exercised by `examples/list-xml-filter-stdout/main.go:44`
  * via `Children()[0].Children()[0].Text()`).
  *
  * Spark-first design: Spark has no schema-less XML type (`from_xml`
  * needs a `StructType` per fixture), but Spark 4 has VARIANT — the
  * native type for schema-less semi-structured data with codegen'd
  * path navigation. So the ONE custom piece is a linear per-row StAX
  * parse that rewrites XML into a JSON tree (`{"tag","attrs","nc",
  * "children":[...]}` nodes); everything after that is native:
  * `parse_json` → `variant_get` path extraction, fully columnar and
  * pushdown-friendly. This mirrors how the reference isolates parsing
  * in the decoder and keeps navigation cheap.
  *
  * Node encoding (one JSON object per reference node kind):
  *   - root:     `{"nc":N,"children":[...]}`
  *   - tag:      `{"tag":name,"attrs":{k:v,...},"nc":N,"children":[...]}`
  *   - text:     `{"text":data}` (entities already unescaped, ≙ node.go
  *                text semantics)
  *   - comment:  `{"comment":data}` (markers stripped)
  *   - procinst: `{"target":t,"inst":i}`
  *   - directive:`{"directive":data}`
  * `nc` is the child count, precomputed so arity checks don't need an
  * array cast.
  *
  * Scale: the parse is one pass per row (no DOM allocation beyond the
  * JSON string), embarrassingly parallel, and runs once — all
  * navigation afterwards is Catalyst-native variant path access, so a
  * query extracting 5 fields parses each document once, not 5 times.
  */
object XmlTree {

  /** One-pass StAX XML → JSON-tree rewrite. Coalescing (adjacent
    * character chunks merge into one text node) matches the reference's
    * CharData tokens; DTD/external entities are disabled (untrusted
    * input safety). Returns null on null/malformed input — the
    * permissive-decode contract of a data-pipeline coder. */
  // one configured factory per executor thread, not per ROW: factory
  // construction does a JAXP service-provider lookup — pure constant
  // overhead multiplied by corpus row count on this 100 TB-scale parse
  // path. ThreadLocal because StAX factories are not thread-safe.
  private val factory = ThreadLocal.withInitial[XMLInputFactory](() => {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f
  })

  private[functions] def xmlToJsonTree(xml: String): String = {
    if (xml == null) return null
    val f = factory.get()
    def esc(s: String): String = {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    try {
      val r = f.createXMLStreamReader(new java.io.StringReader(xml))
      // stack of (serialized-open-tag-prefix, children buffer); index 0
      // is the synthetic root
      val stack = ArrayBuffer((new StringBuilder, ArrayBuffer.empty[String]))
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val head = new StringBuilder("{\"tag\":\"")
              .append(esc(r.getLocalName)).append("\",\"attrs\":{")
            // qualified names (prefix:local) for namespaced attributes:
            // two legally-distinct attrs can share a local name
            // (x:id / y:id), and duplicate JSON keys would fail the
            // whole variant parse under allowDuplicateKeys=false
            head.append((0 until r.getAttributeCount).map { i =>
              val p = r.getAttributePrefix(i)
              val n = if (p == null || p.isEmpty) r.getAttributeLocalName(i)
                      else p + ":" + r.getAttributeLocalName(i)
              "\"" + esc(n) + "\":\"" + esc(r.getAttributeValue(i)) + "\""
            }.mkString(","))
            head.append("}")
            stack += ((head, ArrayBuffer.empty[String]))
          case XMLStreamConstants.END_ELEMENT =>
            val (head, kids) = stack.remove(stack.length - 1)
            head.append(",\"nc\":").append(kids.length)
              .append(",\"children\":[").append(kids.mkString(",")).append("]}")
            stack.last._2 += head.toString
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            stack.last._2 += "{\"text\":\"" + esc(r.getText) + "\"}"
          case XMLStreamConstants.COMMENT =>
            stack.last._2 += "{\"comment\":\"" + esc(r.getText) + "\"}"
          case XMLStreamConstants.PROCESSING_INSTRUCTION =>
            stack.last._2 += "{\"target\":\"" + esc(r.getPITarget) + "\",\"inst\":\"" +
              esc(Option(r.getPIData).getOrElse("")) + "\"}"
          case XMLStreamConstants.DTD =>
            stack.last._2 += "{\"directive\":\"" + esc(Option(r.getText).getOrElse("")) + "\"}"
          case _ => ()
        }
      }
      r.close()
      val rootKids = stack.head._2
      "{\"nc\":" + rootKids.length + ",\"children\":[" + rootKids.mkString(",") + "]}"
    } catch {
      case _: Exception => null
    }
  }

  private val xmlToJsonUdf = udf(xmlToJsonTree _)

  /** XML string → JSON tree string (the parse step alone). */
  def toJsonTree(c: Column): Column = xmlToJsonUdf(c)

  /** XML string → VARIANT tree: the schema-less root node. All
    * navigation below is native variant path access. try_parse_json,
    * not parse_json: the documented contract is permissive decode
    * (null on malformed) — one pathological document must not kill the
    * whole scan. */
  def tree(c: Column): Column = try_parse_json(xmlToJsonUdf(c))

  /** ≙ `Children()[i]` (node.go: child of root/tag nodes). */
  def child(v: Column, i: Int): Column =
    try_variant_get(v, s"$$.children[$i]", "variant")

  /** ≙ `len(Children())`. */
  def numChildren(v: Column): Column = try_variant_get(v, "$.nc", "int")

  /** ≙ `TagName()` — null for non-tag nodes (ref returns ""). */
  def tagName(v: Column): Column = try_variant_get(v, "$.tag", "string")

  /** ≙ `Attr()` lookup by name — null when absent / non-tag node.
    * Bracket-quoted path: a bare segment would split on '.' and choke
    * on '[' (Spark's variant path grammar), so legal XML names like
    * `data.value` or namespaced `x:id` navigate correctly. */
  def attr(v: Column, name: String): Column =
    try_variant_get(v,
      "$.attrs['" + name.replace("\\", "\\\\").replace("'", "\\'") + "']",
      "string")

  /** ≙ `Text()` — null for non-text nodes. */
  def text(v: Column): Column = try_variant_get(v, "$.text", "string")

  /** ≙ `Comment()`. */
  def comment(v: Column): Column = try_variant_get(v, "$.comment", "string")

  /** ≙ `Target()` / `Inst()` of processing instructions. */
  def target(v: Column): Column = try_variant_get(v, "$.target", "string")
  def inst(v: Column): Column = try_variant_get(v, "$.inst", "string")

  /** ≙ `Directive()`. */
  def directive(v: Column): Column = try_variant_get(v, "$.directive", "string")

  /** Deep path navigation in one call: `childText(v, 0, 0)` ≙ the
    * reference example's `Children()[0].Children()[0].Text()`. */
  def childText(v: Column, path: Int*): Column =
    try_variant_get(v,
      "$" + path.map(i => s".children[$i]").mkString + ".text", "string")

  /** Concatenated text of a node's DIRECT text children — the common
    * "element text content" accessor (`<name>Adam</name>` → "Adam"
    * via tag → text child). */
  def innerText(v: Column, childCountHint: Int = 8): Column =
    concat_ws("", (0 until childCountHint).map(i =>
      coalesce(childText(v, i), lit(""))): _*)
}
