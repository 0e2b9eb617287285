package graft.queries

import graft.coders.{AvroSerde, Coders}
import graft.core.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coder/serde round-trip queries (SURVEY §2.4) wired into the
  * correctness gate: each runs encode∘decode through the real coder
  * stack and must reproduce the source columns exactly — the oracle
  * asserts the identity. Plus the scalar-function surface and the as-of
  * join operator.
  */
object CoderQueries {

  /** THREE coder surfaces in one gate (gate-corpus consolidation, r11
    * verdict item #5 — every absorbed gate's columns kept, one Spark
    * job + one oracle statement instead of three):
    *  - `text`: str.Encoder ∘ str.Decoder identity (was this gate);
    *  - `text_kv`: the coder PLANNER's auto-injected
    *    string→KVMBinary→string chain, ref pipeline.go:168-197 (was
    *    c_kv_roundtrip);
    *  - `proto`/`path`/`name`: url.Decoder field extraction on
    *    synthesized file paths (was c_url_parse). */
  def cStrRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val reg = Coders.registry
    Tables(spark, dir).documents
      .select(col("doc_id"),
        Coders.strDecoder(Coders.strEncoder(col("text"))).as("text"),
        reg.convert(
          reg.convert(col("text"), StringType, Coders.kvmBinaryType),
          Coders.kvmBinaryType, StringType).as("text_kv"),
        Coders.urlDecoder(
          concat(lit("file:///corpus/"), col("source"), lit("/"),
            col("doc_id").cast(StringType), lit(".txt"))).as("u"))
      .select(col("doc_id"), col("text"), col("text_kv"),
        col("u.proto").as("proto"), col("u.path").as("path"),
        col("u.name").as("name"))
      .orderBy("doc_id")
  }

  /** gzip.Encoder ∘ gzip.Decoder identity (plus the str pair). */
  def cGzipRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        Coders.strDecoder(Coders.gunzip(Coders.gzip(Coders.strEncoder(col("text"))))).as("text"))
      .orderBy("doc_id")

  /** The full XML surface in ONE gate (r12 consolidation — absorbed
    * c_xml_roundtrip's columns). Schema-less XML tree navigation (ref
    * `coder/xml/node.go` — NO user-supplied StructType on this path):
    * nested per-doc XML is built from the table (entity-escaped),
    * parsed ONCE into a VARIANT tree, and every output field is
    * extracted by pure node navigation — attr lookup, `Children()[i]`
    * indexing two levels deep, text-node access, child counting —
    * exactly the reference example's
    * `Children()[0].Children()[0].Text()` access pattern. PLUS the
    * TYPED xml.Encoder ∘ xml.Decoder identity (native
    * to_xml/from_xml with a StructType) as `rt_name`, computed in the
    * same single pass over the table. */
  def cXmlTree(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.XmlTree
    def escaped(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(c,
        "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val rtSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val xml = Tables(spark, dir).documents
      .select(col("doc_id").as("orig_id"),
        concat(
          lit("<doc id=\""), col("doc_id"), lit("\"><meta><source>"),
          escaped(col("source")), lit("</source><lang>"),
          escaped(col("lang")), lit("</lang></meta><body>"),
          escaped(substring(col("text"), 1, 80)), lit("</body></doc>")).as("x"),
        to_xml(struct(col("doc_id").as("id"), col("source").as("name"))).as("rx"))
    // parse once; navigate many (variant path access is columnar)
    val t = xml.select(col("orig_id"), XmlTree.tree(col("x")).as("v"),
      from_xml(col("rx"), rtSchema).as("rv"))
    val doc = XmlTree.child(col("v"), 0)          // <doc>
    val meta = XmlTree.child(doc, 0)              // <meta>
    t.select(
        XmlTree.attr(doc, "id").cast(LongType).as("doc_id"),
        XmlTree.childText(meta, 0, 0).as("source"),   // meta/source/text()
        XmlTree.childText(meta, 1, 0).as("lang"),     // meta/lang/text()
        coalesce(XmlTree.childText(doc, 1, 0), lit("")).as("body"),
        XmlTree.numChildren(doc).cast(IntegerType).as("n_children"),
        XmlTree.tagName(meta).as("meta_tag"),
        col("rv.name").as("rt_name"))
      .orderBy("doc_id")
  }

  private val docSchema =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"id","type":"long"},{"name":"text","type":"string"}]}""".stripMargin

  /** The full Confluent Avro surface in ONE gate (r12 consolidation —
    * absorbed c_avro_project's columns): the encode ∘ decode identity
    * (SchemaRegistryEncoder → SchemaRegistryDecoder ∘ GenericDecoder,
    * columns `id`/`text`) AND serde.GenericProjector's reader-schema
    * resolution — decode with a reader schema that differs from the
    * writer (a field dropped, a field added with a default; Avro-spec
    * match-by-name resolution; ref `serde/generic.go`) — as
    * `lang`/`tag`, both computed in one pass over the table. */
  def cAvroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val reg = new AvroSerde.InMemoryRegistry
    Tables(spark, dir).documents
      .select(
        AvroSerde.encodeConfluent(
          struct(col("doc_id").as("id"), col("text")), reg, "docs", docSchema).as("b"),
        AvroSerde.encodeConfluent(
          struct(col("doc_id").as("id"), col("text"), col("lang")),
          reg, "docs3", docWriterSchema).as("b3"))
      .select(AvroSerde.decodeConfluent(col("b"), reg, docSchema).as("v"),
        AvroSerde.decodeConfluent(col("b3"), reg, docReaderSchema).as("v3"))
      .select(col("v.id").as("id"), col("v.text").as("text"),
        col("v3.lang").as("lang"), col("v3.tag").as("tag"))
      .orderBy("id")
  }

  private val docWriterSchema =
    """{"type":"record","name":"Doc3","fields":[
      |{"name":"id","type":"long"},{"name":"text","type":"string"},
      |{"name":"lang","type":"string"}]}""".stripMargin

  private val docReaderSchema =
    """{"type":"record","name":"Doc3","fields":[
      |{"name":"id","type":"long"},{"name":"lang","type":"string"},
      |{"name":"tag","type":"string","default":"x"}]}""".stripMargin

  /** JSON encode ∘ decode identity (serde.JsonEncoder ≙ to_json). */
  def cJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType)))
    Tables(spark, dir).documents
      .select(to_json(struct(col("doc_id").as("id"), col("lang"))).as("j"))
      .select(from_json(col("j"), schema).as("v"))
      .select(col("v.id").as("id"), col("v.lang").as("lang"))
      .orderBy("id")
  }

  /** PERMISSIVE JSONL ingest with corrupt-record QUARANTINE — the
    * messy-ingest path every production pipeline needs and the
    * reference's strict coders lack (a bad record kills the ref's
    * decode stage; here it lands in a quarantine column and the batch
    * keeps flowing). Every 50th document's JSON line is
    * deterministically mangled; `from_json` with
    * `columnNameOfCorruptRecord` must fail EXACTLY those rows (fields
    * NULL, quarantined flag true, the raw line preserved for replay)
    * and round-trip every other row's values — which is what the
    * oracle pins semantically, with no JSON-text comparison (each
    * engine's serializer formatting is its own business).
    *
    * Scale: map-only — serialize, parse, flag; no shuffle at any
    * size. The quarantine column is the splittable dead-letter
    * channel: `.filter(quarantined)` IS the dead-letter queue. */
  def cJsonlQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val jsonl = Tables(spark, dir).documents
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 50 === 0,
          concat(lit("{\"doc_id\":"), col("doc_id"), lit(",INVALID")))
          .otherwise(to_json(struct(col("doc_id"), col("lang"), col("source"))))
          .as("line"))
    val schema = StructType.fromDDL(
      "doc_id LONG, lang STRING, source STRING, _corrupt STRING")
    jsonl
      .select(col("id"), from_json(col("line"), schema,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      .select(col("id"), col("r.lang").as("lang"), col("r.source").as("source"),
        col("r._corrupt").isNotNull.as("quarantined"))
      .orderBy("id")
  }

  /** Schema EVOLUTION across parquet generations — the other
    * messy-ingest reality next to [[cJsonlQuarantine]]: a corpus
    * written over months gains columns, and a reader must merge
    * generations without rewriting history. Even docs are staged as a
    * v1 file (doc_id, lang); odd docs as a v2 file that ADDED a
    * column (doc_id, lang, source); `mergeSchema` must union the
    * footers so v1 rows surface the new column as NULL and v2 rows
    * keep their values — which the oracle pins semantically from the
    * source table (parity = evolution lost nothing and invented
    * nothing).
    *
    * Scale: schema merge is a FOOTER operation (per-file metadata, no
    * data scan); the read itself stays one pass over both
    * generations. The staged files are per-call scratch, deleted
    * after the eager materialization. */
  def cSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // the try opens BEFORE the staging writes: a failed write (disk
    // full) must still reach the finally, or retries accumulate
    // orphaned corpus copies in /tmp
    try {
      val docs = Tables(spark, dir).documents
      docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$stage/gen=v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite").parquet(s"$stage/gen=v2")
      spark.read.option("mergeSchema", "true").parquet(stage)
        .select(col("doc_id"), col("lang"), col("source"), col("gen"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
  }

  /** Scalar function surface: date/math/string functions (§2.7 — all
    * native, codegen'd; dtypes aligned with the oracle's bigint
    * defaults). */
  def q18ScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(col("o_orderkey") <= 400)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        round(sqrt(col("o_totalprice")), 4).as("sq"),
        round(log(col("o_totalprice")), 4).as("lg"),
        round(abs(col("o_totalprice") - 100000.5), 4).as("ab"),
        ceil(col("o_totalprice")).as("cl"),
        floor(col("o_totalprice")).as("fl"),
        upper(substring(col("o_orderpriority"), 1, 4)).as("up"),
        regexp_replace(col("o_orderstatus"), "O", "X").as("rp"),
        lpad(col("o_orderkey").cast(StringType), 8, "0").as("pad"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("cw"))
      .orderBy("o_orderkey")

  /** As-of join: each click event matched to the latest view event of
    * the same user at or before its timestamp. */
  def q19Asof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    AsOfJoin.backward(clicks, views, key = "user_id",
        leftTime = "ts", rightTime = "view_ts",
        rightPayload = Seq("view_event_id"))
      .select("event_id", "user_id", "view_event_id")
      .orderBy("event_id")
  }
}
