package graft.coders

import graft.core.{Coder, CoderRegistry}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The standard coder catalog, mirroring the reference's
  * `coder.Registry()` (amient/goconnect `coder/registry.go:11-24`), as
  * codegen-friendly column expressions (SURVEY §2.4).
  */
object Coders {

  /** KVBinary ≙ goconnect `types.go:37-41` (Kafka record shape). */
  val kvBinaryType: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType)))

  /** KVMBinary ≙ goconnect `types.go:43-48`. */
  val kvmBinaryType: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("headers", MapType(StringType, BinaryType))))

  /** Url ≙ goconnect `coder/url/url.go:29-34`. */
  val urlType: StructType = StructType(Seq(
    StructField("proto", StringType), StructField("path", StringType),
    StructField("name", StringType), StructField("mod", LongType)))

  /** bytes→string (ref `coder/str/decoder.go:27-41`). */
  val strDecoder: Coder = Coder("str.Decoder", BinaryType, StringType)(
    c => decode(c, "UTF-8"))

  /** string→bytes (ref `coder/str/encoder.go:27-41`). */
  val strEncoder: Coder = Coder("str.Encoder", StringType, BinaryType)(
    c => encode(c, "UTF-8"))

  /** bytes→KVBinary with nil key (ref `coder/kv/encoder.go:27-44`). */
  val nilKeyEncoder: Coder = Coder("kv.NilKeyEncoder", BinaryType, kvBinaryType)(
    c => struct(lit(null).cast(BinaryType).as("key"), c.as("value")))

  /** KVBinary→bytes dropping the key (ref `coder/kv/decoder.go:27-41`). */
  val ignoreKeyDecoder: Coder = Coder("kv.IgnoreKeyDecoder", kvBinaryType, BinaryType)(
    c => c.getField("value"))

  /** KVBinary→KVMBinary with empty headers (ref `coder/kv/encoder.go:46-64`). */
  val noMetaEncoder: Coder = Coder("kv.NoMetaEncoder", kvBinaryType, kvmBinaryType)(
    c => struct(
      c.getField("key").as("key"), c.getField("value").as("value"),
      map().cast(MapType(StringType, BinaryType)).as("headers")))

  /** KVMBinary→KVBinary dropping headers (ref `coder/kv/decoder.go:43-57`). */
  val noMetaDecoder: Coder = Coder("kv.NoMetaDecoder", kvmBinaryType, kvBinaryType)(
    c => struct(c.getField("key").as("key"), c.getField("value").as("value")))

  private val gzipUdf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(b); gz.close()
      bos.toByteArray
    }
  }

  private val gunzipUdf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      // close() releases the native zlib Inflater NOW — leaving it to
      // finalization accumulates off-heap memory across millions of rows
      try drain(in) finally in.close()
    }
  }

  private def drain(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** gzip-compress bytes (ref `coder/gzip/encoder.go:10-33`). Registered
    * under a distinct logical type so injection can target it explicitly.
    * Scale: per-row deflate is CPU-bound and embarrassingly parallel; for
    * file-level compression prefer parquet/zstd codecs (native). */
  def gzip(c: Column): Column = gzipUdf(c)

  /** gunzip bytes (ref `coder/gzip/decoder.go:10-33`). */
  def gunzip(c: Column): Column = gunzipUdf(c)

  private val bzip2Udf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val bz = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos)
      bz.write(b); bz.close()
      bos.toByteArray
    }
  }

  private val bunzip2Udf = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val in = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorInputStream(new java.io.ByteArrayInputStream(b))
      try drain(in) finally in.close()
    }
  }

  /** bzip2 compress/decompress (commons-compress, bundled with Spark) —
    * the second codec of the reference's conditional-decode TODO. */
  def bzip2(c: Column): Column = bzip2Udf(c)
  def bunzip2(c: Column): Column = bunzip2Udf(c)

  /** Conditional decompression by content sniffing (gzip magic
    * 0x1f 0x8b) — implements the reference's own TODO
    * (`examples/localfs-subflow-localfs/main.go:49`:
    * "if gz then Apply(gzip.Decode)"), which goconnect never shipped.
    * CaseWhen evaluates the decode branch only for matching rows, so a
    * mixed plain/compressed corpus pays the inflate cost only where
    * needed. */
  def gunzipIfGzipped(c: Column): Column =
    when(substring(c, 1, 2) === lit(Array(0x1f.toByte, 0x8b.toByte)), gunzip(c))
      .otherwise(c)

  /** Full auto-sniffing decompression — BOTH branches of the reference
    * TODO ("if gz then gzip.Decode, if bz then bzip.Decode"): gzip magic
    * `1f 8b`, bzip2 magic `BZh`, anything else passes through. */
  def decompressAuto(c: Column): Column =
    when(substring(c, 1, 2) === lit(Array(0x1f.toByte, 0x8b.toByte)), gunzip(c))
      .when(substring(c, 1, 3) === lit("BZh".getBytes("UTF-8")), bunzip2(c))
      .otherwise(c)

  /** string path → Url struct (ref `coder/url/decoder.go:30-59`, semantic
    * equivalent — the reference's length-prefixed wire layout has no Spark
    * meaning; the Url row is what flows). */
  val urlDecoder: Coder = Coder("url.Decoder", StringType, urlType) { c =>
    val noProto = regexp_replace(c, "^[a-z]+://", "")
    struct(
      when(c.rlike("^[a-z]+://"), regexp_extract(c, "^([a-z]+)://", 1))
        .otherwise(lit("file")).as("proto"),
      regexp_extract(noProto, "^(.*/)?[^/]*$", 1).as("path"),
      regexp_extract(noProto, "([^/]*)$", 1).as("name"),
      lit(0L).as("mod"))
  }

  /** Url struct → canonical string (ref `coder/url/encoder.go:30-50`). */
  val urlEncoder: Coder = Coder("url.Encoder", urlType, StringType)(
    c => concat(c.getField("proto"), lit("://"), c.getField("path"), c.getField("name")))

  /** The default registry ≙ `coder.Registry()`. XML and Avro coders are
    * schema-parameterized and constructed via [[XmlCoder]] / [[AvroSerde]]. */
  def registry: CoderRegistry = CoderRegistry(Seq(
    strDecoder, strEncoder, nilKeyEncoder, ignoreKeyDecoder,
    noMetaEncoder, noMetaDecoder, urlDecoder, urlEncoder))
}

/** Schema-parameterized XML coders over Spark 4's native from_xml/to_xml
  * (ref `coder/xml/decoder.go:28-46`, `encoder.go:29-51`; SURVEY §2.4 —
  * the schema-less `xml.Node` tree maps to a per-fixture StructType).
  */
object XmlCoder {
  def decoder(schema: StructType): Coder =
    Coder("xml.Decoder", StringType, schema)(c =>
      from_xml(c, schema, Map.empty[String, String].asJava))

  /** SCHEMA-LESS decoder — the reference's default `xml.Decoder`
    * behavior (string → navigable `xml.Node` tree, `coder/xml/
    * node.go:35-191`): no StructType required; the value becomes a
    * VARIANT tree navigated with [[graft.functions.XmlTree]]. */
  def treeDecoder: Coder =
    Coder("xml.TreeDecoder", StringType, VariantType)(
      graft.functions.XmlTree.tree)
  def encoder(schema: StructType): Coder =
    Coder("xml.Encoder", schema, StringType)(c => to_xml(c))
}
