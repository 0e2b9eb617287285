package graft.coders

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.functions.{lit, udf}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Confluent-wire-format Avro serde — the one genuinely custom serde of
  * the reference surface (SURVEY §4 "custom pieces"; ref
  * `coder/serde/decoder.go:30-105`, `encoder.go:50-96`,
  * `projector.go:8-33`). spark-avro is absent from this image, so decode/
  * encode are built directly on the bundled avro-1.12.1.
  *
  * Wire format (ref `coder/serde/decoder.go:66-81`): byte 0 = magic 0x00,
  * bytes 1-4 = BigEndian uint32 schema id, bytes 5.. = Avro binary body.
  *
  * Scale: the UDFs are per-row, schema-cached (TrieMap keyed by schema id
  * / json), allocation-light, and fully partition-parallel; schema
  * registry lookups happen once per executor per schema, never per row.
  */
object AvroSerde {

  /** Minimal schema-registry abstraction (ref: Confluent client use at
    * `coder/serde/decoder.go:44-63`). Zero-egress image ⇒ the in-memory
    * implementation is the default; an HTTP-backed client can implement
    * the same trait unchanged. */
  trait SchemaRegistry extends Serializable {
    def register(subject: String, schemaJson: String): Int
    def schemaById(id: Int): String
  }

  /** Deterministic in-memory registry (ids assigned in registration
    * order, stable across executors because registration happens at plan
    * build time on the driver and the map is broadcast via closure). */
  final class InMemoryRegistry extends SchemaRegistry {
    private val bySubject = TrieMap.empty[String, Int]
    private val byId = TrieMap.empty[Int, String]
    private val next = new java.util.concurrent.atomic.AtomicInteger(1)
    def register(subject: String, schemaJson: String): Int =
      bySubject.getOrElseUpdate(s"$subject:$schemaJson", {
        val id = next.getAndIncrement()
        byId.put(id, schemaJson)
        id
      })
    def schemaById(id: Int): String =
      byId.getOrElse(id, throw new IllegalArgumentException(s"unknown schema id $id"))
  }

  // ---- Avro schema ↔ Spark schema ----------------------------------

  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), sparkType(f.schema()), nullable = true)).toSeq)
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported: $s")
      sparkType(nonNull.head)
    case Schema.Type.ENUM => StringType
    case Schema.Type.FIXED => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private def avroValueToSpark(v: Any, s: Schema): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case bb: ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case f: GenericData.Fixed => f.bytes()
    case r: GenericRecord => recordToRow(r)
    case l: java.util.Collection[_] =>
      val elem = resolve(s).getElementType
      l.asScala.map(avroValueToSpark(_, elem)).toSeq
    case m: java.util.Map[_, _] =>
      val vs = resolve(s).getValueType
      m.asScala.map { case (k, mv) => k.toString -> avroValueToSpark(mv, vs) }.toMap
    case other => other
  }

  private def resolve(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    case _ => s
  }

  def recordToRow(r: GenericRecord): Row =
    Row.fromSeq(r.getSchema.getFields.asScala.map(f =>
      avroValueToSpark(r.get(f.pos()), resolve(f.schema()))).toSeq)

  private def sparkValueToAvro(v: Any, s: Schema): Any = {
    val rs = resolve(s)
    (v, rs.getType) match {
      case (null, _) => null
      case (row: Row, Schema.Type.RECORD) => rowToRecord(row, rs)
      case (bytes: Array[Byte], Schema.Type.BYTES) => ByteBuffer.wrap(bytes)
      case (bytes: Array[Byte], Schema.Type.FIXED) => new GenericData.Fixed(rs, bytes)
      case (str: String, Schema.Type.ENUM) => new GenericData.EnumSymbol(rs, str)
      case (seq: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        seq.map(sparkValueToAvro(_, rs.getElementType)).asJava
      case (m: scala.collection.Map[_, _], Schema.Type.MAP) =>
        m.map { case (k, mv) => k.toString -> sparkValueToAvro(mv, rs.getValueType) }
          .toMap.asJava
      case (other, _) => other
    }
  }

  def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      val idx = row.fieldIndex(f.name())
      rec.put(f.pos(), sparkValueToAvro(row.get(idx), f.schema()))
    }
    rec
  }

  // ---- wire codec ---------------------------------------------------

  private val schemaCache = TrieMap.empty[String, Schema]
  private def parse(json: String): Schema =
    schemaCache.getOrElseUpdate(json, new Schema.Parser().parse(json))

  /** Avro-binary-decode with distinct writer/reader schemas — Avro schema
    * resolution performs the projection (ref `projector.go:8-33`).
    * The resolved DatumReader is memoized per (writer, reader) pair:
    * constructing one recomputes schema resolution, which would
    * otherwise dominate per-row decode cost on a large backfill (same
    * cache pattern as [[parse]]). GenericDatumReader#read is not
    * thread-safe, so the cache holds a ThreadLocal per pair. */
  private val readerCache =
    TrieMap.empty[(Schema, Schema), ThreadLocal[GenericDatumReader[GenericRecord]]]
  def decodeBody(body: Array[Byte], writer: Schema, reader: Schema): GenericRecord = {
    val rdr = readerCache.getOrElseUpdate((writer, reader),
      ThreadLocal.withInitial(() =>
        new GenericDatumReader[GenericRecord](writer, reader))).get()
    rdr.read(null, DecoderFactory.get().binaryDecoder(body, null.asInstanceOf[BinaryDecoder]))
  }

  def encodeBody(rec: GenericRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](rec.getSchema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(5 + body.length)
    out.put(0.toByte).putInt(schemaId).put(body)
    out.array()
  }

  /** Split a Confluent-framed payload → (schemaId, body); validates the
    * magic byte like the reference (`coder/serde/decoder.go:67-70`). */
  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == 0.toByte,
      "not a confluent-framed avro payload (magic byte != 0)")
    val id = ByteBuffer.wrap(bytes, 1, 4).getInt
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  // ---- column functions (the coder surface) ------------------------

  /** binary (confluent-framed) → struct column, resolved against
    * `readerSchemaJson` (≙ SchemaRegistryDecoder ∘ GenericDecoder, and
    * GenericProjector when reader ≠ writer). */
  def decodeConfluent(c: Column, registry: SchemaRegistry, readerSchemaJson: String): Column = {
    val reader = parse(readerSchemaJson)
    val out = sparkType(reader).asInstanceOf[StructType]
    val f = new UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row = {
        if (bytes == null) return null
        val (id, body) = unframe(bytes)
        recordToRow(decodeBody(body, parse(registry.schemaById(id)), parse(readerSchemaJson)))
      }
    }
    udf(f, out).apply(c)
  }

  /** Permissive variant of [[decodeConfluent]]: malformed DATA (bad
    * magic, unknown schema id, truncated Avro body) decodes to NULL
    * instead of failing the job — the production posture for a
    * 100 TB backfill, where one corrupt record must not kill the run.
    * Route `isnull(decoded)` rows to a dead-letter sink; the strict
    * variant remains the right default for must-not-drop pipelines.
    *
    * The catches are phase-scoped, NOT a blanket `case _: Exception`:
    * a transient registry/transport failure (IOException from the HTTP
    * client, or a 5xx) PROPAGATES and fails the task — Spark retries it
    * — where a blanket catch would silently null entire partitions into
    * the DLQ as if the data were corrupt. Only errors the data itself
    * can cause are mapped to NULL. */
  def decodeConfluentSafe(c: Column, registry: SchemaRegistry,
                          readerSchemaJson: String): Column = {
    val reader = parse(readerSchemaJson)
    val out = sparkType(reader).asInstanceOf[StructType]
    val f = new UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row = {
        if (bytes == null) return null
        // phase 1 — framing: short/bad-magic payloads are data errors
        val framed =
          try Some(unframe(bytes))
          catch { case _: IllegalArgumentException => None }
        framed match {
          case None => null
          case Some((id, body)) =>
            // phase 2 — schema resolution: IllegalArgumentException is
            // the registry positively rejecting the id (unknown schema —
            // a data error); IOException (transport, 5xx) propagates.
            val writerJson =
              try Some(registry.schemaById(id))
              catch { case _: IllegalArgumentException => None }
            writerJson match {
              case None => null
              case Some(wj) =>
                // phase 3 — Avro body decode: truncated/garbage bodies
                try recordToRow(decodeBody(body, parse(wj), parse(readerSchemaJson)))
                catch {
                  case _: org.apache.avro.AvroRuntimeException => null
                  case _: java.io.EOFException => null
                  case _: ArrayIndexOutOfBoundsException => null
                  case _: IndexOutOfBoundsException => null
                }
            }
        }
      }
    }
    udf(f, out).apply(c)
  }

  /** struct → confluent-framed binary, registering the schema under
    * `subject` (≙ SchemaRegistryEncoder, `coder/serde/encoder.go:50-96`). */
  def encodeConfluent(c: Column, registry: SchemaRegistry, subject: String,
                      schemaJson: String): Column = {
    val id = registry.register(subject, schemaJson)
    val f = new UDF2[Row, Int, Array[Byte]] {
      override def call(row: Row, schemaId: Int): Array[Byte] = {
        if (row == null) return null
        frame(schemaId, encodeBody(rowToRecord(row, parse(schemaJson))))
      }
    }
    udf(f, BinaryType).apply(c, lit(id))
  }
}
