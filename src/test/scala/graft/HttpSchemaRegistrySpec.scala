package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.coders.{AvroSerde, HttpSchemaRegistry}
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** The HTTP registry client against a loopback server speaking the
  * public Confluent REST surface (zero-egress image: 127.0.0.1 only).
  * Verifies the register/resolve round-trip, the full Avro serde path
  * through it, and the once-per-schema caching contract.
  */
class HttpSchemaRegistrySpec extends SparkSpec {

  private val docSchema =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"id","type":"long"},{"name":"text","type":"string"}]}""".stripMargin

  /** Minimal registry server: POST /subjects/{s}/versions, GET
    * /schemas/ids/{id}; counts hits per endpoint for cache assertions. */
  private def withServer(f: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val registerHits = new AtomicInteger
    val resolveHits = new AtomicInteger
    val store = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val nextId = new AtomicInteger(100) // offset: proves ids come from the SERVER
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b); x.close()
    }
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val path = x.getRequestURI.getPath
        if (x.getRequestMethod == "POST" && path.matches("/subjects/[^/]+/versions")) {
          registerHits.incrementAndGet()
          val schema = mapper.readTree(x.getRequestBody).get("schema").asText()
          val id = nextId.getAndIncrement()
          store.put(id, schema)
          respond(x, 200, s"""{"id":$id}""")
        } else if (x.getRequestMethod == "GET" && path.matches("/schemas/ids/\\d+")) {
          resolveHits.incrementAndGet()
          val id = path.split("/").last.toInt
          Option(store.get(id)) match {
            case Some(s) => respond(x, 200, mapper.writeValueAsString {
              val n = mapper.createObjectNode(); n.put("schema", s); n
            })
            case None => respond(x, 404, """{"error_code":40403}""")
          }
        } else respond(x, 404, "{}")
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", registerHits, resolveHits)
    finally server.stop(0)
  }

  test("register + resolve round-trip through the REST surface") {
    withServer { (url, _, _) =>
      val reg = new HttpSchemaRegistry(url)
      val id = reg.register("docs-value", docSchema)
      assert(id == 100) // server-assigned
      assert(reg.schemaById(id).contains("\"Doc\""))
    }
  }

  test("full Confluent-framed Avro serde through the HTTP registry") {
    withServer { (url, _, _) =>
      val reg = new HttpSchemaRegistry(url)
      val out = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
        .limit(20)
        .select(AvroSerde.encodeConfluent(
          struct(col("doc_id").as("id"), col("text")), reg, "docs", docSchema).as("b"))
        .select(AvroSerde.decodeConfluent(col("b"), reg, docSchema).as("v"))
        .select(col("v.id"), col("v.text"))
        .orderBy("id").collect()
      assert(out.length == 20)
      assert(out.forall(r => r.getString(1) != null))
      // the wire frame carries the server-assigned id
      val framed = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
        .limit(1)
        .select(AvroSerde.encodeConfluent(
          struct(col("doc_id").as("id"), col("text")), reg, "docs", docSchema).as("b"))
        .head().getAs[Array[Byte]](0)
      assert(AvroSerde.unframe(framed)._1 == 100)
    }
  }

  test("registry is hit once per schema, not once per row (cache contract)") {
    withServer { (url, registerHits, resolveHits) =>
      val reg = new HttpSchemaRegistry(url)
      (1 to 5).foreach(_ => reg.register("s", docSchema))
      assert(registerHits.get() == 1)
      val id = reg.register("s", docSchema)
      (1 to 5).foreach(_ => reg.schemaById(id))
      // register already primed the id→schema cache: zero resolve calls
      assert(resolveHits.get() == 0)
      // a foreign id (unknown locally) resolves over HTTP exactly once
      val other = new HttpSchemaRegistry(url)
      (1 to 5).foreach(_ => other.schemaById(id))
      assert(resolveHits.get() == 1)
    }
  }

  test("sr1→sr2 pipe: decode via registry A with projected reader (defaults filled), re-encode via registry B (ref kafka-sr1-avro-sr2-kafka)") {
    val writerSchema =
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},{"name":"text","type":"string"}]}""".stripMargin
    // target schema adds a defaulted field — Avro schema resolution
    // must fill it during the cross-registry copy
    val targetSchema =
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},{"name":"text","type":"string"},
        |{"name":"seqNo","type":"long","default":0}]}""".stripMargin
    withServer { (urlA, _, _) =>
      withServer { (urlB, _, _) =>
        val regA = new HttpSchemaRegistry(urlA)
        val regB = new HttpSchemaRegistry(urlB)
        val out = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
          .limit(10)
          .select(AvroSerde.encodeConfluent(
            struct(col("doc_id").as("id"), col("text")), regA, "docs", writerSchema).as("a"))
          // the pipe: decode against A with the TARGET reader, re-encode to B
          .select(AvroSerde.encodeConfluent(
            AvroSerde.decodeConfluent(col("a"), regA, targetSchema),
            regB, "docs-copy", targetSchema).as("b"))
          // consumer side of B
          .select(AvroSerde.decodeConfluent(col("b"), regB, targetSchema).as("v"))
          .select(col("v.id"), col("v.text"), col("v.seqNo"))
          .orderBy("id").collect()
        assert(out.length == 10)
        assert(out.forall(_.getLong(2) == 0L)) // default filled in the copy
        assert(out.forall(r => r.getString(1) != null))
      }
    }
  }

  test("non-2xx responses surface as errors with the endpoint in the message") {
    withServer { (url, _, _) =>
      val reg = new HttpSchemaRegistry(url)
      val e = intercept[IllegalArgumentException](reg.schemaById(999))
      assert(e.getMessage.contains("999") && e.getMessage.contains("404"))
    }
  }

  test("only 404 is a data error; 429/401 are operational and retryable (IOException)") {
    // a throttled or misconfigured registry must fail the task for
    // retry — mapping it to the DLQ path would silently null every
    // cache-miss record (the exact loss mode safe-decode exists to stop)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val code = new AtomicInteger(429)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val b = "{}".getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(code.get(), b.length)
        x.getResponseBody.write(b); x.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      for (c <- Seq(429, 408, 401, 403, 500)) {
        code.set(c)
        val e = intercept[java.io.IOException](new HttpSchemaRegistry(url).schemaById(7))
        assert(e.getMessage.contains(c.toString))
      }
      code.set(404)
      intercept[IllegalArgumentException](new HttpSchemaRegistry(url).schemaById(7))
    } finally server.stop(0)
  }
}
