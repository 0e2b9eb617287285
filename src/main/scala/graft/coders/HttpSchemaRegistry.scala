package graft.coders

import com.fasterxml.jackson.databind.ObjectMapper

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import scala.collection.concurrent.TrieMap

/** HTTP-backed Confluent Schema Registry client — the production
  * implementation of [[AvroSerde.SchemaRegistry]] (ref: the reference
  * talks to a live registry in `coder/serde/decoder.go:44-63` /
  * `encoder.go:62-77`; this image is zero-egress so tests exercise it
  * against a loopback server, but the REST surface is the public
  * Confluent API):
  *
  *   - `POST /subjects/{subject}/versions` body `{"schema": json}` →
  *     `{"id": N}` (register, encoder path)
  *   - `GET /schemas/ids/{id}` → `{"schema": json}` (resolve, decoder
  *     path)
  *
  * Scale/executor behavior: the class is Serializable with a transient
  * lazy HttpClient, so it ships in UDF closures and each executor
  * builds its own connection. Both directions memoize in TrieMaps —
  * the registry is hit once per (executor, schema), never per row,
  * matching the decode-path caching the reference gets from the
  * Confluent client's own cache. */
final class HttpSchemaRegistry(baseUrl: String,
                               timeout: Duration = Duration.ofSeconds(10))
  extends AvroSerde.SchemaRegistry {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  private val idCache = TrieMap.empty[String, Int]       // subject:schema → id
  private val schemaCache = TrieMap.empty[Int, String]   // id → schema json

  private def send(req: HttpRequest): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val msg = s"schema registry ${req.uri()} returned HTTP ${resp.statusCode()}: ${resp.body()}"
    // 5xx is a registry-side (transient) failure and surfaces as
    // IOException like a transport error — callers retry the task. 4xx
    // means the registry positively rejected the request (e.g. unknown
    // schema id) — IllegalArgumentException, a data-level error that
    // decodeConfluentSafe routes to the DLQ instead of failing the job.
    if (resp.statusCode() / 100 == 5) throw new java.io.IOException(msg)
    require(resp.statusCode() / 100 == 2, msg)
    resp.body()
  }

  override def register(subject: String, schemaJson: String): Int =
    idCache.getOrElseUpdate(s"$subject:$schemaJson", {
      val payload = mapper.createObjectNode()
      payload.put("schema", schemaJson)
      val body = send(HttpRequest.newBuilder()
        .uri(URI.create(s"$baseUrl/subjects/$subject/versions"))
        .timeout(timeout)
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(payload), StandardCharsets.UTF_8))
        .build())
      val id = mapper.readTree(body).get("id").asInt()
      schemaCache.putIfAbsent(id, schemaJson)
      id
    })

  override def schemaById(id: Int): String =
    schemaCache.getOrElseUpdate(id, {
      val body = send(HttpRequest.newBuilder()
        .uri(URI.create(s"$baseUrl/schemas/ids/$id"))
        .timeout(timeout)
        .GET()
        .build())
      mapper.readTree(body).get("schema").asText()
    })
}
