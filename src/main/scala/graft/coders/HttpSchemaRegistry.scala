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
    val code = resp.statusCode()
    val msg = s"schema registry ${req.uri()} returned HTTP $code: ${resp.body()}"
    // Only 404 (unknown schema id / subject — Confluent error 40403) is
    // a DATA-level rejection: the record referenced a schema the
    // registry positively does not have, so decodeConfluentSafe may
    // route the record to the DLQ (IllegalArgumentException). EVERY
    // other non-2xx — 5xx, but also 429 (throttled), 408 (timeout),
    // 401/403 (auth/config) — is operational: a throttled or
    // misconfigured registry must FAIL the task for retry, not silently
    // null every cache-miss record into the dead-letter sink.
    if (code == 404) throw new IllegalArgumentException(msg)
    if (code / 100 != 2) throw new java.io.IOException(msg)
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
