package graft.avro

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** Raised when a schema id cannot be resolved — the Spark analogue of the
  * reference's registry-lookup failure
  * (`/root/reference/src/main/java/com/ing/eventbus/connect/schema/converters/AvroTransform.java:270-273`,
  * tested `TransformTest.java:201-221`). */
final class SchemaLookupException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Resolves a Confluent-style schema id to the writer schema's JSON text.
  *
  * This is the seam that replaces the reference's
  * `CachedSchemaRegistryClient` (`AvroTransform.java:109`, `:267`): the
  * production implementation is an HTTP registry client, tests use
  * [[InMemorySchemaProvider]] (replacing the reference's 324-LoC WireMock
  * harness — SURVEY.md §5). Implementations must be [[Serializable]]: the
  * provider is captured by the decode expression's closure and shipped to
  * executors; per-executor caching happens in [[AvroDecoderState]], NOT here
  * (a broadcast would be wrong — the registry is mutable over time,
  * SURVEY.md §1.4).
  */
trait SchemaProvider extends Serializable {

  /** Writer-schema JSON for `id`, or None if the id is unknown. */
  def schemaJsonById(id: Int): Option[String]

  /** Stable identity for the per-JVM decoder-state cache. Two provider
    * instances with the same token share executor-side caches. */
  def cacheToken: String
}

/** Immutable in-memory id → schema-JSON map. Serializable, tiny (schemas are
  * a handful of strings), so it rides along in the task closure.
  *
  * The default cache token is a CONTENT hash of the schema map — two
  * provider instances carrying identical schemas share one executor-side
  * decoder state, so re-constructing a pipeline (each `registry()` call
  * used to mint a random UUID) no longer grows the JVM-wide state registry.
  * Pass `tokenOverride` to force cache isolation (tests). */
final case class InMemorySchemaProvider(
    byId: Map[Int, String],
    tokenOverride: Option[String] = None
) extends SchemaProvider {
  override val cacheToken: String =
    tokenOverride.getOrElse(InMemorySchemaProvider.contentToken(byId))
  override def schemaJsonById(id: Int): Option[String] = byId.get(id)
}

object InMemorySchemaProvider {
  def contentToken(byId: Map[Int, String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    byId.toSeq.sortBy(_._1).foreach { case (id, json) =>
      md.update(java.nio.ByteBuffer.allocate(4).putInt(id).array())
      md.update(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    "inmem-" + md.digest().map(b => f"$b%02x").mkString
  }
}

/** Confluent Schema Registry client over plain HTTP — production parity with
  * the reference's `getById` call (`AvroTransform.java:267`). Built lazily on
  * first use on each executor (`@transient lazy`), matching the reference's
  * lazy first-HTTP-on-first-miss behavior (SURVEY.md §4.1). Multiple base
  * URLs are tried in order.
  *
  * NOTE: exercised only through its parsing seam in this offline
  * environment (zero egress); the HTTP path follows the public registry
  * REST contract `GET /schemas/ids/{id}` → `{"schema": "<json>"}`.
  */
final case class HttpSchemaRegistryProvider(
    baseUrls: Seq[String],
    override val cacheToken: String,
    userInfo: Option[String] = None,
    extraHeaders: Map[String, String] = Map.empty
) extends SchemaProvider {

  /** Pre-encoded basic-auth header value; `userInfo` is `user:password`
    * (the reference's `basic.auth.credentials.source=USER_INFO` +
    * `basic.auth.user.info` pair, passed as `sourceProps` into
    * `CachedSchemaRegistryClient` — `AvroTransform.java:98,109`; mock
    * credentials `Constants.java:5-15`). */
  @transient private lazy val authHeader: Option[String] =
    userInfo.map(ui => "Basic " + java.util.Base64.getEncoder.encodeToString(
      ui.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  override def schemaJsonById(id: Int): Option[String] = {
    var last: Throwable = null
    var result: Option[Option[String]] = None // Some(outcome) = decided
    val it = baseUrls.iterator
    while (result.isEmpty && it.hasNext) {
      val base = it.next()
      // NOTE: catch NonFatal only — a broad `catch Throwable` around code
      // with an early `return` swallows Scala's NonLocalReturnControl and
      // turns success into failure (hence the return-free structure here).
      try {
        val url = new java.net.URI(
          s"${base.stripSuffix("/")}/schemas/ids/$id").toURL
        val conn =
          url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        conn.setRequestProperty("Accept",
          "application/vnd.schemaregistry.v1+json")
        authHeader.foreach(conn.setRequestProperty("Authorization", _))
        extraHeaders.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.getResponseCode match {
          case 200 =>
            val body = new String(conn.getInputStream.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            result =
              Some(Some(HttpSchemaRegistryProvider.extractSchemaField(body)))
          case 404 => result = Some(None)
          case code => last = new RuntimeException(s"registry HTTP $code")
        }
      } catch { case scala.util.control.NonFatal(t) => last = t }
    }
    result.getOrElse(throw new SchemaLookupException(
      s"Failed to fetch schema id $id from ${baseUrls.mkString(",")}", last))
  }
}

object HttpSchemaRegistryProvider {

  /** Production wiring: build the registry client straight from an
    * [[graft.config.EngineConfig]] (URLs + basic-auth user info — the
    * reference's `sourceUrls`/`sourceProps` → `CachedSchemaRegistryClient`
    * constructor, `AvroTransform.java:109`). The cache token is a content
    * hash of the connection identity, so identical configs share one
    * executor-side decoder state and differing credentials/URLs never
    * alias each other's caches. */
  def fromConfig(cfg: graft.config.EngineConfig): HttpSchemaRegistryProvider = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (cfg.registryUrls ++ cfg.registryUserInfo.toSeq).foreach { s =>
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    HttpSchemaRegistryProvider(cfg.registryUrls,
      cacheToken = "http-" + md.digest().map(b => f"$b%02x").mkString,
      userInfo = cfg.registryUserInfo)
  }

  /** Pull the `schema` field out of a registry response. Uses Jackson (on
    * the Spark classpath) — the response's `schema` value is itself a
    * JSON-escaped string of the Avro schema. */
  def extractSchemaField(responseBody: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(responseBody)
    val s = node.get("schema")
    if (s == null)
      throw new SchemaLookupException(
        s"Registry response missing 'schema' field: $responseBody")
    s.asText()
  }
}

/** Driver-side test/fixture registry with the semantics of the reference's
  * mock (`SchemaRegistryMock.java:159-177`): `register` hands out
  * monotonically increasing ids starting at 1; subjects follow
  * TopicNameStrategy (`<topic>-key` / `<topic>-value`). Re-registering an
  * identical schema under the same subject returns the existing id. */
final class SchemaRegistryStub {
  private val nextId = new AtomicInteger(1)
  private val byId = TrieMap.empty[Int, String]
  private val bySubject = TrieMap.empty[(String, String), Int]

  def registerValueSchema(topic: String, schemaJson: String): Int =
    register(s"$topic-value", schemaJson)

  def registerKeySchema(topic: String, schemaJson: String): Int =
    register(s"$topic-key", schemaJson)

  def register(subject: String, schemaJson: String): Int =
    bySubject.getOrElseUpdate((subject, schemaJson), {
      val id = nextId.getAndIncrement()
      byId.put(id, schemaJson)
      id
    })

  /** Snapshot as an immutable, serializable provider for the plan. */
  def toProvider: InMemorySchemaProvider = InMemorySchemaProvider(byId.toMap)
}
