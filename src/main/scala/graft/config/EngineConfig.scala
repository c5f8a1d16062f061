package graft.config

/** Thrown for invalid engine configuration.
  *
  * Mirrors the validation surface of the reference SMT
  * (`/root/reference/src/main/java/com/ing/eventbus/connect/schema/converters/AvroTransform.java:286-314`),
  * which raises `ConnectException` on malformed `avro.topics` entries and on
  * an empty topic list.
  */
final class EngineConfigException(msg: String) extends RuntimeException(msg)

/** How the decode pipeline reacts to Avro decode failures.
  *
  * The reference swallows `IOException` from the Avro decode and forwards the
  * original (undecoded) bytes (`AvroTransform.java:149-152`, `:188-191`) —
  * that is [[ErrorMode.Permissive]]. [[ErrorMode.FailFast]] is an explicit,
  * documented deviation (SURVEY.md §7.4): fail the job on the first
  * undecodable record. Wire-format violations (payload ≤ 5 bytes, bad magic
  * byte) throw in BOTH modes, matching the reference
  * (`AvroTransform.java:139-142`, `:173-177`, `:276`).
  */
sealed trait ErrorMode extends Serializable
object ErrorMode {
  case object Permissive extends ErrorMode
  case object FailFast extends ErrorMode
}

/** Driver-side, eagerly-validated engine configuration; captured by the plan.
  *
  * Config surface parity with the reference `CONFIG_DEF`
  * (`AvroTransform.java:62-73`, `:316-322`):
  *   - `src.schema.registry.url` (LIST, required)      → [[registryUrls]]
  *   - `avro.topics` (LIST of `topic:bool`, required)  → [[avroTopics]]
  *   - `schema.capacity` (INT, default 100)            → [[schemaCapacity]]
  *   - `include.headers` (BOOLEAN, default true)       → [[includeHeaders]]
  *
  * `dest.schema.registry.url` is intentionally NOT a config key: the
  * reference declares the name but never registers or reads it — dead config
  * (SURVEY.md §2.1 #16).
  *
  * @param avroTopics topic → whether the record KEY is also Avro-decoded
  *                   (`processKeys`, `AvroTransform.java:216-218`). Presence
  *                   of a topic in the map enables value decoding for it
  *                   (`topicEnabled`, `AvroTransform.java:220-222`).
  * @param stripKeyWireHeader the reference key path forgets to strip the
  *                   5-byte wire header before Avro-decoding the key
  *                   (`AvroTransform.java:148` vs the value path `:185`) — a
  *                   documented reference bug (SURVEY.md §7.4). `true`
  *                   (default) = corrected semantics; `false` = bug-compat.
  */
final case class EngineConfig(
    registryUrls: Seq[String],
    avroTopics: Map[String, Boolean],
    schemaCapacity: Int = EngineConfig.DefaultSchemaCapacity,
    includeHeaders: Boolean = true,
    errorMode: ErrorMode = ErrorMode.Permissive,
    stripKeyWireHeader: Boolean = true,
    registryUserInfo: Option[String] = None
) {
  require(schemaCapacity > 0, "schema.capacity must be positive")

  /** `topicEnabled` (`AvroTransform.java:220-222`). */
  def topicEnabled(topic: String): Boolean = avroTopics.contains(topic)

  /** `processKeys` (`AvroTransform.java:216-218`). */
  def processKeys(topic: String): Boolean = avroTopics.getOrElse(topic, false)

  def enabledTopics: Seq[String] = avroTopics.keys.toSeq.sorted
  def keyTopics: Seq[String] = avroTopics.filter(_._2).keys.toSeq.sorted
}

object EngineConfig {
  val SrcSchemaRegistryUrlKey = "src.schema.registry.url"
  val SchemaCapacityKey = "schema.capacity"
  val IncludeHeadersKey = "include.headers"
  val AvroTopicsKey = "avro.topics"
  val ErrorModeKey = "error.mode" // extension (SURVEY.md §4.3 #3)
  // Registry basic auth, Confluent client convention (the reference wires
  // `sourceProps` into `CachedSchemaRegistryClient` — `AvroTransform
  // .java:98,109` — and its mock tests USER_INFO credentials,
  // `Constants.java:5-15`, `SchemaRegistryMock.java:82-85`).
  val SrcBasicAuthSourceKey = "src.basic.auth.credentials.source"
  val SrcUserInfoKey = "src.basic.auth.user.info"
  val DefaultSchemaCapacity = 100 // `AvroTransform.java:49`

  /** Parse a raw properties map (the Connect-style config surface).
    * Eager validation on the driver — the Spark analogue of
    * `configure(Map)` (`AvroTransform.java:91-116`). */
  def fromProps(props: Map[String, String]): EngineConfig = {
    val urls = props.get(SrcSchemaRegistryUrlKey) match {
      case Some(s) if s.trim.nonEmpty => s.split(",").map(_.trim).toSeq
      case _ =>
        throw new EngineConfigException(
          s"Missing required config '$SrcSchemaRegistryUrlKey'")
    }
    val topics = props.get(AvroTopicsKey) match {
      case Some(s) => parseAvroTopics(s.split(",").map(_.trim).toSeq)
      case None =>
        throw new EngineConfigException(
          s"Missing required config '$AvroTopicsKey'")
    }
    val capacity = props.get(SchemaCapacityKey).map { s =>
      try s.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new EngineConfigException(
            s"'$SchemaCapacityKey' must be an int, got '$s'")
      }
    }.getOrElse(DefaultSchemaCapacity)
    val includeHeaders =
      props.get(IncludeHeadersKey).forall(_.trim.equalsIgnoreCase("true"))
    val errorMode = props.get(ErrorModeKey).map(_.trim.toUpperCase) match {
      case Some("FAILFAST") => ErrorMode.FailFast
      case Some("PERMISSIVE") | None => ErrorMode.Permissive
      case Some(other) =>
        throw new EngineConfigException(
          s"'$ErrorModeKey' must be PERMISSIVE or FAILFAST, got '$other'")
    }
    val userInfo = props.get(SrcBasicAuthSourceKey).map(_.trim) match {
      case Some(s) if s.equalsIgnoreCase("USER_INFO") =>
        props.get(SrcUserInfoKey).map(_.trim).filter(_.nonEmpty) match {
          case Some(ui) if ui.contains(":") => Some(ui)
          case _ => throw new EngineConfigException(
            s"'$SrcBasicAuthSourceKey=USER_INFO' requires " +
              s"'$SrcUserInfoKey' in 'user:password' form")
        }
      case Some(s) if s.isEmpty || s.equalsIgnoreCase("URL") => None
      case None => None
      case Some(other) => throw new EngineConfigException(
        s"'$SrcBasicAuthSourceKey' must be USER_INFO or URL, got '$other'")
    }
    EngineConfig(urls, topics, capacity, includeHeaders, errorMode,
      registryUserInfo = userInfo)
  }

  /** Parse `topic:bool` entries with the reference's validation semantics
    * (`validateAndParseAvroTopics`, `AvroTransform.java:286-314`): empty list
    * and malformed entries (no `:`, empty topic, non-boolean flag) all fail
    * eagerly with a config exception. */
  def parseAvroTopics(entries: Seq[String]): Map[String, Boolean] = {
    val cleaned = entries.filter(_.nonEmpty)
    if (cleaned.isEmpty)
      throw new EngineConfigException(
        "avro.topics must contain at least one 'topic:bool' entry")
    cleaned.map { e =>
      e.split(":", -1) match {
        case Array(topic, flag)
            if topic.nonEmpty &&
              (flag.equalsIgnoreCase("true") || flag.equalsIgnoreCase("false")) =>
          topic -> flag.equalsIgnoreCase("true")
        case _ =>
          throw new EngineConfigException(
            s"Malformed avro.topics entry '$e': expected '<topic>:<true|false>'")
      }
    }.toMap
  }
}
