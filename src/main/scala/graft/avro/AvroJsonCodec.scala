package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Per-executor decode state: schema-id → parsed schema LRU, plus per-thread
  * cached `DatumReader`/`DatumWriter`s.
  *
  * Two-level cache design mirrors the reference —
  * `SynchronizedCache(LRUCache(capacity))` over the registry client
  * (`/root/reference/src/main/java/com/ing/eventbus/connect/schema/converters/AvroTransform.java:108-109`,
  * hit path `:259-261`, miss+fetch `:262-269`) — relocated from the single
  * Connect task thread to each executor JVM (SURVEY.md §4.3 #2). The reader/
  * writer cache is a pure-win improvement the reference lacks (it allocates a
  * fresh `DatumReader`/`DatumWriter`/`JsonEncoder` per record,
  * `AvroTransform.java:241-246`; SURVEY.md §4.1).
  *
  * Thread-safety: the schema LRU is a synchronized `LinkedHashMap` in access
  * order; Avro `DatumReader`s are not guaranteed thread-safe, so they are
  * cached per-thread (32 hot threads in local[32]; one per core on a real
  * executor).
  */
final class AvroDecoderState(provider: SchemaProvider, capacity: Int) {

  /** Parsed schema + its serialized JSON, both computed exactly once per
    * (executor, id): `Schema.toString` rebuilds the whole schema JSON, so
    * calling it per record (as the reference effectively does via
    * `schema.toString()` in the envelope) would dominate the envelope
    * cost. */
  final case class CachedSchema(schema: Schema, json: String)

  // Canonical LRU (capacity semantics parity with the reference's
  // SynchronizedCache(LRUCache), `AvroTransform.java:108`) + a lock-free
  // read mirror: the hot path does ONE ConcurrentHashMap get per record;
  // LRU access order is refreshed opportunistically (every 64th hit per
  // thread) — near-LRU eviction, exact-LRU is irrelevant when the working
  // set fits `schema.capacity`, and an always-locked access-ordered map
  // serializes all decode threads.
  private val schemas =
    new java.util.LinkedHashMap[Integer, CachedSchema](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Integer, CachedSchema]): Boolean = {
        val evict = size() > capacity
        if (evict) mirror.remove(e.getKey)
        evict
      }
    }
  private val mirror = new ConcurrentHashMap[Integer, CachedSchema]()
  private val touchCounter = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](1))

  /** Count of decode failures swallowed in PERMISSIVE mode — the metric the
    * reference never had (it only `printStackTrace`d, SURVEY.md §4.3 #3). */
  val swallowedErrors = new LongAdder

  /** Schema-cache hit/miss counters (BASELINE.md asks for the hit ratio
    * under multi-schema topics). */
  val cacheHits = new LongAdder
  val cacheMisses = new LongAdder

  // Cold-start single-flight (SURVEY.md §7.4): the first thread to miss an
  // id does the (slow, remote) fetch; concurrent missers of the SAME id
  // wait on its future instead of stampeding the registry. A failed fetch
  // completes exceptionally and is removed, so the next record retries —
  // a transient registry error never poisons the cache.
  private val inflight =
    new ConcurrentHashMap[Integer, java.util.concurrent.CompletableFuture[CachedSchema]]()

  def cachedSchema(id: Int): CachedSchema = {
    val key = Integer.valueOf(id)
    val fast = mirror.get(key)
    if (fast != null) {
      cacheHits.increment()
      val c = touchCounter.get()
      c(0) += 1
      if ((c(0) & 63) == 0) schemas.synchronized { schemas.get(key) } // LRU touch
      return fast
    }
    cacheMisses.increment()
    val fut = new java.util.concurrent.CompletableFuture[CachedSchema]()
    val prior = inflight.putIfAbsent(key, fut)
    if (prior != null) {
      try return prior.join()
      catch {
        case e: java.util.concurrent.CompletionException => throw e.getCause
      }
    }
    try {
      // we won the fetch race; re-check the mirror (a fetch may have
      // completed and been removed from `inflight` before our putIfAbsent)
      val again = mirror.get(key)
      if (again != null) { fut.complete(again); return again }
      // fetch outside the LRU lock: a slow registry call must not
      // serialize the decode of already-cached ids
      val json = provider.schemaJsonById(id).getOrElse {
        throw new SchemaLookupException(s"Schema id $id not found in registry")
      }
      val parsed = new Schema.Parser().parse(json)
      val entry = CachedSchema(parsed, parsed.toString)
      val winner = schemas.synchronized {
        val raced = schemas.get(key)
        if (raced != null) raced
        else {
          schemas.put(key, entry)
          mirror.put(key, entry)
          entry
        }
      }
      fut.complete(winner)
      winner
    } catch {
      case t: Throwable => fut.completeExceptionally(t); throw t
    } finally inflight.remove(key)
  }

  def schemaById(id: Int): Schema = cachedSchema(id).schema

  private final class ThreadState {
    val readers = new java.util.LinkedHashMap[Integer,
      GenericDatumReader[AnyRef]](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Integer,
        GenericDatumReader[AnyRef]]): Boolean = size() > capacity
    }
    val writers = new java.util.LinkedHashMap[Integer,
      GenericDatumWriter[AnyRef]](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Integer,
        GenericDatumWriter[AnyRef]]): Boolean = size() > capacity
    }
  }

  private val threadState =
    ThreadLocal.withInitial[ThreadState](() => new ThreadState)

  /** Decode an Avro-binary body (writer schema = reader schema, no
    * evolution — `AvroTransform.java:241-243`) and re-encode with Avro's
    * own `JsonEncoder` (non-pretty, `:244-251`). Avro's JSON rendering
    * (union wrapping, ISO-8859-1 bytes) is kept deliberately for parity
    * with the golden output (`TransformTest.java:508`). */
  def avroBinaryToJson(schemaId: Int, body: Array[Byte]): String =
    decodeToJson(cachedSchema(schemaId), schemaId, body)

  /** Fused decode with a pre-resolved schema entry — one cache lookup per
    * record for the whole decode+envelope path. */
  def decodeToJson(cached: CachedSchema, schemaId: Int,
      body: Array[Byte]): String = {
    val schema = cached.schema
    val ts = threadState.get()
    var reader = ts.readers.get(Integer.valueOf(schemaId))
    if (reader == null) {
      reader = new GenericDatumReader[AnyRef](schema)
      ts.readers.put(Integer.valueOf(schemaId), reader)
    }
    var writer = ts.writers.get(Integer.valueOf(schemaId))
    if (writer == null) {
      writer = new GenericDatumWriter[AnyRef](schema)
      ts.writers.put(Integer.valueOf(schemaId), writer)
    }
    val datum = reader.read(null,
      DecoderFactory.get().binaryDecoder(body, null))
    val out = new ByteArrayOutputStream(body.length * 2 + 16)
    val enc = EncoderFactory.get().jsonEncoder(schema, out, false)
    writer.write(datum, enc)
    enc.flush()
    out.toString(UTF_8)
  }
}

/** JVM-wide registry of decoder states, keyed by the provider's cache token:
  * every task on an executor shares one schema LRU per pipeline, exactly one
  * network fetch per new schema id per executor.
  *
  * BOUNDED (access-ordered LRU, [[AvroDecoderState.MaxStates]] entries): a
  * long-lived driver/executor JVM that keeps constructing pipelines must
  * not accumulate decoder states forever — an evicted state is simply
  * rebuilt (and its schema cache re-warmed) if that pipeline runs again.
  * The lookup is once per expression instance per executor (cached in a
  * `@transient lazy val`), so the synchronized map is OFF the per-row path.
  */
object AvroDecoderState {
  val MaxStates = 64
  private val states =
    new java.util.LinkedHashMap[String, AvroDecoderState](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, AvroDecoderState]): Boolean =
        size() > MaxStates
    }

  def forProvider(provider: SchemaProvider, capacity: Int): AvroDecoderState =
    states.synchronized {
      var s = states.get(provider.cacheToken)
      if (s == null) {
        s = new AvroDecoderState(provider, capacity)
        states.put(provider.cacheToken, s)
      }
      s
    }

  /** Test/metrics hooks. */
  def swallowedErrorCount(cacheToken: String): Long = states.synchronized {
    val s = states.get(cacheToken)
    if (s == null) 0L else s.swallowedErrors.sum()
  }

  def cacheStats(cacheToken: String): (Long, Long) = states.synchronized {
    val s = states.get(cacheToken)
    if (s == null) (0L, 0L) else (s.cacheHits.sum(), s.cacheMisses.sum())
  }
}

/** JSON envelope construction (SURVEY.md §2.1 #10/#11).
  *
  * Built by direct string assembly (single pass, no intermediate JSON tree)
  * with `org.json.JSONObject`-compatible escaping, so the value envelope is
  * byte-identical to the reference's golden output
  * (`TransformTest.java:508`): key order
  * `originSchema, originMessage, originSchemaId`.
  */
object AvroEnvelope {

  /** JSON string escape compatible with `org.json.JSONObject.quote` for the
    * characters that can appear here: quote, backslash, control chars, and
    * the `- ` / ` -℀` ranges org.json also escapes. */
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '/' if i > 0 && s.charAt(i - 1) == '<' => sb.append("\\/")
        case _ if c < ' ' || (c >= 0x80 && c < 0xa0) ||
            (c >= 0x2000 && c < 0x2100) =>
          sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Value-side envelope (`rewriteToSingleJson(int, byte[], Schema)`,
    * `AvroTransform.java:230-237`): the decoded message is a JSON-escaped
    * STRING, not a nested object (golden proof `TransformTest.java:508`). */
  def valueEnvelope(schemaId: Int, decodedJson: String,
      schemaJson: String): Array[Byte] = {
    val sb = new java.lang.StringBuilder(
      decodedJson.length + schemaJson.length + 64)
    sb.append("{\"originSchema\":\"").append(escape(schemaJson))
      .append("\",\"originMessage\":\"").append(escape(decodedJson))
      .append("\",\"originSchemaId\":").append(schemaId).append('}')
    sb.toString.getBytes(UTF_8)
  }

  /** Key-side envelope (`rewriteToSingleJson(byte[], Schema)`,
    * `AvroTransform.java:224-229`): the decoded record's own fields are
    * INLINED and `originSchema` is injected as a sibling — the documented
    * key/value asymmetry (SURVEY.md §7.4). Splices the schema in without
    * re-parsing the decoded JSON. */
  def keyEnvelope(decodedJson: String, schemaJson: String): Array[Byte] = {
    val t = decodedJson.trim
    val out =
      if (t.startsWith("{") && t.endsWith("}")) {
        val inner = t.substring(1, t.length - 1).trim
        val sep = if (inner.isEmpty) "" else ","
        s"{$inner$sep\"originSchema\":\"${escape(schemaJson)}\"}"
      } else {
        // Non-record key (Avro primitive): fall back to a wrapping object.
        s"""{"originKey":$t,"originSchema":"${escape(schemaJson)}"}"""
      }
    out.getBytes(UTF_8)
  }
}
