package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.enrich._
import graft.model.AiConfig

/** Drives `HttpChatEnricher` against a local in-JVM stub server — the
  * request/parse/error contract of the reference's `call_ai_api`
  * (`/root/reference/main.py:533-604`) without any live network. */
class HttpEnricherSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** One stub endpoint: records request headers/bodies, plays a scripted
    * list of (status, body) responses, repeating the last entry. */
  private final class Stub(script: Seq[(Int, String)]) {
    val calls = new AtomicInteger(0)
    @volatile var lastHeaders: Map[String, String] = Map.empty
    @volatile var bodies: Vector[String] = Vector.empty
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val n = calls.getAndIncrement()
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      synchronized {
        bodies :+= body
        lastHeaders = {
          val h = x.getRequestHeaders
          import scala.jdk.CollectionConverters._
          h.keySet().asScala.map(k => k.toLowerCase -> h.getFirst(k)).toMap +
            ("x-path" -> x.getRequestURI.getPath)
        }
      }
      val (status, resp) = script(math.min(n, script.size - 1))
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", "application/json")
      x.sendResponseHeaders(status, bytes.length)
      x.getResponseBody.write(bytes); x.close()
    })
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
    def stop(): Unit = server.stop(0)
  }

  private def withStub[T](script: (Int, String)*)(f: Stub => T): T = {
    val stub = new Stub(script.toVector)
    try f(stub) finally stub.stop()
  }

  private def openAiOk(text: String): String =
    s"""{"choices":[{"index":0,"message":{"role":"assistant","content":${mapper.writeValueAsString(text)}}}]}"""
  private def anthropicOk(text: String): String =
    s"""{"content":[{"type":"text","text":${mapper.writeValueAsString(text)}}]}"""

  private val openAiCfg =
    AiConfig(service = "openai", model = "gpt-4o-mini", apiKey = "sk-test-123",
      temperature = 0.25, maxTokens = 77)
  private val anthropicCfg =
    AiConfig(service = "anthropic", model = "claude-3-haiku-20240307",
      apiKey = "sk-ant-test", temperature = 0.5, maxTokens = 64)

  test("openai path: endpoint, bearer auth, body shape, answer parse (main.py:538-545)") {
    withStub(200 -> openAiOk("the answer")) { stub =>
      val e = new HttpChatEnricher(stub.base)
      e.open()
      val out = e.enrich(
        Seq(Message("system", "be brief"), Message("user", "hi \"there\"")), openAiCfg)
      assert(out == "the answer")
      assert(stub.lastHeaders("x-path") == "/v1/chat/completions")
      assert(stub.lastHeaders("authorization") == "Bearer sk-test-123")
      assert(stub.lastHeaders("content-type") == "application/json")
      val sent = mapper.readTree(stub.bodies.head)
      assert(sent.path("model").asText == "gpt-4o-mini")
      assert(sent.path("temperature").asDouble == 0.25)
      assert(sent.path("max_tokens").asInt == 77)
      // full history verbatim, system included (OpenAI keeps it in-line)
      assert(sent.path("messages").size == 2)
      assert(sent.path("messages").path(0).path("role").asText == "system")
      assert(sent.path("messages").path(1).path("content").asText == "hi \"there\"")
      e.close()
    }
  }

  test("anthropic path: /messages, x-api-key, system lifted out (main.py:546-568)") {
    withStub(200 -> anthropicOk("claude says")) { stub =>
      val e = new HttpChatEnricher(stub.base)
      val out = e.enrich(
        Seq(Message("system", "be brief"), Message("user", "q1"),
            Message("assistant", "a1"), Message("user", "q2")), anthropicCfg)
      assert(out == "claude says")
      assert(stub.lastHeaders("x-path") == "/v1/messages")
      assert(stub.lastHeaders("x-api-key") == "sk-ant-test")
      assert(stub.lastHeaders("anthropic-version") == "2023-06-01")
      val sent = mapper.readTree(stub.bodies.head)
      assert(sent.path("system").asText == "be brief")
      // system removed from the turn list; conversation order preserved
      assert(sent.path("messages").size == 3)
      assert(sent.path("messages").path(0).path("content").asText == "q1")
      assert(sent.path("messages").path(2).path("content").asText == "q2")
    }
  }

  test("429 classifies RateLimited, backs off 2*2^r, then succeeds (main.py:571-581)") {
    withStub(429 -> """{"error":"too many requests"}""",
             429 -> """{"error":"too many requests"}""",
             200 -> openAiOk("finally")) { stub =>
      val e = new HttpChatEnricher(stub.base)
      var slept = Vector.empty[Long]
      val out = RetryPolicy.withRetries(5, ms => slept :+= ms)(
        () => e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(out.toOption.contains("finally"))
      assert(stub.calls.get == 3)
      assert(slept == Vector(2000L, 4000L)) // rate-limit schedule, not the 1s transient one
    }
  }

  test("401 maps to the canonical invalid-key message and fails fast (main.py:583-584)") {
    withStub(401 -> """{"error":{"message":"bad key"}}""") { stub =>
      val e = new HttpChatEnricher(stub.base)
      val r = RetryPolicy.withRetries(5, _ => fail("fatal errors must not back off"))(
        () => e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(r.isFailure)
      val ex = r.failed.get.asInstanceOf[EnrichHttpException]
      assert(ex.status == 401)
      assert(ex.getMessage == "Invalid API key. Please check your credentials.")
      assert(RetryPolicy.classify(ex) == RetryPolicy.Fatal)
      assert(stub.calls.get == 1) // exactly one attempt
    }
  }

  test("quota/billing body maps to the service-specific fatal message (main.py:586-590)") {
    withStub(400 -> """{"error":{"message":"insufficient credits remaining"}}""") { stub =>
      val e = new HttpChatEnricher(stub.base)
      val oai = intercept[EnrichHttpException](e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(oai.getMessage.contains("quota") && RetryPolicy.classify(oai) == RetryPolicy.Fatal)
      val ant = intercept[EnrichHttpException](e.enrich(Seq(Message("user", "x")), anthropicCfg))
      assert(ant.getMessage.contains("credits exhausted") &&
        RetryPolicy.classify(ant) == RetryPolicy.Fatal)
    }
  }

  test("unknown-model body is fatal with the model named (main.py:592-596)") {
    withStub(404 -> """{"error":{"message":"the model gpt-9 was not found"}}""") { stub =>
      val e = new HttpChatEnricher(stub.base)
      val ex = intercept[EnrichHttpException](e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(ex.getMessage.contains("Model not found: 'gpt-4o-mini'"))
      assert(RetryPolicy.classify(ex) == RetryPolicy.Fatal)
    }
  }

  test("5xx is transient: retried with the 1*2^r schedule, then surfaced (main.py:598-604)") {
    withStub(500 -> """{"error":"internal"}""") { stub =>
      val e = new HttpChatEnricher(stub.base)
      var slept = Vector.empty[Long]
      val r = RetryPolicy.withRetries(3, ms => slept :+= ms)(
        () => e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(r.isFailure && stub.calls.get == 3)
      assert(slept == Vector(1000L, 2000L))
      assert(r.failed.get.getMessage.startsWith("API error (HTTP 500)"))
    }
  }

  test("5xx body containing fatal-taxonomy words is STILL retried (status wins)") {
    // a transient server hiccup whose body echoes "does not exist" must
    // not be classified Fatal off the 200-byte snippet in the message —
    // the status code is the authoritative signal for HTTP responses
    withStub(500 -> """{"error":"session does not exist in cache, please retry"}""",
             200 -> openAiOk("recovered")) { stub =>
      val e = new HttpChatEnricher(stub.base)
      var slept = Vector.empty[Long]
      val out = RetryPolicy.withRetries(3, ms => slept :+= ms)(
        () => e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(out.toOption.contains("recovered"))
      assert(stub.calls.get == 2)
      assert(slept == Vector(1000L)) // transient schedule, not rate-limit, not fatal
    }
  }

  test("connection refused is transient (no taxonomy keyword)") {
    // port from a server we already closed — nothing listens there
    val deadBase = withStub(200 -> openAiOk("x")) { _.base }
    val e = new HttpChatEnricher(deadBase, requestTimeoutMs = 2000)
    val ex = intercept[RuntimeException](e.enrich(Seq(Message("user", "x")), openAiCfg))
    assert(RetryPolicy.classify(ex) == RetryPolicy.Transient)
  }

  test("malformed 200 body raises a parse error, not a silent null") {
    withStub(200 -> """{"unexpected":true}""") { stub =>
      val e = new HttpChatEnricher(stub.base)
      val ex = intercept[RuntimeException](e.enrich(Seq(Message("user", "x")), openAiCfg))
      assert(ex.getMessage.contains("malformed openai response"))
    }
  }
}

/** End-to-end: the HTTP client shipped through Spark tasks by the
  * existing runner — serialization, per-partition open/close, and the
  * quarantine split all exercised over real HTTP to the local stub. */
class HttpEnricherRunnerSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("EnrichRunner.mapWithResponse drives HttpChatEnricher across partitions (E2 end-to-end)") {
    val mapper = new ObjectMapper()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // echo endpoint: answer = "echo:" + last user message, uppercased —
    // deterministic so the assertion is exact per row
    server.createContext("/", (x: HttpExchange) => {
      val req = mapper.readTree(x.getRequestBody.readAllBytes())
      val msgs = req.path("messages")
      val last = msgs.path(msgs.size - 1).path("content").asText
      val resp = s"""{"choices":[{"message":{"content":${
        mapper.writeValueAsString("echo:" + last.toUpperCase(java.util.Locale.ROOT))}}}]}"""
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes); x.close()
    })
    server.start()
    try {
      import spark.implicits._
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
      val df = (1 to 20).map(i => (i.toLong, s"prompt $i")).toDF("id", "prompt")
        .repartition(4)
      val out = EnrichRunner.mapWithResponse(
        df, "prompt", new HttpChatEnricher(base),
        AiConfig(service = "openai", model = "m", apiKey = "sk-x"))
      val rows = out.select("id", "response", "error").collect()
      assert(rows.length == 20)
      assert(rows.forall(_.isNullAt(2)))
      assert(rows.forall(r => r.getString(1) == s"echo:PROMPT ${r.getLong(0)}"))
    } finally server.stop(0)
  }
}
