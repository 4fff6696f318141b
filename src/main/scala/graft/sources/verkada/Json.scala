package graft.sources.verkada

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal HTTP + JSON plumbing for the connector (driver and
  * executor side). Jackson ships on Spark's classpath; the JDK
  * HttpClient needs no extra dependency.
  */
object Json {
  val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  def httpClient(): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  def get(client: HttpClient, url: String, headers: Map[String, String]): String = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"GET $url -> ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  def send(client: HttpClient, method: String, url: String, body: String,
      headers: Map[String, String]): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"$method $url -> ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }
}
