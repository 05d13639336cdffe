package graft.http

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream,
  OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket,
  SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal HTTP/1.1 server over raw sockets, replacing the JDK
  * `HttpServer` so `/loki/api/v1/tail` can UPGRADE to a real WebSocket on
  * the same port — the reference serves the tail as gorilla/websocket on
  * its shared reader port (`reader/controller/query_range.go:152-244`),
  * and the JDK server cannot hijack a connection after the handshake.
  *
  * Scope is exactly what the frontend needs: request-line + headers +
  * Content-Length bodies (chunked requests are rejected with 411 — no
  * client of this API streams requests), keep-alive by default with
  * `Connection: close` honored, and RFC 6455 server-side frames for the
  * tail (unmasked server frames, masked client frames, ping/pong and
  * close handling). Everything else dispatches through the SAME
  * [[Frontend.routeRaw]] the long-poll and spec paths use.
  */
final class GraftHttpServer(fe: Frontend, port: Int, tailTickMs: Int) {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(port), 64)
  @volatile private var running = true
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r, "graft-http"); t.setDaemon(true); t })

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        pool.execute(() => handle(sock))
      } catch { case _: Throwable => () } // closed during stop()
    }
  }, "graft-http-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def getAddress: InetSocketAddress =
    server.getLocalSocketAddress.asInstanceOf[InetSocketAddress]

  /** Same shutdown surface as the JDK server (`stop(delaySeconds)`). */
  def stop(delay: Int): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
    pool.shutdownNow(): Unit
  }

  // ---- request parsing -------------------------------------------------------

  private final case class Request(method: String, path: String,
      query: String, headers: Map[String, String], body: Array[Byte]) {
    def header(k: String): Option[String] = headers.get(k)
    def wantsClose: Boolean =
      header("connection").exists(_.equalsIgnoreCase("close"))
    def isWsUpgrade: Boolean =
      header("upgrade").exists(_.equalsIgnoreCase("websocket")) &&
        header("connection").exists(_.toLowerCase.contains("upgrade"))
  }

  /** One CRLF-terminated line (tolerates bare LF); None at EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    Some(sb.toString)
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException("body truncated")
      off += r
    }
    buf
  }

  private def parseRequest(in: InputStream): Option[Request] = {
    val line = readLine(in).getOrElse(return None)
    if (line.isEmpty) return None
    val parts = line.split(" ")
    if (parts.length < 2) return None
    val (rawPath, method) = (parts(1), parts(0))
    val qIdx = rawPath.indexOf('?')
    val (encPath, query) =
      if (qIdx < 0) (rawPath, "") else rawPath.splitAt(qIdx) match {
        case (p, q) => (p, q.drop(1))
      }
    // percent-decode the path exactly like the JDK server's URI.getPath
    // did (no '+'-as-space: that is a query-string convention) — encoded
    // label-name segments (/label/ns%2Fapp/values) must reach the routes
    // decoded
    val path =
      try java.net.URI.create(encPath).getPath
      catch { case _: Throwable => encPath }
    val headers = Iterator.continually(readLine(in).getOrElse(""))
      .takeWhile(_.nonEmpty)
      .flatMap { h =>
        val i = h.indexOf(':')
        if (i < 0) None else Some(h.substring(0, i).trim.toLowerCase ->
          h.substring(i + 1).trim)
      }.toMap
    val body =
      if (headers.get("transfer-encoding").exists(_.nonEmpty))
        throw new IllegalArgumentException("chunked requests unsupported")
      else headers.get("content-length").map(_.toInt) match {
        case Some(n) if n > 0 => readN(in, n)
        case _                => Array.emptyByteArray
      }
    Some(Request(method, path, query, headers, body))
  }

  // ---- response writing ------------------------------------------------------

  private val Reasons = Map(101 -> "Switching Protocols", 200 -> "OK",
    202 -> "Accepted", 204 -> "No Content", 400 -> "Bad Request",
    404 -> "Not Found", 405 -> "Method Not Allowed", 411 -> "Length Required",
    500 -> "Internal Server Error")

  private def writeResponse(out: OutputStream, res: HttpResult,
      close: Boolean): Unit = {
    val reason = Reasons.getOrElse(res.status, "OK")
    val body = if (res.status == 204) Array.emptyByteArray
      else res.body.getBytes(UTF_8)
    val head = new StringBuilder()
      .append("HTTP/1.1 ").append(res.status).append(' ').append(reason)
      .append("\r\n")
    if (res.status != 204) {
      head.append("Content-Type: ").append(res.contentType).append("\r\n")
      head.append("Content-Length: ").append(body.length).append("\r\n")
    }
    if (close) head.append("Connection: close\r\n")
    head.append("\r\n")
    out.write(head.toString.getBytes(UTF_8))
    if (body.nonEmpty) out.write(body)
    out.flush()
  }

  // ---- connection loop -------------------------------------------------------

  private def handle(sock: Socket): Unit = {
    try {
      sock.setSoTimeout(30000)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      var keep = true
      while (keep && running) {
        val parsed =
          try parseRequest(in)
          catch { case e: IllegalArgumentException =>
            // malformed framing (chunked request): answer, then drop the
            // connection — the stream position is no longer trustworthy
            writeResponse(out, HttpResult(411, Json.obj(Seq(
              "status" -> Json.str("error"),
              "error" -> Json.str(String.valueOf(e.getMessage))))),
              close = true)
            keep = false
            None
          }
        parsed match {
          case None => keep = false
          case Some(r) if r.isWsUpgrade && r.path == "/loki/api/v1/tail" =>
            wsTail(r, in, out, sock)
            keep = false
          case Some(r) =>
            val res =
              try fe.routeRaw(r.path, Params.fromQuery(r.query), r.method,
                r.body, r.header("x-scope-orgid"))
              catch { case e: IllegalArgumentException =>
                // bad query-string encoding; route-level errors are
                // already enveloped inside routeRaw
                HttpResult(400, Json.obj(Seq("status" -> Json.str("error"),
                  "errorType" -> Json.str("bad_data"),
                  "error" -> Json.str(String.valueOf(e.getMessage)))))
              }
            writeResponse(out, res, close = r.wantsClose)
            if (r.wantsClose) keep = false
        }
      }
    } catch {
      case _: SocketTimeoutException => ()
      case _: java.io.IOException    => ()
      case _: Throwable              => ()
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
  }

  // ---- RFC 6455 tail ---------------------------------------------------------

  private def acceptKey(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8))
    java.util.Base64.getEncoder.encodeToString(sha)
  }

  private def writeFrame(out: OutputStream, opcode: Int,
      payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode) // FIN + opcode; server frames are unmasked
    val n = payload.length
    if (n <= 125) out.write(n)
    else if (n <= 0xffff) {
      out.write(126); out.write(n >> 8); out.write(n & 0xff)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  /** One client frame: (opcode, payload). Client frames are masked per
    * RFC 6455 §5.1. Throws SocketTimeoutException when the tick interval
    * elapses with no client traffic (the pacing signal).
    */
  private def readFrame(in: InputStream): (Int, Array[Byte]) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new java.io.EOFException("ws closed")
      v
    }
    val b0 = b()
    val b1 = b()
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = (b().toLong << 8) | b()
    else if (len == 127) {
      len = 0
      for (_ <- 0 until 8) len = (len << 8) | b()
    }
    if (len > (1 << 20)) throw new java.io.IOException("ws frame too large")
    val mask = if (masked) Array.fill(4)(b().toByte) else Array.empty[Byte]
    val payload = readN(in, len.toInt)
    if (masked)
      for (i <- payload.indices) payload(i) = (payload(i) ^ mask(i & 3)).toByte
    (b0 & 0x0f, payload)
  }

  /** The reference's tail loop (`query_range.go:670-800` +
    * `controller/query_range.go:159-244`): poll every tick, write each
    * tick's Loki tail frame as one TEXT message, advance the cursor past
    * the newest served entry, answer pings, honor client close.
    */
  private def wsTail(r: Request, in: InputStream, out: OutputStream,
      sock: Socket): Unit = {
    val org = r.header("x-scope-orgid")
    if (!fe.orgOk(org)) {
      writeResponse(out, HttpResult(400, Json.obj(Seq(
        "status" -> Json.str("error"),
        "error" -> Json.str("invalid X-Scope-OrgID")))), close = true)
      return
    }
    val key = r.header("sec-websocket-key").getOrElse {
      writeResponse(out, HttpResult(400, Json.obj(Seq(
        "status" -> Json.str("error"),
        "error" -> Json.str("missing Sec-WebSocket-Key")))), close = true)
      return
    }
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
    out.flush()
    val p = Params.fromQuery(r.query)
    var cursor = 0L // 0 ⇒ the frame fn applies the client start / default
    sock.setSoTimeout(math.max(1, tailTickMs))
    var open = true
    while (open && running) {
      // the blocking read doubles as the tick timer: a timeout means "no
      // client traffic this tick" — evaluate and push one frame
      val clientFrame =
        try Some(readFrame(in))
        catch {
          case _: SocketTimeoutException => None
          case _: java.io.IOException    => open = false; None
        }
      clientFrame match {
        case Some((0x8, _)) => // close: echo and finish (RFC 6455 §5.5.1)
          writeFrame(out, 0x8, Array.emptyByteArray)
          open = false
        case Some((0x9, payload)) => writeFrame(out, 0xA, payload) // ping→pong
        case _ => ()
      }
      if (open) {
        val (frame, next) = fe.tailFrameFor(org, p, cursor)
        cursor = next
        try writeFrame(out, 0x1, frame.getBytes(UTF_8))
        catch { case _: java.io.IOException => open = false }
      }
    }
  }
}
