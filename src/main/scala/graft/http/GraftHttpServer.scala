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
  * tail (unmasked server frames, masked client frames, fragmented
  * messages, ping/pong and close handling). Everything else dispatches
  * through the SAME [[Frontend.routeRaw]] the long-poll and spec paths
  * use.
  *
  * Resource bounds — nothing a client sends can size a driver-side
  * allocation beyond a constant:
  *   - `maxConnections` concurrent sockets; excess connections get an
  *     immediate 503 envelope and a close (a resident query service
  *     sheds load instead of queueing unboundedly);
  *   - bodies are capped at [[MaxBodyBytes]] (413 beyond) and read
  *     INCREMENTALLY — the buffer grows with bytes actually received,
  *     never with the declared Content-Length, so a forged huge header
  *     cannot pre-allocate memory;
  *   - header lines are capped at [[MaxHeaderLine]] bytes and
  *     [[MaxHeaderCount]] lines (431 beyond);
  *   - WebSocket messages (frames and reassembled fragment runs) are
  *     capped at [[MaxWsMessage]] — the server closes with 1009 instead
  *     of buffering.
  */
final class GraftHttpServer(fe: Frontend, port: Int, tailTickMs: Int,
    maxConnections: Int = 256) {

  private val MaxBodyBytes = 64 * 1024 * 1024 // writer batches are ≤50 MiB
  private val MaxHeaderLine = 16 * 1024
  private val MaxHeaderCount = 256
  private val MaxWsMessage = 1 << 20

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(port), 64)
  @volatile private var running = true
  private val conns = new java.util.concurrent.Semaphore(maxConnections)
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

  /** Framing violation with the HTTP status it maps to; the connection is
    * dropped after the response (the stream position is untrustworthy).
    */
  private final class HttpError(val status: Int, msg: String)
    extends RuntimeException(msg)

  private final case class Request(method: String, path: String,
      query: String, headers: Map[String, String], body: Array[Byte]) {
    def header(k: String): Option[String] = headers.get(k)
    def wantsClose: Boolean =
      header("connection").exists(_.equalsIgnoreCase("close"))
    def isWsUpgrade: Boolean =
      header("upgrade").exists(_.equalsIgnoreCase("websocket")) &&
        header("connection").exists(_.toLowerCase.contains("upgrade"))
  }

  /** One CRLF-terminated line (tolerates bare LF); None at EOF. Bounded:
    * a line beyond `max` bytes aborts the request (431) instead of
    * growing the builder with attacker-paced bytes.
    */
  private def readLine(in: InputStream, max: Int): Option[String] = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') {
        if (sb.length() >= max)
          throw new HttpError(431, s"header line exceeds $max bytes")
        sb.append(c.toChar)
      }
      c = in.read()
    }
    Some(sb.toString)
  }

  /** Read exactly `n` bytes in bounded chunks: allocation tracks bytes
    * RECEIVED, not the declared length, so a huge Content-Length with a
    * trickle (or no) body cannot reserve memory up front.
    */
  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(n, 64 * 1024))
    val chunk = new Array[Byte](math.min(math.max(n, 1), 64 * 1024))
    var remaining = n
    while (remaining > 0) {
      val r = in.read(chunk, 0, math.min(chunk.length, remaining))
      if (r < 0) throw new java.io.EOFException("body truncated")
      out.write(chunk, 0, r)
      remaining -= r
    }
    out.toByteArray
  }

  private def parseRequest(in: InputStream): Option[Request] = {
    val line = readLine(in, MaxHeaderLine).getOrElse(return None)
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
    var headerN = 0
    val headers = Iterator.continually(readLine(in, MaxHeaderLine).getOrElse(""))
      .takeWhile(_.nonEmpty)
      .flatMap { h =>
        headerN += 1
        if (headerN > MaxHeaderCount)
          throw new HttpError(431, s"more than $MaxHeaderCount header lines")
        val i = h.indexOf(':')
        if (i < 0) None else Some(h.substring(0, i).trim.toLowerCase ->
          h.substring(i + 1).trim)
      }.toMap
    val body =
      if (headers.get("transfer-encoding").exists(_.nonEmpty))
        throw new HttpError(411, "chunked requests unsupported")
      else headers.get("content-length").map(_.toLong) match {
        case Some(n) if n > MaxBodyBytes =>
          throw new HttpError(413,
            s"request body $n bytes exceeds the $MaxBodyBytes limit")
        case Some(n) if n > 0 => readN(in, n.toInt)
        case _                => Array.emptyByteArray
      }
    Some(Request(method, path, query, headers, body))
  }

  // ---- response writing ------------------------------------------------------

  private val Reasons = Map(101 -> "Switching Protocols", 200 -> "OK",
    202 -> "Accepted", 204 -> "No Content", 400 -> "Bad Request",
    404 -> "Not Found", 405 -> "Method Not Allowed", 411 -> "Length Required",
    413 -> "Payload Too Large", 431 -> "Request Header Fields Too Large",
    500 -> "Internal Server Error", 503 -> "Service Unavailable")

  private def errorBody(msg: String): String =
    Json.obj(Seq("status" -> Json.str("error"),
      "error" -> Json.str(msg)))

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
    // over-capacity: shed the connection with a 503 envelope — bounded
    // work (one write), so even the shedding path cannot pile up state
    val admitted = conns.tryAcquire()
    try {
      sock.setSoTimeout(30000)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      if (!admitted) {
        writeResponse(out, HttpResult(503,
          errorBody(s"over capacity: $maxConnections connections")),
          close = true)
        return
      }
      var keep = true
      while (keep && running) {
        val parsed =
          try parseRequest(in)
          catch {
            case e: HttpError =>
              // malformed/over-limit framing: answer, then drop the
              // connection — the stream position is no longer trustworthy
              writeResponse(out,
                HttpResult(e.status, errorBody(String.valueOf(e.getMessage))),
                close = true)
              keep = false
              None
            case e: IllegalArgumentException =>
              writeResponse(out,
                HttpResult(400, errorBody(String.valueOf(e.getMessage))),
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
      if (admitted) conns.release()
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

  /** RFC 6455 close frame: 2-byte status code + a short UTF-8 reason. */
  private def writeClose(out: OutputStream, code: Int, reason: String): Unit = {
    val msg = reason.getBytes(UTF_8).take(100)
    val payload = new Array[Byte](2 + msg.length)
    payload(0) = ((code >> 8) & 0xff).toByte
    payload(1) = (code & 0xff).toByte
    System.arraycopy(msg, 0, payload, 2, msg.length)
    try writeFrame(out, 0x8, payload)
    catch { case _: java.io.IOException => () }
  }

  /** Protocol violation terminating the WebSocket with a close code. */
  private final class WsError(val code: Int, msg: String)
    extends RuntimeException(msg)

  /** One client frame: (opcode, payload, fin). Client frames are masked
    * per RFC 6455 §5.1. Throws SocketTimeoutException ONLY when the tick
    * interval elapses before the first header byte — that is the pacing
    * signal ("no client traffic this tick"). A timeout that fires
    * MID-frame must not pace: the partial bytes are already consumed, so
    * resuming the read loop would restart mid-frame and desynchronize the
    * whole stream — it surfaces as a 1002 [[WsError]] instead (a client
    * that stalls inside a frame for a full tick is broken or hostile).
    * Also throws [[WsError]] on oversize (1009) or malformed control
    * frames (1002).
    */
  private def readFrame(in: InputStream): (Int, Array[Byte], Boolean) = {
    def b(): Int = {
      val v = in.read()
      if (v < 0) throw new java.io.EOFException("ws closed")
      v
    }
    val b0 = b() // timeout HERE = clean tick; below = mid-frame stall
    try readFrameAfterFirst(in, b0, () => b())
    catch {
      case _: SocketTimeoutException =>
        throw new WsError(1002, "client stalled mid-frame")
    }
  }

  private def readFrameAfterFirst(in: InputStream, b0: Int,
      b: () => Int): (Int, Array[Byte], Boolean) = {
    val b1 = b()
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = (b().toLong << 8) | b()
    else if (len == 127) {
      len = 0
      for (_ <- 0 until 8) len = (len << 8) | b()
    }
    // control frames must be unfragmented with tiny payloads (§5.5)
    if (opcode >= 0x8 && (!fin || len > 125))
      throw new WsError(1002, "malformed control frame")
    // every client→server frame must be masked (§5.1: the server MUST
    // close with 1002 on an unmasked frame)
    if (!masked)
      throw new WsError(1002, "unmasked client frame")
    if (len > MaxWsMessage)
      throw new WsError(1009, s"frame exceeds $MaxWsMessage bytes")
    val mask = if (masked) Array.fill(4)(b().toByte) else Array.empty[Byte]
    val payload = readN(in, len.toInt)
    if (masked)
      for (i <- payload.indices) payload(i) = (payload(i) ^ mask(i & 3)).toByte
    (opcode, payload, fin)
  }

  /** The reference's tail loop (`query_range.go:670-800` +
    * `controller/query_range.go:159-244`): poll every tick, write each
    * tick's Loki tail frame as one TEXT message, advance the cursor past
    * the newest served entry, answer pings, honor client close.
    *
    * The query is validated BEFORE the 101 handshake (a bad query is a
    * plain HTTP 400 — after the upgrade there is no status line left);
    * evaluation errors mid-stream send a 1011 close frame so the client
    * can tell a server fault from a network drop. Client data frames are
    * tolerated, fragmentation included — the tail protocol carries no
    * client payload, so reassembled messages are discarded, but a
    * continuation without an opening frame closes 1002 and an oversize
    * run closes 1009 instead of surfacing a raw IOException.
    */
  private def wsTail(r: Request, in: InputStream, out: OutputStream,
      sock: Socket): Unit = {
    val org = r.header("x-scope-orgid")
    if (!fe.orgOk(org)) {
      writeResponse(out, HttpResult(400,
        errorBody("invalid X-Scope-OrgID")), close = true)
      return
    }
    val key = r.header("sec-websocket-key").getOrElse {
      writeResponse(out, HttpResult(400,
        errorBody("missing Sec-WebSocket-Key")), close = true)
      return
    }
    val p = Params.fromQuery(r.query)
    fe.tailQueryError(p) match {
      case Some(msg) =>
        writeResponse(out, HttpResult(400, errorBody(msg)), close = true)
        return
      case None => ()
    }
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
    out.flush()
    var cursor = 0L // 0 ⇒ the frame fn applies the client start / default
    sock.setSoTimeout(math.max(1, tailTickMs))
    var open = true
    // client fragmentation state: opcode of the in-progress message (−1 =
    // none) and bytes seen so far (payloads are discarded — the tail has
    // no client payload — but the size bound is enforced across the run)
    var fragOp = -1
    var fragBytes = 0L
    while (open && running) {
      // the blocking read doubles as the tick timer: a timeout means "no
      // client traffic this tick" — evaluate and push one frame
      val clientFrame =
        try Some(readFrame(in))
        catch {
          case _: SocketTimeoutException => None
          case e: WsError =>
            writeClose(out, e.code, String.valueOf(e.getMessage))
            open = false; None
          case _: java.io.IOException    => open = false; None
        }
      clientFrame match {
        case Some((0x8, _, _)) => // close: echo and finish (RFC 6455 §5.5.1)
          writeFrame(out, 0x8, Array.emptyByteArray)
          open = false
        case Some((0x9, payload, _)) => writeFrame(out, 0xA, payload) // ping→pong
        case Some((0xA, _, _)) => () // unsolicited pong: ignore (§5.5.3)
        case Some((0x0, payload, fin)) => // continuation
          if (fragOp < 0) {
            writeClose(out, 1002, "continuation without an open message")
            open = false
          } else {
            fragBytes += payload.length
            if (fragBytes > MaxWsMessage) {
              writeClose(out, 1009, s"message exceeds $MaxWsMessage bytes")
              open = false
            } else if (fin) fragOp = -1
          }
        case Some((op, payload, fin)) if op == 0x1 || op == 0x2 =>
          if (fragOp >= 0) {
            writeClose(out, 1002, "new data frame inside a fragmented message")
            open = false
          } else if (!fin) { fragOp = op; fragBytes = payload.length.toLong }
          // complete single-frame client messages carry nothing the tail
          // protocol uses: discard
        case _ => ()
      }
      if (open) {
        val tick =
          try Some(fe.tailFrameFor(org, p, cursor))
          catch {
            case e: Exception =>
              // evaluation fault: tell the client before closing (1011 =
              // unexpected server condition) instead of a bare TCP drop
              writeClose(out, 1011,
                Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
              open = false; None
          }
        for ((frame, next) <- tick) {
          cursor = next
          try writeFrame(out, 0x1, frame.getBytes(UTF_8))
          catch { case _: java.io.IOException => open = false }
        }
      }
    }
  }
}
