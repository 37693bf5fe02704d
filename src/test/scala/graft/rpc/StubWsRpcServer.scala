package graft.rpc

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import org.json4s.jackson.JsonMethods

/** In-process RFC 6455 websocket JSON-RPC server — the ws face of
  * [[StubRpcServer]] (whose `rpcPayload` it delegates to, so both
  * transports serve byte-identical JSON-RPC semantics, including the
  * adversarial reversed batch order). Plain JDK sockets; the handshake
  * and frame codec are implemented inline because the JDK ships only a
  * ws *client*.
  *
  * Failure injection:
  *  - `dieAfterFrames.set(n)` — answer n text frames per THIS server's
  *    lifetime normally, then hard-close every connection (tests the
  *    client's reconnect-with-replay)
  *  - `throttleNextFrames.set(n)` — next n frames answer a single
  *    id-less code-429 error object (the ws analog of HTTP 429: no
  *    status line exists per message)
  */
final class StubWsRpcServer(inner: StubRpcServer) {
  val handshakes = new AtomicInteger(0)
  val framesServed = new AtomicInteger(0)
  val dieAfterFrames = new AtomicInteger(Int.MaxValue)
  val throttleNextFrames = new AtomicInteger(0)

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", 0))
  private val pool = Executors.newCachedThreadPool()
  @volatile private var running = true
  pool.submit(new Runnable {
    override def run(): Unit =
      while (running)
        try { val s = server.accept(); pool.submit(new Runnable { override def run(): Unit = serve(s) }) }
        catch { case _: Exception => /* closed */ }
  })

  def url: String = s"ws://127.0.0.1:${server.getLocalPort}/"
  def stop(): Unit = { running = false; server.close(); pool.shutdownNow() }

  private def serve(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      if (!handshake(in, out)) { sock.close(); return }
      handshakes.incrementAndGet()
      val message = new java.io.ByteArrayOutputStream()
      var open = true
      while (open) {
        readFrame(in) match {
          case None => open = false
          case Some((fin, opcode, payload)) =>
            opcode match {
              case 0x1 | 0x0 => // text / continuation
                message.write(payload)
                if (fin) {
                  val text = message.toString(StandardCharsets.UTF_8); message.reset()
                  if (framesServed.incrementAndGet() > dieAfterFrames.get()) {
                    sock.close(); open = false // endpoint dies mid-window
                  } else if (throttleNextFrames.getAndUpdate(n => math.max(0, n - 1)) > 0) {
                    writeText(out,
                      """{"jsonrpc":"2.0","id":null,"error":{"code":429,"message":"too many requests"}}""")
                  } else {
                    val resp = inner.rpcPayload(JsonMethods.parse(text))
                    writeText(out, JsonMethods.compact(JsonMethods.render(resp)))
                  }
                }
              case 0x8 => // close: echo and finish
                writeFrame(out, 0x8, payload); open = false
              case 0x9 => // ping -> pong
                writeFrame(out, 0xA, payload)
              case _ => // pong / unknown: ignore
            }
        }
      }
      sock.close()
    } catch { case _: Exception => try sock.close() catch { case _: Exception => } }
  }

  private def handshake(in: DataInputStream, out: DataOutputStream): Boolean = {
    val lines = Iterator.continually(readLine(in)).takeWhile(l => l != null && l.nonEmpty).toList
    val key = lines.collectFirst {
      case l if l.toLowerCase.startsWith("sec-websocket-key:") => l.split(":", 2)(1).trim
    }
    key match {
      case Some(k) =>
        val accept = Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
          .digest((k + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(StandardCharsets.US_ASCII)))
        out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
          s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
          .getBytes(StandardCharsets.US_ASCII))
        out.flush()
        true
      case None => false
    }
  }

  private def readLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    if (c < 0 && sb.isEmpty) null else sb.toString
  }

  /** One frame: (fin, opcode, unmasked payload); None on EOF. */
  private def readFrame(in: DataInputStream): Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val b1 = in.read()
    if (b1 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = (b1 & 0x7F).toLong
    if (len == 126) len = in.readUnsignedShort().toLong
    else if (len == 127) len = in.readLong()
    val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    }
    Some((fin, opcode, payload))
  }

  private def writeText(out: DataOutputStream, text: String): Unit =
    writeFrame(out, 0x1, text.getBytes(StandardCharsets.UTF_8))

  private def writeFrame(out: DataOutputStream, opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      out.write(0x80 | opcode) // FIN + opcode; server frames are unmasked
      if (payload.length < 126) out.write(payload.length)
      else if (payload.length < 65536) { out.write(126); out.writeShort(payload.length) }
      else { out.write(127); out.writeLong(payload.length.toLong) }
      out.write(payload)
      out.flush()
    }
}
