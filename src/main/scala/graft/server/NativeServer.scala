package graft.server

import org.apache.spark.sql.SparkSession
import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.Executors
import graft.dialect.{ChFunctions, Engine, Transpiler}
import graft.formats.{ChCompression, NativeCodec}

/** ClickHouse native TCP protocol server (SURVEY.md §2.10 A7-A10;
  * reference behavior at /root/reference/main.py:219-814).
  *
  * Packet flow per connection:
  *   client HELLO -> server HELLO with revision-gated fields (TZ,
  *   display name, version patch, password rules, nonce —
  *   main.py:341-402); then a loop of QUERY (client info, settings,
  *   stage, compression, text, parameters — main.py:437-525) answered
  *   with DATA(BlockInfo + columnar block) + END_OF_STREAM for SELECTs,
  *   bare END_OF_STREAM for DDL/DML (main.py:656-662), EXCEPTION with
  *   the message on error (main.py:664-667); PING -> PONG; client DATA
  *   blocks (external tables terminator) are read and discarded.
  *
  * Query execution routes through the same dialect Engine as HTTP.
  * Compression: mode 1 is disambiguated on the wire — the reference's
  * facade clients zlib-deflate the query text, real ClickHouse clients
  * send plain text and negotiate LZ4-framed DATA blocks (both handled;
  * see handleQuery).
  */
class NativeServer(spark: SparkSession, port: Int,
                   fixtureDir: Option[String] = None,
                   blockRows: Int = 65536,
                   idleTimeoutMs: Int = 30000) {

  import NativeServer._

  ChFunctions.register(spark)
  private val server = new ServerSocket(port)
  private val pool = Executors.newCachedThreadPool()
  @volatile private var running = false

  def start(): Unit = {
    running = true
    pool.submit(new Runnable {
      override def run(): Unit =
        while (running)
          try {
            val sock = server.accept()
            pool.submit(new Runnable { override def run(): Unit = serve(sock) })
          } catch {
            // transient accept failures (e.g. fd exhaustion) must not
            // kill the listener thread; only a stop() ends the loop
            case _: Throwable if !running => ()
            case t: Throwable =>
              System.err.println(s"native accept failed: ${t.getMessage}")
              Thread.sleep(100)
          }
    })
  }

  def stop(): Unit = { running = false; server.close(); pool.shutdownNow() }
  def boundPort: Int = server.getLocalPort

  private def serve(sock: Socket): Unit = {
    // idle-client timeout, matching the reference server's 30s
    // settimeout on each accepted connection (main.py:252): a hung or
    // half-open peer must not pin a pooled thread and an fd forever.
    // Reads that block past the deadline raise SocketTimeoutException,
    // caught by the outer handler, which closes the socket. Mid-query
    // work is unaffected — the timeout only covers blocking reads, and
    // a live client keeps the stream moving (PINGs between queries,
    // DATA blocks during INSERT).
    sock.setSoTimeout(idleTimeoutMs)
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    var clientRevision = 0L
    var session: SparkSession = spark
    var authUser: String = "default"
    var dataCompressed = false // last query negotiated LZ4 framing
    try {
      while (true) {
        readVarint(in) match {
          case ClientHello =>
            readStr(in) // client name
            readVarint(in); readVarint(in) // version major/minor
            clientRevision = readVarint(in)
            readStr(in) // database
            val user = readStr(in); val password = readStr(in)
            // per-credential catalog isolation (main.py:140-173)
            authUser = if (user.nonEmpty) user else "default"
            if (user.nonEmpty && user != "default")
              session = UserSessions.forKey(spark, s"$user:$password", fixtureDir)
            val used = math.min(clientRevision, Revision)
            writeVarint(out, ServerHello)
            writeStr(out, ServerName)
            writeVarint(out, VersionMajor); writeVarint(out, VersionMinor)
            writeVarint(out, Revision)
            if (used >= 54058) writeStr(out, "UTC")
            if (used >= 54372) writeStr(out, ServerName)
            if (used >= 54401) writeVarint(out, VersionPatch)
            if (used >= 54461) writeVarint(out, 0) // no password rules
            if (used >= 54462) writeFixed(out, 8)(_.putLong(0L)) // nonce
            out.flush()
            // addendum: clients at negotiated revision >= 54458 send
            // their quota key string right after our HELLO — leaving it
            // unread makes the main loop parse its length varint as a
            // packet type and desync the whole connection
            if (used >= 54458) readStr(in)

          case ClientQuery =>
            dataCompressed =
              handleQuery(in, out, clientRevision, session, authUser)

          case ClientData =>
            // external-tables stream: table name + (BlockInfo + block).
            // Usually the empty terminator, but a client MAY ship an
            // actual external table — decode the full block (discarding
            // it; external tables are unsupported, not desync-fatal).
            // Under negotiated compression the body is one LZ4 frame.
            readStr(in)
            if (dataCompressed) {
              val bin = ChCompression.frameStream(in)
              skipBlockInfo(bin)
              NativeCodec.decode(bin, clientRevision >= 54454)
            } else {
              skipBlockInfo(in)
              NativeCodec.decode(in, clientRevision >= 54454)
            }
            out.flush()

          case ClientPing =>
            writeVarint(out, ServerPong); out.flush()

          case ClientCancel => ()

          case -1L => return
          case _ => return // unknown packet: drop connection
        }
      }
    } catch {
      case _: java.io.EOFException => ()
      case _: java.net.SocketException => ()
      case _: java.net.SocketTimeoutException => () // idle client: drop
    } finally sock.close()
  }

  /** Returns whether this query negotiated LZ4 data framing (the
    * caller applies it to subsequent client DATA packets). */
  private def handleQuery(in: InputStream, out: OutputStream,
                          clientRevision: Long, session: SparkSession,
                          authUser: String): Boolean = {
    val queryId0 = readStr(in) // query id (keys system.processes / KILL)
    val queryId = if (queryId0.nonEmpty) queryId0
      else java.util.UUID.randomUUID().toString
    if (clientRevision >= 54032) {
      val kind = in.read()
      if (kind != 0) {
        readStr(in); readStr(in); readStr(in) // initial user/query_id/address
        if (clientRevision >= 54449) readFixed(in, 8) // initial start time
        in.read() // interface
        readStr(in); readStr(in); readStr(in) // os_user, hostname, client name
        readVarint(in); readVarint(in) // version major/minor
        val infoRevision = readVarint(in)
        if (infoRevision >= 54060) readStr(in) // quota key
        if (infoRevision >= 54448) readVarint(in) // distributed depth
        // real clients (clickhouse-driver gates these on the NEGOTIATED
        // revision, = clientRevision here since we announce 54468) send
        // more client-info fields — unread, the settings loop would
        // parse them as setting names and desync every real query
        if (clientRevision >= 54401) readVarint(in) // client version patch
        if (clientRevision >= 54442 && in.read() == 1) { // OpenTelemetry
          readFixed(in, 16) // trace_id
          readFixed(in, 8) // span_id
          readStr(in) // tracestate
          in.read() // trace_flags
        }
        if (clientRevision >= 54453) {
          readVarint(in) // collaborate_with_initiator
          readVarint(in) // count_participating_replicas
          readVarint(in) // number_of_current_replica
        }
      }
    }
    // settings: (name, flags, value) until empty name. Kept: `extremes`
    // gates the EXTREMES packet (type 8) like real ClickHouse.
    val settings = scala.collection.mutable.Map[String, String]()
    while ({ val name = readStr(in)
             name.nonEmpty && { in.read(); settings(name) = readStr(in); true } }) ()
    if (clientRevision >= 54441) readStr(in) // inter-server secret
    readVarint(in) // query stage
    val compression = readVarint(in)
    // compression modes mirror main.py:498-512: 0 = plain, 1 = zlib
    // (varint-length zlib bytes), 2 = empty-compressed marker then a
    // plain string
    // Mode 1 is overloaded on the wire: the reference's facade clients
    // send zlib-deflated query text (main.py:498-512 quirk), while real
    // ClickHouse clients negotiating compression send PLAIN text and
    // expect LZ4-framed DATA blocks back. zlib's magic header makes the
    // two cases cleanly distinguishable: if the text actually inflated,
    // it's a facade client (plain responses); if it was plain, it's a
    // real client (compressed responses).
    var lz4Responses = false
    val query = compression match {
      case 0 => readStr(in)
      case 1 =>
        val (text, wasZlib) = readZlibStr(in)
        lz4Responses = !wasZlib
        text
      case _ => readZlibStr(in); readStr(in)
    }
    if (clientRevision >= 54459)
      while ({ val name = readStr(in); name.nonEmpty && { in.read(); readStr(in); true } }) ()

    try {
      // Streaming INSERT (the real clickhouse-driver bulk-write flow):
      // an INSERT query carrying NO inline data means "send me the
      // table structure, then I stream DATA blocks". Server answers
      // with a zero-row sample block, reads client blocks until the
      // empty terminator, lands them through the aligned append path.
      streamingInsertRe.findFirstMatchIn(query) match {
        case Some(m) =>
          val serFlag = clientRevision >= 54454
          handleStreamingInsert(in, out, session, m.group(1),
            Option(m.group(3)).map(_.split(",").map(_.trim.replace("`", "")).toSeq),
            serFlag, lz4Responses)
          return lz4Responses
        case None => ()
      }
      val (bare0, _) = Transpiler.extractFormat(query) // native ignores FORMAT
      // WITH TOTALS on the native protocol: the grouped rows go out as
      // DATA and the all-rows aggregate as a separate TOTALS packet
      // (type 7, reference constant main.py:61) — that is what populates
      // clickhouse-driver's `.totals`. The dialect's inline GROUPING
      // SETS rewrite (Transpiler) stays for HTTP; here the query is
      // split instead: the main query drops WITH TOTALS, the totals
      // query aggregates over the empty grouping set. Two aggregate
      // passes, but each is the plain distributed plan — no driver
      // materialization beyond the single totals row.
      val split = Transpiler.splitTotals(bare0)
      val totalsBare: Option[String] = split.map(_._2)
      val bare = split.map(_._1).getOrElse(bare0)
      val df = Engine.execute(session, bare, authUser, Some(queryId))
      val isSelect = bare.trim.toUpperCase.startsWith("SELECT") ||
        bare.trim.toUpperCase.startsWith("WITH")
      if (isSelect) {
        val t0 = System.nanoTime()
        // Stream the result as bounded blocks through toLocalIterator —
        // driver memory is one partition + one block, never the whole
        // result (the scale-safe boundary; a collect() here is the
        // 100 TB driver-OOM). A delta PROGRESS packet precedes each
        // DATA block (additive: the reference defines the constant,
        // main.py:57, but never emits one; field order/gates follow the
        // public wire protocol; ClickHouse progress is incremental).
        // Bytes are an estimate — a progress indicator, not an
        // invariant; totals are 0 = unknown while streaming.
        val used = math.min(clientRevision, Revision)
        val nCols = df.schema.fields.length
        val serFlag = clientRevision >= 54454
        // When the client negotiated compression, BlockInfo + block go
        // INSIDE one LZ4 frame per block; packet type and table name
        // stay plain (the public compressed-wire layout).
        def emitBlockBody(bytes: Array[Byte]): Unit =
          if (lz4Responses)
            out.write(ChCompression.compressFrame(BlockInfoBytes ++ bytes))
          else { writeBlockInfo(out); out.write(bytes) }
        import scala.jdk.CollectionConverters._
        var nBlocks = 0L
        val nRows = NativeCodec.writeBlocks(out, df.schema,
          df.toLocalIterator().asScala, blockRows,
          customSerFlag = serFlag,
          frame = { blockLen =>
            nBlocks += 1
            val approxBytes = blockLen.toLong * nCols * 8
            writeVarint(out, ServerProgress)
            writeVarint(out, blockLen.toLong) // read_rows (delta)
            writeVarint(out, approxBytes)     // read_bytes (delta)
            if (used >= 51554) writeVarint(out, 0) // total_rows_to_read: unknown
            if (used >= 54463) writeVarint(out, 0) // total_bytes_to_read: unknown
            if (used >= 54420) { writeVarint(out, 0); writeVarint(out, 0) } // written rows/bytes
            if (used >= 54460) writeVarint(out, System.nanoTime() - t0) // elapsed_ns
            writeVarint(out, ServerData)
            writeStr(out, "") // table name
            if (!lz4Responses) writeBlockInfo(out)
          },
          transform = if (lz4Responses)
            (b: Array[Byte]) => ChCompression.compressFrame(BlockInfoBytes ++ b)
          else identity)
        // TOTALS packet (type 7): the empty-grouping-set aggregate, one
        // row, encoded against the MAIN schema so both blocks announce
        // identical column types (null group keys encode as ClickHouse
        // defaults when the main column is non-Nullable).
        totalsBare.foreach { tq =>
          // same queryId: KILL QUERY cancels the totals pass too
          val trows = Engine.execute(session, tq, authUser, Some(queryId))
            .limit(2).collect()
          writeVarint(out, ServerTotals)
          writeStr(out, "")
          emitBlockBody(NativeCodec.encode(df.schema, trows, serFlag))
        }
        // EXTREMES packet (type 8), gated on the `extremes` setting like
        // real ClickHouse: min/max per numeric/date column over the
        // result (non-numerics get defaults), one 2-row block.
        if (settings.get("extremes").exists(v => v == "1" || v == "true")) {
          import org.apache.spark.sql.functions.{col, lit, max, min}
          import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
          val fields = df.schema.fields
          val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
            f.dataType match {
              case _: NumericType | DateType | _: TimestampType =>
                Seq(min(col(s"`${f.name}`")).as(s"__mn$i"),
                    max(col(s"`${f.name}`")).as(s"__mx$i"))
              case dt =>
                Seq(max(lit(null).cast(dt)).as(s"__mn$i"),
                    max(lit(null).cast(dt)).as(s"__mx$i"))
            }
          }
          val ext = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
          val minRow = org.apache.spark.sql.Row.fromSeq(
            fields.indices.map(i => ext.get(2 * i)))
          val maxRow = org.apache.spark.sql.Row.fromSeq(
            fields.indices.map(i => ext.get(2 * i + 1)))
          writeVarint(out, ServerExtremes)
          writeStr(out, "")
          emitBlockBody(NativeCodec.encode(df.schema, Array(minRow, maxRow), serFlag))
        }
        // PROFILE_INFO (type 6, reference constant main.py:60): rows,
        // blocks, bytes, applied_limit, rows_before_limit,
        // calculated_rows_before_limit — clickhouse-driver populates
        // client-side profile stats from this.
        writeVarint(out, ServerProfileInfo)
        writeVarint(out, nRows)
        writeVarint(out, nBlocks)
        writeVarint(out, nRows * df.schema.fields.length * 8) // bytes (estimate)
        out.write(0) // applied_limit: unknown/false
        writeVarint(out, 0) // rows_before_limit
        out.write(0) // calculated_rows_before_limit: false
      }
      writeVarint(out, ServerEndOfStream)
      out.flush()
    } catch {
      case t: Throwable =>
        // full exception wire structure (code Int32 + name + message +
        // stack_trace + has_nested) — a bare message string made real
        // clients parse its first bytes as the error code and desync
        writeVarint(out, ServerException)
        writeFixed(out, 4)(_.putInt(1002)) // UNKNOWN_EXCEPTION
        writeStr(out, t.getClass.getSimpleName)
        writeStr(out, Option(t.getMessage).getOrElse(t.getClass.getName))
        writeStr(out, "") // stack trace (not leaked to clients)
        out.write(0) // has_nested = false
        writeVarint(out, ServerEndOfStream)
        out.flush()
    } finally Engine.finishQuery(queryId)
    lz4Responses
  }

  // INSERT with no inline data (trailing VALUES / FORMAT / nothing):
  // triggers the sample-block exchange instead of SQL-text execution
  private val streamingInsertRe =
    ("(?is)^\\s*INSERT\\s+INTO\\s+([\\w`.]+)\\s*(\\(([^)]*)\\))?\\s*" +
      "(?:VALUES|FORMAT\\s+\\w+)?\\s*$").r

  /** The native bulk-write flow (public protocol; clickhouse-driver's
    * `execute("INSERT INTO t VALUES", rows)`): consume the
    * external-tables stream the client sends unconditionally after the
    * Query packet, answer with a zero-row sample block carrying the
    * target structure, read client DATA blocks until the empty
    * terminator, land them through the aligned append path in bounded
    * chunks, then END_OF_STREAM. */
  private def handleStreamingInsert(in: InputStream, out: OutputStream,
                                    session: SparkSession, table: String,
                                    cols: Option[Seq[String]],
                                    serFlag: Boolean,
                                    compressed: Boolean): Unit = {
    val bare = table.replace("`", "")
    val target = Engine.targetSchema(session, bare, cols)
    def readBlock(): (String, Seq[(String, String, Vector[Any])]) = {
      val tableName = readStr(in)
      val block =
        if (compressed) {
          // frame-spanning: one block can arrive as several ~1 MiB
          // frames (clients flush mid-block at max_compress_block_size)
          // — pull frames lazily until the block's structure is decoded
          val bin = ChCompression.frameStream(in)
          skipBlockInfo(bin)
          NativeCodec.decode(bin, serFlag)
        } else {
          skipBlockInfo(in)
          NativeCodec.decode(in, serFlag)
        }
      (tableName, block)
    }
    def nRowsOf(b: Seq[(String, String, Vector[Any])]): Int =
      b.headOption.map(_._3.length).getOrElse(0)
    // External tables: every real client (clickhouse-driver
    // send_external_tables) streams zero or more NAMED blocks plus an
    // UNNAMED empty terminator block IMMEDIATELY after the query,
    // before it waits for the sample. Treating that terminator as the
    // insert-data terminator made a real-driver bulk INSERT a silent
    // zero-row no-op — consume the ext stream first, like the real
    // server's insert path does. The terminator is the block with an
    // EMPTY table name: a named-but-empty external table must not end
    // the stream (it would shift the real terminator into the insert
    // loop and drop the client's data).
    var extDone = false
    while (!extDone) {
      readVarint(in) match {
        case ClientData => if (readBlock()._1.isEmpty) extDone = true
        case ClientPing => writeVarint(out, ServerPong); out.flush()
        case ClientCancel => extDone = true
        case -1L => throw new java.io.EOFException()
        case other =>
          throw new IllegalStateException(s"unexpected packet $other before INSERT data")
      }
    }
    writeVarint(out, ServerData)
    writeStr(out, bare)
    val sample = NativeCodec.encode(target, Array.empty, serFlag)
    if (compressed) out.write(ChCompression.compressFrame(BlockInfoBytes ++ sample))
    else { writeBlockInfo(out); out.write(sample) }
    out.flush()
    // Land in bounded chunks: blocks arrive pre-framed, so buffering
    // the WHOLE stream before one append put an O(insert-size) heap
    // ceiling on the bulk path; per-chunk appends keep the same
    // per-block visibility granularity the client chose.
    val FlushRows = 1 << 16
    var names: Seq[String] = Nil
    var rows = Vector.newBuilder[Seq[Any]]
    var buffered = 0
    def flush(): Unit = {
      val collected = rows.result()
      if (collected.nonEmpty)
        Engine.insertDecodedRows(session, bare, cols, names, collected)
      rows = Vector.newBuilder[Seq[Any]]
      buffered = 0
    }
    var done = false
    while (!done) {
      readVarint(in) match {
        case ClientData =>
          val block = readBlock()._2
          val nRows = nRowsOf(block)
          // a zero-row block (0 cols, or schema echo with 0 rows) is
          // the stream terminator
          if (nRows == 0) done = true
          else {
            if (names.isEmpty) names = block.map(_._1)
            (0 until nRows).foreach(r => rows += block.map(_._3(r)))
            buffered += nRows
            if (buffered >= FlushRows) flush()
          }
        case ClientPing => writeVarint(out, ServerPong); out.flush()
        case ClientCancel => done = true
        case -1L => throw new java.io.EOFException()
        case other =>
          throw new IllegalStateException(s"unexpected packet $other during INSERT")
      }
    }
    flush()
    writeVarint(out, ServerEndOfStream)
    out.flush()
  }

  /** varint-length zlib-deflated string (main.py:782-804 framing).
    * Returns (text, wasActuallyZlib) — plain text falls through with
    * false, which is how real-client compression mode is detected. */
  private def readZlibStr(in: InputStream): (String, Boolean) = {
    val n = readVarint(in)
    if (n <= 0) return ("", false)
    val buf = readFixed(in, n.toInt).array()
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(buf)
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    try {
      while (!inflater.finished()) {
        val k = inflater.inflate(tmp)
        if (k == 0 && inflater.needsInput())
          return (new String(buf, "UTF-8"), false)
        out.write(tmp, 0, k)
      }
      (new String(out.toByteArray, "UTF-8"), true)
    } catch {
      case _: java.util.zip.DataFormatException =>
        (new String(buf, "UTF-8"), false)
    }
  }

  /** BlockInfo: field 1 = is_overflows(0), field 2 = bucket_num(-1),
    * field 0 = end (main.py:562-568). */
  private def writeBlockInfo(out: OutputStream): Unit = {
    writeVarint(out, 1); out.write(0)
    writeVarint(out, 2); writeFixed(out, 4)(_.putInt(-1))
    writeVarint(out, 0)
  }

  private def skipBlockInfo(in: InputStream): Unit = {
    var field = readVarint(in)
    while (field != 0) {
      field match {
        case 1 => in.read()
        case 2 => readFixed(in, 4)
        case other =>
          // an unknown field's VALUE size is unknown — returning here
          // would leave it unread and desync the block that follows
          throw new IllegalStateException(s"unknown BlockInfo field $other")
      }
      field = readVarint(in)
    }
  }
}

object NativeServer {
  // client packet types (main.py:40-50 enum order)
  val ClientHello = 0L; val ClientQuery = 1L; val ClientData = 2L
  val ClientCancel = 3L; val ClientPing = 4L
  // server packet types (main.py:53-61)
  val ServerHello = 0L; val ServerData = 1L; val ServerException = 2L
  val ServerProgress = 3L; val ServerPong = 4L; val ServerEndOfStream = 5L
  val ServerProfileInfo = 6L; val ServerTotals = 7L; val ServerExtremes = 8L

  /** Serialized BlockInfo (is_overflows=0, bucket_num=-1, end) — the
    * prefix that goes inside each compressed frame. */
  val BlockInfoBytes: Array[Byte] = Array[Byte](1, 0, 2, -1, -1, -1, -1, 0)

  val ServerName = "graft"
  val VersionMajor = 25L; val VersionMinor = 5L; val VersionPatch = 2L
  val Revision = 54468L // protocol revision the reference reports (main.py:75-78)

  def readVarint(in: InputStream): Long = {
    var shift = 0; var result = 0L; var b = in.read()
    if (b < 0) return -1L // clean EOF at a packet boundary
    while ((b & 0x80) != 0) {
      result |= (b & 0x7fL) << shift; shift += 7; b = in.read()
      // MID-varint truncation must raise, not return a garbage value
      // (a truncated settings name read as "" would end the settings
      // loop early and misparse everything after it)
      if (b < 0) throw new java.io.EOFException("stream ended mid-varint")
    }
    result | (b.toLong << shift)
  }

  def writeVarint(out: OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Hard cap on wire-supplied string/fixed sizes: a hostile length
    * would otherwise drive a multi-GB allocation (or an Int-wrapped 0
    * that busy-loops) on the shared driver JVM before any validation. */
  private val MaxWireBytes = 64 << 20

  def readStr(in: InputStream): String = {
    val n = readVarint(in)
    if (n <= 0) return ""
    require(n <= MaxWireBytes, s"string length $n exceeds wire cap")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n.toInt - off)
      if (k < 0) throw new java.io.EOFException()
      off += k
    }
    new String(buf, "UTF-8")
  }

  def writeStr(out: OutputStream, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    writeVarint(out, bytes.length); out.write(bytes)
  }

  def readFixed(in: InputStream, n: Int): ByteBuffer = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new java.io.EOFException()
      off += k
    }
    ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
  }

  def writeFixed(out: OutputStream, n: Int)(fill: ByteBuffer => Unit): Unit = {
    val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    fill(bb); out.write(bb.array())
  }
}

/** `runMain graft.server.NativeServeMain [port] [sfDir]` */
object NativeServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(9000)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.dialect.ChContext.setup(spark, dir)
    val srv = new NativeServer(spark, port, Some(dir))
    srv.start()
    // close the listener on SIGTERM; UserSessions' own hook purges the
    // per-credential scratch databases (main.py:934-952 parity)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => srv.stop(), "graft-native-stop"))
    println(s"[graft-native] listening on :$port over $dir")
    Thread.currentThread().join()
  }
}
