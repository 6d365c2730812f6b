package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import graft.server.{HttpServer, NativeServer, NativeServer => P}

/** Concurrency envelope: ~20 simultaneous mixed HTTP + native sessions
  * running SELECT + INSERT + KILL QUERY against one engine. The
  * reference pins a 25-hard/20-soft connection envelope
  * (/root/reference/fly/fly.toml:26-28); this spec drives the same
  * scale and asserts per-session isolation, query_log attribution, and
  * that the storm neither deadlocks nor cross-talks. */
class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = SparkTestSession.spark
  private var http: HttpServer = _
  private var native: NativeServer = _
  private val client = HttpClient.newHttpClient()
  private val Dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    graft.dialect.ChContext.setup(spark, Dir)
    http = new HttpServer(spark, 0, Some(Dir)); http.start()
    native = new NativeServer(spark, 0, Some(Dir)); native.start()
  }

  override def afterAll(): Unit = {
    if (http != null) http.stop()
    if (native != null) native.stop()
  }

  private def post(body: String, params: String = ""): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://localhost:${http.boundPort}/$params"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  // ---- minimal native client (same packets as NativeServerSpec) ----
  private val Rev = 54468L

  private def nativeConnect(user: String = "default", pw: String = ""):
      (Socket, BufferedInputStream, BufferedOutputStream) = {
    val sock = new Socket("localhost", native.boundPort)
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    P.writeVarint(out, P.ClientHello)
    P.writeStr(out, "conc"); P.writeVarint(out, 25); P.writeVarint(out, 5)
    P.writeVarint(out, Rev)
    P.writeStr(out, "default"); P.writeStr(out, user); P.writeStr(out, pw)
    P.writeStr(out, "") // addendum quota key (rev >= 54458)
    out.flush()
    assert(P.readVarint(in) === P.ServerHello)
    P.readStr(in); P.readVarint(in); P.readVarint(in)
    val rev = P.readVarint(in)
    if (rev >= 54058) P.readStr(in)
    if (rev >= 54372) P.readStr(in)
    if (rev >= 54401) P.readVarint(in)
    if (rev >= 54461) P.readVarint(in)
    if (rev >= 54462) P.readFixed(in, 8)
    (sock, in, out)
  }

  private def nativeQuery(in: BufferedInputStream, out: BufferedOutputStream,
                          sql: String): Either[String, Vector[Vector[Any]]] = {
    P.writeVarint(out, P.ClientQuery)
    P.writeStr(out, "")
    out.write(1)
    P.writeStr(out, "default"); P.writeStr(out, ""); P.writeStr(out, "0.0.0.0:0")
    P.writeFixed(out, 8)(_.putLong(0L))
    out.write(1)
    P.writeStr(out, "t"); P.writeStr(out, "h"); P.writeStr(out, "c")
    P.writeVarint(out, 25); P.writeVarint(out, 5); P.writeVarint(out, Rev)
    P.writeStr(out, ""); P.writeVarint(out, 0)
    P.writeVarint(out, 2); out.write(0) // version patch; no OTel
    P.writeVarint(out, 0); P.writeVarint(out, 0); P.writeVarint(out, 0) // parallel replicas
    P.writeStr(out, ""); P.writeStr(out, "")
    P.writeVarint(out, 2); P.writeVarint(out, 0)
    P.writeStr(out, sql); P.writeStr(out, "")
    out.flush()
    val rows = Vector.newBuilder[Vector[Any]]
    var err: Option[String] = None
    var done = false
    while (!done) {
      P.readVarint(in) match {
        case P.ServerData =>
          P.readStr(in)
          var f = P.readVarint(in)
          while (f != 0) { if (f == 1) in.read() else if (f == 2) P.readFixed(in, 4); f = P.readVarint(in) }
          val nCols = P.readVarint(in).toInt
          val nRows = P.readVarint(in).toInt
          val cols = (0 until nCols).map { _ =>
            P.readStr(in); val tpe = P.readStr(in); in.read()
            val (base, nullable) =
              if (tpe.startsWith("Nullable(")) (tpe.drop(9).dropRight(1), true) else (tpe, false)
            val nulls = if (nullable) Array.fill(nRows)(in.read() == 1) else Array.fill(nRows)(false)
            (0 until nRows).map { r =>
              val v = base match {
                case "Int64" | "UInt64" => P.readFixed(in, 8).getLong
                case "Int32" => P.readFixed(in, 4).getInt
                case "Float64" => P.readFixed(in, 8).getDouble
                case "String" => P.readStr(in)
                case t if t.startsWith("Decimal") =>
                  val s = t.drop(8).dropRight(1).split(",")(1).trim.toInt
                  BigDecimal(BigInt(P.readFixed(in, 8).getLong), s)
                case t => fail(s"conc client can't read $t")
              }
              if (nulls(r)) null else v
            }.toVector
          }
          (0 until nRows).foreach(r => rows += cols.map(_(r)).toVector)
        case P.ServerProgress =>
          P.readVarint(in); P.readVarint(in); P.readVarint(in)
          P.readVarint(in); P.readVarint(in); P.readVarint(in); P.readVarint(in)
        case P.ServerTotals | P.ServerExtremes =>
          P.readStr(in)
          var f = P.readVarint(in)
          while (f != 0) { if (f == 1) in.read() else if (f == 2) P.readFixed(in, 4); f = P.readVarint(in) }
          P.readVarint(in); P.readVarint(in) // 0-col skip is fine for this client
        case P.ServerProfileInfo =>
          P.readVarint(in); P.readVarint(in); P.readVarint(in)
          in.read(); P.readVarint(in); in.read()
        case P.ServerException =>
          P.readFixed(in, 4); P.readStr(in) // code, name
          err = Some(P.readStr(in))
          P.readStr(in); in.read() // stack, has_nested
        case P.ServerEndOfStream => done = true
        case other => fail(s"unexpected packet $other")
      }
    }
    err.toLeft(rows.result())
  }

  test("20 mixed HTTP+native sessions: SELECT + INSERT + KILL, isolated, attributed, no deadlock") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(24)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // --- session-scoped tables for the INSERT workers (per HTTP user) ---
      for (u <- Seq("alice", "bob")) {
        post("DROP TABLE IF EXISTS conc_t", s"?user=$u&password=pw")
        post("CREATE TABLE conc_t (who String, v Int64) ENGINE=Memory",
          s"?user=$u&password=pw")
      }

      val futures: Seq[Future[Any]] =
        // 8 HTTP SELECT workers, distinct arithmetic per worker
        (1 to 8).map { i => Future {
          val r = post(s"SELECT sum(number) + $i AS s FROM numbers(1000)")
          assert(r.statusCode() === 200, r.body())
          assert(r.body().trim === (499500 + i).toString)
        }} ++
        // 4 HTTP INSERT workers: alice/bob write interleaved into their
        // own session-scoped conc_t
        (1 to 4).map { i => Future {
          val u = if (i % 2 == 0) "alice" else "bob"
          for (k <- 1 to 3) {
            val r = post(s"INSERT INTO conc_t VALUES ('$u', ${i * 10 + k})",
              s"?user=$u&password=pw")
            assert(r.statusCode() === 200, r.body())
          }
        }} ++
        // 6 native SELECT workers on their own connections
        (1 to 6).map { i => Future {
          val (s, in, out) = nativeConnect()
          try {
            val got = nativeQuery(in, out,
              s"SELECT count() + $i AS c FROM lineitem")
            assert(got.isRight, got)
            val base = got.toOption.get.head.head.asInstanceOf[Long]
            assert(base > i) // count(lineitem) + i
            // second query on the same connection still works mid-storm
            val got2 = nativeQuery(in, out, s"SELECT ${i * 7} AS x")
            assert(got2.toOption.get.head.head === i * 7)
          } finally s.close()
        }} ++
        // 1 long-running victim + 1 killer (SYNC kill from another conn)
        Seq(Future {
          val victim = Future {
            // heavy enough to still be running when the KILL lands
            post("SELECT count() FROM numbers(3000000000)",
              "?query_id=conc_victim")
          }
          // wait until it registers in system.processes, then kill
          var seen = false
          val deadline = System.currentTimeMillis() + 30000
          while (!seen && System.currentTimeMillis() < deadline) {
            val r = post("SELECT query_id FROM system.processes " +
              "WHERE query_id = 'conc_victim'")
            seen = r.body().contains("conc_victim")
            if (!seen) Thread.sleep(100)
          }
          assert(seen, "victim query never appeared in system.processes")
          val k = post("KILL QUERY WHERE query_id = 'conc_victim' SYNC")
          assert(k.statusCode() === 200, k.body())
          val vr = Await.result(victim, 60.seconds)
          // the kill either cancelled the jobs (error) or the victim
          // finished first under storm scheduling — both are deadlock-free
          assert(vr.statusCode() === 400 || vr.statusCode() === 200)
        })
      Await.result(Future.sequence(futures), 180.seconds)

      // --- isolation: each HTTP user sees only its own inserts ---
      for (u <- Seq("alice", "bob")) {
        val r = post("SELECT DISTINCT who FROM conc_t",
          s"?user=$u&password=pw")
        assert(r.body().trim === u, s"user $u sees: ${r.body()}")
        val n = post("SELECT count() FROM conc_t", s"?user=$u&password=pw")
        assert(n.body().trim === "6", s"user $u rows: ${n.body()}") // 2 workers × 3 rows
      }
      // --- mutations interleaved with inserts hold the table lock ---
      post("DROP TABLE IF EXISTS conc_m")
      post("CREATE TABLE conc_m (v Int64) ENGINE=Memory")
      val mixed: Seq[Future[Any]] =
        (1 to 3).map { i => Future {
          for (k <- 1 to 2) {
            val r = post(s"INSERT INTO conc_m VALUES (${i * 10 + k})")
            assert(r.statusCode() === 200, r.body())
          }
        }} ++
        (1 to 2).map { _ => Future {
          // a no-op mutation still TRUNCATEs and rewrites the table —
          // unserialized it would drop concurrent inserts or crash
          val r = post("ALTER TABLE conc_m DELETE WHERE v < 0")
          assert(r.statusCode() === 200, r.body())
        }}
      Await.result(Future.sequence(mixed), 120.seconds)
      val mcount = post("SELECT count() FROM conc_m").body().trim
      assert(mcount === "6", s"conc_m rows after insert+mutation storm: $mcount")

      // --- attribution: query_log carries the right user per entry ---
      val log = post("SELECT user, count() FROM system.query_log " +
        "WHERE query LIKE '%conc_t%' AND user IN ('alice','bob') " +
        "GROUP BY user ORDER BY user")
      assert(log.body().contains("alice") && log.body().contains("bob"), log.body())
    } finally pool.shutdownNow()
  }
}
