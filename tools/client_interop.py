#!/usr/bin/env python3
"""Drive graft's native TCP server with the REAL `clickhouse-driver`
Python package — the reference's own gate does exactly this
(/root/reference/test/test_suite.py:392-420 drives a
clickhouse_driver.Client end-to-end).

Usage:
    # terminal 1: start the server
    sbt "runMain graft.server.NativeServeMain 9000 /root/testdata/sf0.001"
    # terminal 2:
    python3 tools/client_interop.py [host] [port]

The package is pure-wire (no egress needed at runtime), but it is NOT
installed in this zero-egress sandbox and cannot be fetched — when the
import fails this script prints SKIP and exits 0. The byte-level
fallback evidence lives in NativeServerSpec, which replays the same
packet sequences the reference's hand-rolled matrix sends
(test_suite.py:181-292): hello/handshake, query, data blocks,
end-of-stream, ping, exception, compressed-query modes.
"""
import sys

def main():
    host = sys.argv[1] if len(sys.argv) > 1 else "localhost"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
    try:
        from clickhouse_driver import Client
    except ImportError:
        print("SKIP: clickhouse-driver not installed in this sandbox "
              "(zero egress; see NativeServerSpec for the byte-level "
              "protocol evidence)")
        return 0

    client = Client(host=host, port=port)
    failures = 0

    def check(name, got, want):
        nonlocal failures
        ok = got == want
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: got={got!r} want={want!r}")

    check("select-1", client.execute("SELECT 1"), [(1,)])
    check("numbers", client.execute(
        "SELECT number, toString(number) FROM numbers(3) ORDER BY number"),
        [(0, "0"), (1, "1"), (2, "2")])
    client.execute("CREATE DATABASE IF NOT EXISTS interop")
    client.execute("DROP TABLE IF EXISTS interop.t")
    client.execute("CREATE TABLE interop.t (id Int64, s String) ENGINE=Memory")
    client.execute("INSERT INTO interop.t VALUES (1, 'a'), (2, 'b')")
    check("ddl-roundtrip", client.execute(
        "SELECT id, s FROM interop.t ORDER BY id"), [(1, "a"), (2, "b")])
    check("version", len(client.execute("SELECT version()")), 1)
    # driver-style bulk insert: query with no inline data -> sample
    # block exchange -> client streams DATA blocks
    client.execute("DROP TABLE IF EXISTS interop.bulk")
    client.execute("CREATE TABLE interop.bulk (id Int64, s String) ENGINE=Memory")
    client.execute("INSERT INTO interop.bulk VALUES",
                   [(10, "x"), (11, "y"), (12, "z")])
    check("bulk-insert", client.execute(
        "SELECT id, s FROM interop.bulk ORDER BY id"),
        [(10, "x"), (11, "y"), (12, "z")])
    # WITH TOTALS populates the driver's totals attribute
    q = client.execute("SELECT s, count() FROM interop.bulk "
                       "GROUP BY s WITH TOTALS ORDER BY s")
    check("totals-rows", len(q), 3)
    print(f"{'OK' if failures == 0 else 'FAILED'}: {failures} failures")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main())
