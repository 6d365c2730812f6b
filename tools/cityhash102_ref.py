#!/usr/bin/env python3
"""Independent CityHash128 v1.0.2 reference (pure Python).

Written directly from the published Google CityHash 1.0.2 algorithm (MIT),
as a SECOND implementation to cross-validate the library's Scala
CityHash102 — the native-protocol frame checksums depend on it, and a
transcription slip there would break every real ClickHouse client while
in-repo round-trip tests stayed green. Python's arbitrary-precision ints
with explicit 2^64 masking exercise a completely different arithmetic
model than JVM signed longs (sign extension, rotate semantics,
promotion), which is exactly the bug class this guards against.

Usage:
  cityhash102_ref.py vectors  > src/test/resources/cityhash102_vectors.tsv
  cityhash102_ref.py frame <payload-hex>   # emit a Method-None frame, hex
"""
import sys

M = (1 << 64) - 1
K0 = 0xc3a5c85c97cb3127
K1 = 0xb492b66fbe98f273
K2 = 0x9ae16a3b2f90404f
K3 = 0xc949d7c7509e6557
KMUL = 0x9ddfea08eb382d69


def f64(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def f32(b, i):
    return int.from_bytes(b[i:i + 4], "little")


def rot(v, s):
    if s == 0:
        return v
    return ((v >> s) | (v << (64 - s))) & M


def shiftmix(v):
    return (v ^ (v >> 47)) & M


def hashlen16(u, v):
    a = ((u ^ v) * KMUL) & M
    a ^= a >> 47
    b = ((v ^ a) * KMUL) & M
    b ^= b >> 47
    return (b * KMUL) & M


def hashlen0to16(b, off, n):
    if n > 8:
        a = f64(b, off)
        bb = f64(b, off + n - 8)
        return hashlen16(a, rot((bb + n) & M, n & 63)) ^ bb
    if n >= 4:
        a = f32(b, off)
        return hashlen16((n + (a << 3)) & M, f32(b, off + n - 4))
    if n > 0:
        a, mid, c = b[off], b[off + (n >> 1)], b[off + n - 1]
        y = (a + (mid << 8)) & M
        z = (n + (c << 2)) & M
        return (shiftmix((y * K2 ^ z * K3) & M) * K2) & M
    return K2


def weak32(w, x, y, z, a, b):
    a = (a + w) & M
    b = rot((b + a + z) & M, 21)
    c = a
    a = (a + x + y) & M
    b = (b + rot(a, 44)) & M
    return (a + z) & M, (b + c) & M


def weak32b(s, off, a, b):
    return weak32(f64(s, off), f64(s, off + 8), f64(s, off + 16),
                  f64(s, off + 24), a, b)


def citymurmur(s, off, n, seedlo, seedhi):
    a, b, c, d = seedlo, seedhi, 0, 0
    if n <= 16:
        c = (b * K1 + hashlen0to16(s, off, n)) & M
        d = rot((b + (f64(s, off) if n >= 8 else c)) & M, 32)
    else:
        c = hashlen16((f64(s, off + n - 8) + K1) & M, a)
        d = hashlen16((b + n) & M, (c + f64(s, off + n - 16)) & M)
        a = (a + d) & M
        p, l = off, n - 16
        while l > 0:
            a = (a ^ (shiftmix((f64(s, p) * K1) & M) * K1)) & M
            a = (a * K1) & M
            b ^= a
            c = (c ^ (shiftmix((f64(s, p + 8) * K1) & M) * K1)) & M
            c = (c * K1) & M
            d ^= c
            p += 16
            l -= 16
    a = hashlen16(a, c)
    b = hashlen16(d, b)
    return (a ^ b) & M, hashlen16(b, a)


def cityhash128_seed(s, off, n, seedlo, seedhi):
    if n < 128:
        return citymurmur(s, off, n, seedlo, seedhi)
    x, y = seedlo, seedhi
    z = (n * K1) & M
    vf = (rot((y ^ K1) & M, 49) * K1 + f64(s, off)) & M
    vs = (rot(vf, 42) * K1 + f64(s, off + 8)) & M
    wf = (rot((y + z) & M, 35) * K1 + x) & M
    ws = (rot((x + f64(s, off + 88)) & M, 53) * K1) & M
    while True:
        for _ in range(2):
            x = (rot((x + y + vf + f64(s, off + 16)) & M, 37) * K1) & M
            y = (rot((y + vs + f64(s, off + 48)) & M, 42) * K1) & M
            x ^= ws
            y ^= vf
            z = rot((z ^ wf) & M, 33)
            vf, vs = weak32b(s, off, (vs * K1) & M, (x + wf) & M)
            wf, ws = weak32b(s, off + 32, (z + ws) & M, y)
            z, x = x, z
            off += 64
        n -= 128
        if n < 128:
            break
    y = (y + rot(wf, 37) * K0 + z) & M
    x = (x + rot((vf + z) & M, 49) * K0) & M
    tail = 0
    while tail < n:
        tail += 32
        y = (rot((y - x) & M, 42) * K0 + vs) & M
        wf = (wf + f64(s, off + n - tail + 16)) & M
        x = (rot(x, 49) * K0 + wf) & M
        wf = (wf + vf) & M
        vf, vs = weak32b(s, off + n - tail, vf, vs)
    x = hashlen16(x, vf)
    y = hashlen16(y, wf)
    return (hashlen16((x + vs) & M, ws) + y) & M, \
        hashlen16((x + ws) & M, (y + vs) & M)


def cityhash128(s):
    n = len(s)
    if n >= 16:
        return cityhash128_seed(s, 16, n - 16, f64(s, 0) ^ K3, f64(s, 8))
    if n >= 8:
        return cityhash128_seed(b"", 0, 0, (f64(s, 0) ^ (n * K0)) & M,
                                (f64(s, n - 8) ^ K1) & M)
    return cityhash128_seed(s, 0, n, K0, K1)


def gen(n, seed):
    """Deterministic pseudo-random bytes (LCG), independent of any RNG lib."""
    out = bytearray(n)
    state = (seed * 6364136223846793005 + 1442695040888963407) & M
    for i in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) & M
        out[i] = (state >> 33) & 0xFF
    return bytes(out)


LENGTHS = [0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 15, 16, 17, 24, 31, 32, 33, 47,
           63, 64, 65, 88, 96, 100, 127, 128, 129, 160, 191, 192, 200, 255,
           256, 300, 512, 1000, 4096]


def frame_none(payload):
    """Method-None native-protocol frame, per the public wire layout."""
    body = bytes([0x02]) + (9 + len(payload)).to_bytes(4, "little") \
        + len(payload).to_bytes(4, "little") + payload
    lo, hi = cityhash128(body)
    return lo.to_bytes(8, "little") + hi.to_bytes(8, "little") + body


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "vectors"
    if cmd == "vectors":
        for n in LENGTHS:
            data = gen(n, seed=n + 1)
            lo, hi = cityhash128(data)
            print(f"{n}\t{data.hex()}\t{lo}\t{hi}")
    elif cmd == "frame":
        payload = bytes.fromhex(sys.argv[2])
        print(frame_none(payload).hex())
    else:
        sys.exit(f"unknown command {cmd}")
