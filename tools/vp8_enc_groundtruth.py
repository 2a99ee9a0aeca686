#!/usr/bin/env python3
"""Pin libwebp's decode of the in-repo Vp8Enc fixture encoder's output.

Run AFTER `sbt "Test/runMain"`-style generation of enc_*.webp + .my.{y,u,v}
planes under /tmp/vp8x (the deterministic streams the Vp8InteropSpec
`encPins` table re-generates at test time):

  - decodes each enc_*.webp with the on-disk public libwebp
    (WebPDecodeYUV) — an implementation that has never seen this
    encoder — and
  - verifies the planes equal the Scala decoder's output byte-for-byte,
  - prints the FNV-1a64 checksums embedded as `encPins` constants.

This certifies the ENCODER (bool coder carry paths, token lattice, fDCT/
WHT scaling, two-partition layout, all-ten-B_PRED rotation) against an
external implementation, closing the symmetric-bug blind spot in the
roundtrip certificate.
"""
import ctypes, glob, os

lw = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    yp = lw.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, "libwebp refused the Vp8Enc stream"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W+1)//2, (H+1)//2
    y = bytes(bytearray(yp[r*S + c] for r in range(H) for c in range(W)))
    u = bytes(bytearray(up[r*US + c] for r in range(ch) for c in range(cw)))
    v = bytes(bytearray(vp[r*US + c] for r in range(ch) for c in range(cw)))
    return W, H, y, u, v

def fnv64(b):
    h = 0xcbf29ce484222325
    for x in b: h = ((h ^ x) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h

for f in sorted(glob.glob('/tmp/vp8x/enc_*.webp')):
    base = f[:-5]
    W, H, y, u, v = decode_yuv(open(f, 'rb').read())
    ok = (y == open(base + '.my.y','rb').read() and
          u == open(base + '.my.u','rb').read() and
          v == open(base + '.my.v','rb').read())
    print(os.path.basename(f), W, H, "MATCH" if ok else "MISMATCH",
          fnv64(y), fnv64(u), fnv64(v))
    assert ok
