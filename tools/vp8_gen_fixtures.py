#!/usr/bin/env python3
"""Generate lossy-VP8 ground-truth fixtures with the on-disk public libwebp:
encode deterministic synthetic images, then decode them back with libwebp's
own WebPDecodeYUV to capture the bit-exact YUV reference planes.

Outputs per fixture under /tmp/vp8x/fixtures:
  <name>.webp          real libwebp-encoded stream
  <name>.y/.u/.v       libwebp-decoded planes (cropped to WxH / chroma dims)
  manifest.json        dims + FNV-1a64 checksums per plane
"""
import ctypes, json, os, struct

lw = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
lw.WebPEncodeRGB.restype = ctypes.c_size_t
lw.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, ctypes.c_float,
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lw.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def encode_rgb(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeRGB(bytes(rgb), w, h, w*3, float(q), ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(out[i] for i in range(n)))
    return data

def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    yp = lw.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(up), ctypes.byref(vp),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, "decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W+1)//2, (H+1)//2
    y = bytes(bytearray(yp[r*S + c] for r in range(H) for c in range(W)))
    u = bytes(bytearray(up[r*US + c] for r in range(ch) for c in range(cw)))
    v = bytes(bytearray(vp[r*US + c] for r in range(ch) for c in range(cw)))
    return W, H, y, u, v

def fnv64(b):
    h = 0xcbf29ce484222325
    for x in b:
        h = ((h ^ x) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h

def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) & (2**64-1)
        yield (s >> 33) & 0xFF

def img_grad(w, h):
    return bytes(bytearray(v for yy in range(h) for xx in range(w)
        for v in ((xx*255)//max(w-1,1), (yy*255)//max(h-1,1), ((xx+yy)*255)//max(w+h-2,1))))

def img_noise(w, h, seed=7):
    g = lcg(seed)
    return bytes(bytearray(next(g) for _ in range(w*h*3)))

def img_edges(w, h):
    out = bytearray()
    for yy in range(h):
        for xx in range(w):
            v = 255 if ((xx//4 + yy//4) % 2 == 0) else 0
            d = 255 if (xx+yy) % 7 == 0 else v
            out += bytes((d, v, 255-v))
    return bytes(out)

def img_photo(w, h):
    import math
    out = bytearray()
    for yy in range(h):
        for xx in range(w):
            r = int(127 + 90*math.sin(xx*0.31) * math.cos(yy*0.17))
            g = int(127 + 70*math.sin((xx+yy)*0.11))
            b = int(127 + 100*math.cos(xx*0.07 - yy*0.23))
            out += bytes((max(0,min(255,r)), max(0,min(255,g)), max(0,min(255,b))))
    return bytes(out)

def img_flat(w, h):
    return bytes((90, 140, 200)) * (w*h)

os.makedirs('/tmp/vp8x/fixtures', exist_ok=True)
manifest = {}
cases = [
    ('flat_16x16_q75',  img_flat(16,16),   16, 16, 75),
    ('grad_64x48_q75',  img_grad(64,48),   64, 48, 75),
    ('grad_33x17_q50',  img_grad(33,17),   33, 17, 50),
    ('photo_64x64_q50', img_photo(64,64),  64, 64, 50),
    ('photo_80x56_q95', img_photo(80,56),  80, 56, 95),
    ('edges_48x48_q75', img_edges(48,48),  48, 48, 75),
    ('noise_32x32_q50', img_noise(32,32),  32, 32, 50),
    ('noise_48x32_q10', img_noise(48,32,9),48, 32, 10),
    ('photo_200x120_q75', img_photo(200,120), 200, 120, 75),
    ('edges_17x31_q95', img_edges(17,31),  17, 31, 95),
]
for name, rgb, w, h, q in cases:
    data = encode_rgb(rgb, w, h, q)
    W, H, y, u, v = decode_yuv(data)
    assert (W, H) == (w, h)
    open(f'/tmp/vp8x/fixtures/{name}.webp','wb').write(data)
    open(f'/tmp/vp8x/fixtures/{name}.y','wb').write(y)
    open(f'/tmp/vp8x/fixtures/{name}.u','wb').write(u)
    open(f'/tmp/vp8x/fixtures/{name}.v','wb').write(v)
    manifest[name] = dict(w=W, h=H, size=len(data),
        fnv_y=fnv64(y), fnv_u=fnv64(u), fnv_v=fnv64(v))
    print(name, len(data), "bytes", manifest[name])

# python.webp — the real-artifact target
pw = None
import glob
for p in glob.glob('/root/.pyenv/versions/*/lib/python*/test/**/python.webp', recursive=True):
    pw = open(p,'rb').read(); break
if pw:
    W, H, y, u, v = decode_yuv(pw)
    open('/tmp/vp8x/fixtures/python.webp','wb').write(pw)
    open('/tmp/vp8x/fixtures/python.y','wb').write(y)
    open('/tmp/vp8x/fixtures/python.u','wb').write(u)
    open('/tmp/vp8x/fixtures/python.v','wb').write(v)
    manifest['python'] = dict(w=W, h=H, size=len(pw),
        fnv_y=fnv64(y), fnv_u=fnv64(u), fnv_v=fnv64(v))
    print('python.webp', manifest['python'])
json.dump(manifest, open('/tmp/vp8x/fixtures/manifest.json','w'), indent=1)
print("done")

# ---------------------------------------------------------------------------
# Addendum (same session): the fixtures pinned in Vp8InteropSpec also include
#  - simple-filter and extra-segment variants produced through the advanced
#    WebPConfig/WebPPicture/WebPEncode ctypes bindings (filter_type=1 is never
#    emitted by the simple WebPEncodeRGB API), and
#  - bypass_filtering=1 decodes (WebPDecoderConfig, MODE_YUV) captured as
#    .ny/.nu/.nv planes so the reconstruction and the loop filter are
#    certified separately.
# libwebp clamps config.partitions to one partition in practice, so the
# multi-partition decode path is certified in the other direction instead:
# tools/vp8_enc_groundtruth.py pins libwebp's decode of the in-repo Vp8Enc
# fixture encoder's two-partition streams.
