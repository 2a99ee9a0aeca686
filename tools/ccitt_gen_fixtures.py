#!/usr/bin/env python3
"""CCITT differential certification against the on-disk public libtiff
(/usr/lib/x86_64-linux-gnu/libtiff.so.6) — both directions, the
vp8_gen_fixtures/vp8_enc_groundtruth recipe applied to fax compression:

  gen        libtiff ENCODES deterministic bilevel rasters (the same
             LCG/pattern generators as CcittSpec/CcittInteropSpec) into
             MH/G3-1D/G3-2D/fill/G4/FillOrder2/multi-strip TIFFs, decodes
             them back with its own TIFFReadScanline, and prints the
             Scala fixture table (name, file hex, raster FNV) pinned in
             CcittInteropSpec — streams a foreign implementation
             produced, which the repo decoder must match bit-exact.

  check-enc  reads the repo encoder's buildBilevel outputs (written to
             /tmp/ccittx/enc by `sbt "runMain graft.tools.CcittEmit"`),
             decodes each with libtiff, verifies the raster equals the
             deterministic source bitmap, and prints the FNV pins of the
             encoder bytes embedded as `encPins` — certifying the
             ENCODER against an implementation that has never seen it.
"""
import ctypes, glob, os, sys

t = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libtiff.so.6')
t.TIFFOpen.restype = ctypes.c_void_p
t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
t.TIFFSetField.restype = ctypes.c_int
# variadic: declare the fixed prefix so the 64-bit handle is not truncated
t.TIFFSetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
t.TIFFWriteScanline.restype = ctypes.c_int
t.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_uint32, ctypes.c_uint16]
t.TIFFReadScanline.restype = ctypes.c_int
t.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_uint32, ctypes.c_uint16]
t.TIFFClose.restype = None
t.TIFFClose.argtypes = [ctypes.c_void_p]

TAG = dict(W=256, H=257, BITS=258, COMP=259, PHOTO=262, FILLORDER=266,
           SPP=277, RPS=278, G3OPTS=292)

M64 = (1 << 64) - 1

def lcg(seed):
    s = seed & M64
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) & M64
        yield (s >> 33) & 0xFF

def bitmap(w, h, kind, seed):
    bm = bytearray(w * h)
    if kind == 'solid-black':
        for i in range(w * h):
            bm[i] = 1
    elif kind == 'speckle':
        r = lcg(seed)
        for i in range(w * h):
            bm[i] = 1 if next(r) < 60 else 0
    elif kind == 'runs':
        r = lcg(seed)
        for y in range(h):
            x = 0
            black = False
            while x < w:
                run = 1 + next(r) % 17
                for _ in range(run):
                    if x >= w:
                        break
                    bm[y * w + x] = 1 if black else 0
                    x += 1
                black = not black
    elif kind == 'vstripes':
        for i in range(w * h):
            bm[i] = (i % w // 3) & 1
    return bytes(bm)

def pack_row(bm, w, y):
    row = bytearray((w + 7) // 8)
    for x in range(w):
        if bm[y * w + x]:
            row[x >> 3] |= 0x80 >> (x & 7)
    return bytes(row)

def fnv64(b):
    hsh = 0xcbf29ce484222325
    for x in b:
        hsh = ((hsh ^ x) * 0x100000001b3) & M64
    return hsh

def write_tiff(path, bm, w, h, comp, g3opts=None, fillorder=None, rps=None):
    tif = t.TIFFOpen(path.encode(), b'w')
    assert tif, path
    t.TIFFSetField(tif, TAG['W'], ctypes.c_uint32(w))
    t.TIFFSetField(tif, TAG['H'], ctypes.c_uint32(h))
    t.TIFFSetField(tif, TAG['BITS'], ctypes.c_int(1))
    t.TIFFSetField(tif, TAG['SPP'], ctypes.c_int(1))
    t.TIFFSetField(tif, TAG['PHOTO'], ctypes.c_int(0))
    t.TIFFSetField(tif, TAG['COMP'], ctypes.c_int(comp))
    if g3opts is not None:
        t.TIFFSetField(tif, TAG['G3OPTS'], ctypes.c_uint32(g3opts))
    if fillorder is not None:
        t.TIFFSetField(tif, TAG['FILLORDER'], ctypes.c_int(fillorder))
    t.TIFFSetField(tif, TAG['RPS'], ctypes.c_uint32(rps if rps else h))
    for y in range(h):
        assert t.TIFFWriteScanline(tif, pack_row(bm, w, y), y, 0) == 1, (path, y)
    t.TIFFClose(tif)

def read_tiff(path, w, h):
    tif = t.TIFFOpen(path.encode(), b'r')
    assert tif, path
    out = bytearray(w * h)
    buf = ctypes.create_string_buffer((w + 7) // 8 + 8)
    for y in range(h):
        assert t.TIFFReadScanline(tif, buf, y, 0) == 1, (path, y)
        for x in range(w):
            if buf.raw[x >> 3] & (0x80 >> (x & 7)):
                out[y * w + x] = 1
    t.TIFFClose(tif)
    return bytes(out)

FIXTURES = [
    # name,            kind,          w,    h, comp, g3opts, fillorder, rps
    ('mh_runs_61x9',    'runs',       61,   9, 2, None, None, None),
    ('g31d_runs_61x9',  'runs',       61,   9, 3, 0,    None, None),
    ('g31d_fill_v_61x9', 'vstripes',  61,   9, 3, 4,    None, None),
    ('g32d_runs_64x16', 'runs',       64,  16, 3, 1,    None, None),
    ('g32d_fill_sp_61x9', 'speckle',  61,   9, 3, 5,    None, None),
    ('g4_runs_61x9',    'runs',       61,   9, 4, None, None, None),
    ('g4_speckle_64x16', 'speckle',   64,  16, 4, None, None, None),
    ('g4_wide_2800x4',  'runs',     2800,   4, 4, None, None, None),
    ('g4_black_40x7',   'solid-black', 40,  7, 4, None, None, None),
    ('g4_strips_64x16', 'runs',       64,  16, 4, None, None, 5),
    ('g4_lsb_runs_61x9', 'runs',      61,   9, 4, None, 2,    None),
]

def gen():
    d = '/tmp/ccittx/fixtures'
    os.makedirs(d, exist_ok=True)
    print('  // (name, w, h, compression, t4Options, fileHex, rasterFnv)')
    print('  private val fixtures = Seq(')
    rows = []
    for name, kind, w, h, comp, g3opts, fillorder, rps in FIXTURES:
        bm = bitmap(w, h, kind, w * 1000 + h)
        path = os.path.join(d, name + '.tif')
        write_tiff(path, bm, w, h, comp, g3opts, fillorder, rps)
        back = read_tiff(path, w, h)
        assert back == bm, name + ': libtiff roundtrip mismatch'
        data = open(path, 'rb').read()
        hx = data.hex()
        lines = [hx[i:i + 72] for i in range(0, len(hx), 72)]
        lit = ' +\n      '.join('"%s"' % l for l in lines)
        rows.append('    ("%s", %d, %d, %d, %dL,\n      %s,\n      0x%xL)'
                    % (name, w, h, comp, (g3opts or 0), lit, fnv64(bm)))
    print(',\n'.join(rows))
    print('  )')

def check_enc():
    ok = 0
    print('  private val encPins = Seq(')
    rows = []
    for path in sorted(glob.glob('/tmp/ccittx/enc/*.tif')):
        name = os.path.basename(path)[:-4]
        # name encodes kind_w_h_comp_t4opts
        kind, w, h, comp, t4 = name.rsplit('_', 4)
        w, h, comp, t4 = int(w), int(h), int(comp), int(t4)
        bm = bitmap(w, h, kind, w * 1000 + h)
        back = read_tiff(path, w, h)
        assert back == bm, name + ': libtiff decode of repo encoder differs'
        data = open(path, 'rb').read()
        rows.append('    ("%s", %d, %d, %d, %d, 0x%xL)'
                    % (kind, w, h, comp, t4, fnv64(data)))
        ok += 1
    print(',\n'.join(rows))
    print('  )')
    print('// libtiff decoded %d repo-encoder files bit-exact' % ok,
          file=sys.stderr)

if __name__ == '__main__':
    {'gen': gen, 'check-enc': check_enc}[sys.argv[1]]()
