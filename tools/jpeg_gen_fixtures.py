#!/usr/bin/env python3
"""JPEG differential fixtures against the on-disk public libjpeg
(/usr/lib/x86_64-linux-gnu/libjpeg.so.62, libjpeg-turbo 2.1.5 with the
classic 6.2 ABI): encode deterministic images with libjpeg itself
(baseline + progressive, gray / 4:4:4 / 4:2:0, quality 25..95, odd
dims), decode them back with libjpeg's own islow path, and print the
Scala fixture table (jpeg hex + reference plane hex) that
JpegInteropSpec pins. The repo's pure decoder must land within ±1 of
libjpeg on every sample — upgrading the ImageIO cross-check to a
pinned external-library certificate, progressive scans included.

ABI discipline (the binary is driven through ctypes, so no header):
  - struct sizes for jpeg_CreateCompress/Decompress are found by
    SUBPROCESS PROBE (the library exits on a size mismatch);
  - the few struct fields written (image_width/height/components/
    colorspace on the compress side) sit at the stable classic-ABI
    offsets, and every write is VALIDATED end-to-end: the emitted SOF
    is parsed back for dims/sampling, and read_header's image_width
    field must echo the encoded width before any decompress field is
    trusted;
  - 4:4:4 is produced by locating comp_info via its (id=1, index=0,
    h=2, v=2 defaults) check, then validated by SOF sampling factors;
  - do_fancy_upsampling (offset 100, after validating image_width@48,
    scale@68/72, buffered_image@88) is cleared for the 4:2:0 fixtures:
    the repo decoder upsamples by replication, so the reference must
    too — with it, remaining differences are IDCT-only (±1).
"""
import ctypes, subprocess, sys

SO = '/usr/lib/x86_64-linux-gnu/libjpeg.so.62'
J = ctypes.CDLL(SO)
J.jpeg_std_error.restype = ctypes.c_void_p
J.jpeg_std_error.argtypes = [ctypes.c_void_p]
for f, a in [
    ('jpeg_CreateCompress', [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]),
    ('jpeg_CreateDecompress', [ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]),
    ('jpeg_mem_dest', [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]),
    ('jpeg_mem_src', [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_ulong]),
    ('jpeg_set_defaults', [ctypes.c_void_p]),
    ('jpeg_set_quality', [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]),
    ('jpeg_simple_progression', [ctypes.c_void_p]),
    ('jpeg_start_compress', [ctypes.c_void_p, ctypes.c_int]),
    ('jpeg_write_scanlines', [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint]),
    ('jpeg_finish_compress', [ctypes.c_void_p]),
    ('jpeg_destroy_compress', [ctypes.c_void_p]),
    ('jpeg_read_header', [ctypes.c_void_p, ctypes.c_int]),
    ('jpeg_start_decompress', [ctypes.c_void_p]),
    ('jpeg_read_scanlines', [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint]),
    ('jpeg_finish_decompress', [ctypes.c_void_p]),
    ('jpeg_destroy_decompress', [ctypes.c_void_p]),
]:
    getattr(J, f).argtypes = a
    getattr(J, f).restype = ctypes.c_int

PROBE = ("import ctypes;J=ctypes.CDLL('%s');"
         "J.jpeg_std_error.restype=ctypes.c_void_p;"
         "e=ctypes.create_string_buffer(1024);c=ctypes.create_string_buffer(4096);"
         "ctypes.cast(c,ctypes.POINTER(ctypes.c_void_p))[0]=J.jpeg_std_error(e);"
         "J.%s(c,62,%d);print('ok')" % (SO, '%s', 0))

def probe_size(create_fn):
    for size in range(320, 1600, 8):
        src = ("import ctypes;J=ctypes.CDLL('%s');"
               "J.jpeg_std_error.restype=ctypes.c_void_p;"
               "e=ctypes.create_string_buffer(1024);"
               "c=ctypes.create_string_buffer(8192);"
               "ctypes.cast(c,ctypes.POINTER(ctypes.c_void_p))[0]="
               "J.jpeg_std_error(e);"
               "J.%s(c,62,%d)" % (SO, create_fn, size))
        r = subprocess.run([sys.executable, '-c', src],
                           capture_output=True)
        if r.returncode == 0:
            return size
    raise SystemExit('no struct size found for ' + create_fn)

CSIZE = probe_size('jpeg_CreateCompress')
DSIZE = probe_size('jpeg_CreateDecompress')
print('// sizeof(compress)=%d sizeof(decompress)=%d' % (CSIZE, DSIZE),
      file=sys.stderr)

def u32(buf, off):
    return ctypes.cast(ctypes.byref(buf, off),
                       ctypes.POINTER(ctypes.c_uint32))[0]

def setu32(buf, off, v):
    ctypes.cast(ctypes.byref(buf, off),
                ctypes.POINTER(ctypes.c_uint32))[0] = v

def new_cinfo(size, create):
    err = ctypes.create_string_buffer(1024)
    c = ctypes.create_string_buffer(size + 64)
    ctypes.cast(c, ctypes.POINTER(ctypes.c_void_p))[0] = J.jpeg_std_error(err)
    create(c, 62, size)
    return c, err  # keep err alive

def parse_sof(data):
    """(progressive, [(h,v)...], w, h) from the first SOF marker."""
    i = 2
    while i + 4 <= len(data):
        assert data[i] == 0xFF
        m = data[i + 1]
        ln = (data[i + 2] << 8) | data[i + 3]
        if m in (0xC0, 0xC1, 0xC2):
            h = (data[i + 5] << 8) | data[i + 6]
            w = (data[i + 7] << 8) | data[i + 8]
            n = data[i + 9]
            samp = []
            for k in range(n):
                b = data[i + 10 + 3 * k + 1]
                samp.append((b >> 4, b & 15))
            return m == 0xC2, samp, w, h
        i += 2 + ln
    raise AssertionError('no SOF')

def compress(pix, w, h, gray, quality, progressive, force444):
    c, err = new_cinfo(CSIZE, J.jpeg_CreateCompress)
    outp = ctypes.c_void_p(0)
    outn = ctypes.c_ulong(0)
    J.jpeg_mem_dest(c, ctypes.byref(outp), ctypes.byref(outn))
    setu32(c, 48, w); setu32(c, 52, h)
    setu32(c, 56, 1 if gray else 3)
    setu32(c, 60, 1 if gray else 2)  # JCS_GRAYSCALE / JCS_RGB
    J.jpeg_set_defaults(c)
    assert u32(c, 48) == w and u32(c, 52) == h, 'compress offsets invalid'
    if force444 and not gray:
        # classic-ABI anchor fields validate the layout before the one
        # pointer deref: num_components@76 == 3, jpeg_color_space@80 ==
        # 3 (JCS_YCbCr) after set_defaults; comp_info is the next
        # pointer-aligned field (@88), and its first component must show
        # the (id=1, idx=0, h=2, v=2) defaults before we touch it
        assert u32(c, 76) == 3 and u32(c, 80) == 3, 'compress ABI anchors'
        ptr = ctypes.cast(ctypes.byref(c, 88),
                          ctypes.POINTER(ctypes.c_void_p))[0]
        assert ptr and ptr % 8 == 0, 'comp_info pointer'
        vals = ctypes.cast(ctypes.c_void_p(ptr), ctypes.POINTER(ctypes.c_int32))
        # (component_index is only set at start_compress — not checked)
        assert (vals[0], vals[2], vals[3]) == (1, 2, 2), 'comp_info signature'
        vals[2] = 1
        vals[3] = 1
    J.jpeg_set_quality(c, quality, 1)
    if progressive:
        J.jpeg_simple_progression(c)
    J.jpeg_start_compress(c, 1)
    stride = w * (1 if gray else 3)
    for y in range(h):
        row = ctypes.create_string_buffer(bytes(pix[y * stride:(y + 1) * stride]),
                                          stride)
        rp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
        assert J.jpeg_write_scanlines(c, rp, 1) == 1
    J.jpeg_finish_compress(c)
    J.jpeg_destroy_compress(c)
    data = ctypes.string_at(outp, outn.value)
    prog, samp, sw, sh = parse_sof(data)
    assert (sw, sh) == (w, h) and prog == progressive, 'SOF echo failed'
    if gray:
        assert samp == [(1, 1)]
    elif force444:
        assert samp == [(1, 1), (1, 1), (1, 1)], samp
    else:
        assert samp == [(2, 2), (1, 1), (1, 1)], samp
    return data

def decompress(data, w, h, gray, plain_upsample):
    c, err = new_cinfo(DSIZE, J.jpeg_CreateDecompress)
    J.jpeg_mem_src(c, data, len(data))
    assert J.jpeg_read_header(c, 1) == 1
    # validate the classic-ABI decompress offsets before trusting them
    assert u32(c, 48) == w and u32(c, 52) == h, 'decompress offsets invalid'
    assert u32(c, 68) == 1 and u32(c, 72) == 1, 'scale offsets invalid'
    assert u32(c, 88) == 0, 'buffered_image offset invalid'
    if plain_upsample:
        setu32(c, 100, 0)  # do_fancy_upsampling = FALSE (replication)
    J.jpeg_start_decompress(c)
    stride = w * (1 if gray else 3)
    out = bytearray()
    row = ctypes.create_string_buffer(stride + 16)
    rp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
    for y in range(h):
        assert J.jpeg_read_scanlines(c, rp, 1) == 1
        out += row.raw[:stride]
    J.jpeg_finish_decompress(c)
    J.jpeg_destroy_decompress(c)
    return bytes(out)

M64 = (1 << 64) - 1

def lcg(seed):
    s = seed & M64
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) & M64
        yield (s >> 33) & 0xFF

def image(w, h, ch, seed):
    """Gradient + bounded noise — photographic-ish, deterministic."""
    r = lcg(seed)
    pix = bytearray(w * h * ch)
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                base = (x * 5 + y * 7 + c * 40) % 256
                pix[(y * w + x) * ch + c] = (base + next(r) % 32) % 256
    return bytes(pix)

FIXTURES = [
    # name, w, h, gray, quality, progressive, force444
    ('gray_base_q85', 41, 23, True, 85, False, False),
    ('gray_prog_q75', 48, 32, True, 75, True, False),
    ('rgb444_base_q90', 41, 23, False, 90, False, True),
    ('rgb444_prog_q80', 33, 17, False, 80, True, True),
    ('rgb444_q95_odd', 17, 9, False, 95, False, True),
    ('rgb420_base_q85', 48, 32, False, 85, False, False),
    ('rgb420_prog_q60', 41, 23, False, 60, True, False),
    ('rgb420_lowq_q25', 32, 24, False, 25, False, False),
]

def hexlit(data, indent='      '):
    hx = data.hex()
    lines = [hx[i:i + 72] for i in range(0, len(hx), 72)]
    return (' +\n' + indent).join('"%s"' % l for l in lines)

print('  // (name, w, h, channels, jpegHex, libjpegPlanesHex)')
print('  private val fixtures = Seq(')
rows = []
for name, w, h, gray, q, prog, f444 in FIXTURES:
    ch = 1 if gray else 3
    pix = image(w, h, ch, len(name) * 7919 + w)
    data = compress(pix, w, h, gray, q, prog, f444)
    # 4:2:0 references use replication upsampling (the repo decoder's
    # documented method); gray/4:4:4 have no upsampling step at all
    ref = decompress(data, w, h, gray, plain_upsample=not gray and not f444)
    rows.append('    ("%s", %d, %d, %d,\n      %s,\n      %s)'
                % (name, w, h, ch, hexlit(data), hexlit(ref)))
    print('// %s: %d jpeg bytes' % (name, len(data)), file=sys.stderr)
print(',\n'.join(rows))
print('  )')
