#!/usr/bin/env python3
"""Extract the CCITT T.4 white/black run-length code tables from the
on-disk public libtiff shared library and emit them as Scala data —
the Vp8Tables recipe applied to fax compression: hand-transcribing
~1.2 KB of tabulated normative data is exactly the recall hazard the
MP3 B.7 experiment measured, so the tables are machine-read from
/usr/lib/x86_64-linux-gnu/libtiff.so.6 (libtiff license, public) and
validated structurally here, then differentially against libtiff's own
codec end-to-end (tools/ccitt_gen_fixtures.py -> CcittInteropSpec).

The binary is stripped, so the tables are located by STRUCTURE, not
symbol: libtiff's encoder tables (tif_fax3.c TIFFFaxWhiteCodes /
TIFFFaxBlackCodes) are arrays of {u16 bit-length; u16 code (MSB-first,
right-aligned); i16 run} entries whose run column is exactly
0,1,...,63 (terminals) then 64,128,...,2560 (makeups incl. the shared
extended set). A scan for that signature finds exactly two arrays —
white (run 0 = len 8, code 0x35) and black (run 0 = len 10, code 0x37).

Validation before emitting:
  - each table has 64 terminals + 40 makeups, runs as above;
  - each table is prefix-free;
  - Kraft sum is exactly 255/256 (the missing 2^-8 is the 00000000
    prefix reserved for EOL/fill), for BOTH tables.
"""
import struct, sys

SO = '/usr/lib/x86_64-linux-gnu/libtiff.so.6'
b = open(SO, 'rb').read()

def scan():
    hits = []
    for off in range(0, len(b) - 6 * 104, 2):
        if all(struct.unpack_from('<HHh', b, off + 6 * r)[2] == r and
               1 <= struct.unpack_from('<HHh', b, off + 6 * r)[0] <= 14
               for r in range(64)):
            hits.append(off)
    return hits

def table(off):
    out = []
    for k in range(104):
        ln, code, run = struct.unpack_from('<HHh', b, off + 6 * k)
        out.append((ln, code, run))
    return out

def validate(t, name):
    assert [e[2] for e in t[:64]] == list(range(64)), name
    assert [e[2] for e in t[64:]] == [64 * k for k in range(1, 41)], name
    bits = [format(code, '0%db' % ln) for ln, code, _ in t]
    assert len(set(bits)) == 104, name + ': duplicate codes'
    for a in bits:
        for c in bits:
            assert a == c or not c.startswith(a), name + ': not prefix-free'
    kraft = sum(2 ** -ln for ln, _, _ in t)
    assert abs(kraft - 255 / 256) < 1e-12, '%s: kraft %r' % (name, kraft)

hits = scan()
assert len(hits) == 2, 'expected exactly two T.4 tables, got %r' % hits
tabs = {}
for off in hits:
    t = table(off)
    if t[0][:2] == (8, 0x35):
        tabs['white'] = (off, t)
    elif t[0][:2] == (10, 0x37):
        tabs['black'] = (off, t)
assert set(tabs) == {'white', 'black'}, tabs.keys()
for name, (off, t) in tabs.items():
    validate(t, name)
    print('// %s table at 0x%x in %s' % (name, off, SO), file=sys.stderr)

def emit(name, t):
    flat = [v for e in t for v in e]
    print('  /** %s: 104 x (bitLength, code MSB-first right-aligned, run). */'
          % name)
    print('  val %s: Array[Int] = Array(' % name)
    row = []
    for i in range(0, len(flat), 12):
        row.append('    ' + ', '.join(str(v) for v in flat[i:i + 12]))
    print(',\n'.join(row))
    print('  )')

emit('whiteCodes', tabs['white'][1])
emit('blackCodes', tabs['black'][1])
