#!/usr/bin/env python3
"""Extract the VP8 normative probability/quantizer tables from the on-disk
public libwebp (BSD) shared library, cross-check the decoder and encoder
copies against each other, and emit a Scala data object.

Tables (names per RFC 6386):
  default_coef_probs  [4][8][3][11]  (libwebp CoeffsProba0, stored with the
                                      never-used [0][0] cell as all-128s)
  coef_update_probs   [4][8][3][11]  (libwebp CoeffsUpdateProba)
  kf_bmode_prob       [10][10][9]    (libwebp kBModesProba)
  ac_qlookup          u16[128]       (libwebp kAcTable)
  dc_qlookup          u8 [128]       (libwebp kDcTable)
  zigzag              [16]
  Pcat1..Pcat6        extra-bit probs
"""
import json, struct

so = open('/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5','rb').read()

def find_all(sig):
    out, i = [], 0
    while True:
        i = so.find(sig, i)
        if i < 0: return out
        out.append(i); i += 1

# anchor: first data row of coef probs {253,136,...}; each copy is preceded
# by the all-128 [0][0] cell (33 bytes)
anchors = find_all(bytes([253,136,254,255,228,219,128,128,128,128,128]))
assert len(anchors) == 2, anchors
copies = []
for a in anchors:
    start = a - 33
    assert so[start:a] == bytes([128]*33), "expected leading all-128 cell"
    copies.append(so[start:start+1056])
assert copies[0] == copies[1], "decoder/encoder coef-prob copies differ"
coef_probs = list(copies[0])

# kBModesProba directly before (900 bytes), found by its RFC-known row 0
bm = find_all(bytes([231,120,48,89,115,113,120,152,112]))
bmodes_copies = [so[i:i+900] for i in bm]
assert len(set(bmodes_copies)) == 1 and len(bmodes_copies) >= 1, bm
kf_bmode = list(bmodes_copies[0])

# quant tables: kAcTable u16[128] then kDcTable u8[128]
ac_at = find_all(b''.join(int.to_bytes(v,2,'little') for v in [4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21]))
assert ac_at, "ac table not found"
ac = list(struct.unpack('<128H', so[ac_at[0]:ac_at[0]+256]))
dc_at = find_all(bytes([4,5,6,7,8,9,10,10,11,12,13,14,15,16,17,17,18]))
assert dc_at, "dc table not found"
dc = list(so[dc_at[0]:dc_at[0]+128])
assert dc[-1] == 157 and ac[-1] == 284, (dc[-8:], ac[-8:])
assert all(b >= a for a, b in zip(dc, dc[1:]))
assert all(b >= a for a, b in zip(ac, ac[1:]))

# update probs: 1056 bytes ending 32-byte-aligned just before kBModesProba
upd_candidates = []
for b0 in bm:
    # search backwards for a 1056 region dense in >=239 bytes ending near b0
    for end in range(b0, b0-64, -1):
        seg = so[end-1056:end]
        if len(seg)==1056 and sum(1 for x in seg if x>=239) > 1000 and seg[0] in (255,250,249,251,246,247,252,253,254,248):
            upd_candidates.append(bytes(seg)); break
assert len(upd_candidates) >= 1 and len(set(upd_candidates)) == 1, [len(upd_candidates)]
upd = list(upd_candidates[0])

# zigzag + cat tables (single copy near decoder tables)
zz_at = find_all(bytes([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15]))
assert zz_at
cat6_at = find_all(bytes([254,254,243,230,196,177,153,140,133,130,129]))
assert cat6_at
c = cat6_at[0]
cat6 = list(so[c:c+11])
cat5 = list(so[c+12:c+17])
cat4 = list(so[c+18:c+22])
cat3 = list(so[c+23:c+26])
assert cat5 == [180,157,141,134,130] and cat4 == [176,155,140,135] and cat3 == [173,148,140], (cat5,cat4,cat3)

out = {
  'coef_probs': coef_probs,       # 1056, flattened [t][b][c][p], cell (0,0) all-128
  'coef_update_probs': upd,       # 1056, same layout
  'kf_bmode_prob': kf_bmode,      # 900, [10][10][9]
  'ac_q': ac, 'dc_q': dc,
  'cat3': cat3, 'cat4': cat4, 'cat5': cat5, 'cat6': cat6,
}
json.dump(out, open('/tmp/vp8x/tables.json','w'))
print("update probs row0:", upd[:11])
print("update probs row95:", upd[-11:])
print("bmode rows:", kf_bmode[:9], kf_bmode[-9:])
print("dc head/tail:", dc[:8], dc[-4:])
print("ac head/tail:", ac[:8], ac[-4:])
print("coef row1 (first data):", coef_probs[33:44])
print("OK — all copies cross-checked")
