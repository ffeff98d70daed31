#!/usr/bin/env python3
"""Hand-craft an uncompressed little-endian 64-BIT sas7bdat, validated
with pandas.read_sas."""
import struct, sys

MAGIC = bytes([
    0x00,0x00,0x00,0x00,0x00,0x00,0x00,0x00,
    0x00,0x00,0x00,0x00,0xc2,0xea,0x81,0x60,
    0xb3,0x14,0x11,0xcf,0xbd,0x92,0x08,0x00,
    0x09,0xc7,0x31,0x8c,0x18,0x1f,0x10,0x11])

HEADER_LEN = 1024
PAGE_LEN = 8192
ALIGN1 = 4

rows = [(10.0, b"first   ", 1.5), (20.0, b"second  ", 2.5), (30.0, b"third   ", -4.75)]
ROW_LEN = 24
NCOLS = 3
NROWS = len(rows)

def u16(v): return struct.pack("<H", v)
def u32(v): return struct.pack("<I", v)
def u64(v): return struct.pack("<Q", v)
def f64(v): return struct.pack("<d", v)

hdr = bytearray(HEADER_LEN)
hdr[0:32] = MAGIC
hdr[32] = 0x33          # '3' => 64-bit
hdr[35] = 0x33          # '3' => align1 = 4
hdr[37] = 0x01          # little-endian
hdr[70] = 20            # utf-8
hdr[92:156] = b"GRAFT64".ljust(64, b" ")
hdr[156:164] = b"DATA".ljust(8, b" ")
hdr[164+ALIGN1:172+ALIGN1] = f64(0.0)
hdr[172+ALIGN1:180+ALIGN1] = f64(0.0)
hdr[196+ALIGN1:200+ALIGN1] = u32(HEADER_LEN)
hdr[200+ALIGN1:204+ALIGN1] = u32(PAGE_LEN)
hdr[204+ALIGN1:212+ALIGN1] = u64(1)

# column text payload: [u16 size][pad][names]
names_blob = b"\x00\x00" + b"ID\x00\x00NAME\x00\x00\x00\x00SCORE\x00\x00\x00"
text_size = 2 + len(names_blob)
coltext = b"\xfd\xff\xff\xff\xff\xff\xff\xff" + u16(text_size) + names_blob
while len(coltext) % 8: coltext += b"\x00"
NAME_OFFS = {"ID": (4, 2), "NAME": (8, 4), "SCORE": (16, 5)}

rowsize = bytearray(808)
rowsize[0:8] = b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00"
rowsize[40:48] = u64(ROW_LEN)     # 5 * int_len
rowsize[48:56] = u64(NROWS)       # 6 * int_len
rowsize[72:80] = u64(NCOLS)       # 9 * int_len (col_count_p1)
rowsize[80:88] = u64(0)           # 10 * int_len
rowsize[120:128] = u64(NROWS)     # 15 * int_len (mix page rows)
rowsize[682:684] = u16(0)         # lcs
rowsize[706:708] = u16(0)         # lcp

colsize = b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00" + u64(NCOLS) + b"\x00" * 12

cn = bytearray(8 + 8 * (NCOLS + 1) + 12)
cn[0:8] = b"\xff" * 8
for i, nm in enumerate(["ID", "NAME", "SCORE"]):
    off, ln = NAME_OFFS[nm]
    base = 8 + 8 * (i + 1)
    cn[base:base+2] = u16(0)
    cn[base+2:base+4] = u16(off)
    cn[base+4:base+6] = u16(ln)

# attrs u64: entry i: u64 rowoffset @16+16i, u32 width @24+16i, u8 type @30+16i
ca = bytearray(16 + 16 * NCOLS + 12)
ca[0:8] = b"\xfc\xff\xff\xff\xff\xff\xff\xff"
attrs = [(0, 8, 1), (8, 8, 2), (16, 8, 1)]
for i, (off, w, t) in enumerate(attrs):
    ca[16+16*i:24+16*i] = u64(off)
    ca[24+16*i:28+16*i] = u32(w)
    ca[30+16*i] = t

def fmt_subheader():
    b = bytearray(64)
    b[0:8] = b"\xfe\xfb\xff\xff\xff\xff\xff\xff"
    return bytes(b)
subheaders = [bytes(rowsize), bytes(colsize), bytes(coltext), bytes(cn), bytes(ca)] \
    + [fmt_subheader() for _ in range(NCOLS)]

page = bytearray(PAGE_LEN)
BIT_OFF = 32
PTR_LEN = 24
nsub = len(subheaders)
page[BIT_OFF+0:BIT_OFF+2] = u16(512)   # mix
page[BIT_OFF+4:BIT_OFF+6] = u16(nsub)
ptr_area = BIT_OFF + 8
cur_end = PAGE_LEN
offsets = []
for sh in subheaders:
    cur_end -= len(sh)
    offsets.append(cur_end)
for i, (sh, off) in enumerate(zip(subheaders, offsets)):
    page[off:off+len(sh)] = sh
    base = ptr_area + PTR_LEN * i
    page[base:base+8] = u64(off)
    page[base+8:base+16] = u64(len(sh))
    page[base+16] = 0
    page[base+17] = 0

data_start = ptr_area + PTR_LEN * nsub
data_start += data_start % 8
for r, (idv, nm, sc) in enumerate(rows):
    base = data_start + ROW_LEN * r
    page[base:base+8] = f64(idv)
    page[base+8:base+16] = nm
    page[base+16:base+24] = f64(sc)
page[BIT_OFF+2:BIT_OFF+4] = u16(nsub + NROWS)

out = sys.argv[1] if len(sys.argv) > 1 else "testfiles/sample64.sas7bdat"
with open(out, "wb") as f:
    f.write(hdr)
    f.write(page)
print("wrote", out)

import pandas as pd
df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
print(df)
print(df.dtypes)
