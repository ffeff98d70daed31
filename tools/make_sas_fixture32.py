#!/usr/bin/env python3
"""Hand-craft an uncompressed little-endian 32-bit sas7bdat file per the
public format description (Shotwell's sas7bdat.pdf / pandas' parser),
then validate with pandas.read_sas as an independent oracle."""
import struct, sys

MAGIC = bytes([
    0x00,0x00,0x00,0x00,0x00,0x00,0x00,0x00,
    0x00,0x00,0x00,0x00,0xc2,0xea,0x81,0x60,
    0xb3,0x14,0x11,0xcf,0xbd,0x92,0x08,0x00,
    0x09,0xc7,0x31,0x8c,0x18,0x1f,0x10,0x11])

HEADER_LEN = 1024
PAGE_LEN = 4096

rows = [
    (1.0, b"alpha   ", 10.5),
    (2.0, b"beta    ", -3.25),
    (3.0, b"gamma   ", 99.0),
    (4.0, b"delta   ", 0.125),
    (5.0, b"epsilon ", 7.75),
]
# row layout: id double(8) @0, name char(8) @8, score double(8) @16
ROW_LEN = 24
NCOLS = 3
NROWS = len(rows)

def u16(v): return struct.pack("<H", v)
def u32(v): return struct.pack("<I", v)
def f64(v): return struct.pack("<d", v)

# ---------- header ----------
hdr = bytearray(HEADER_LEN)
hdr[0:32] = MAGIC
hdr[32] = 0x22          # not '3' => 32-bit, align2=0
hdr[35] = 0x22          # not '3' => align1=0
hdr[37] = 0x01          # little-endian
hdr[70] = 20            # encoding: utf-8 (pandas: 20 -> utf-8)
name = b"GRAFT".ljust(64, b" ")
hdr[92:156] = name      # dataset name
hdr[156:164] = b"DATA".ljust(8, b" ")
hdr[164:172] = f64(0.0) # created
hdr[172:180] = f64(0.0) # modified
hdr[196:200] = u32(HEADER_LEN)
hdr[200:204] = u32(PAGE_LEN)
hdr[204:208] = u32(1)   # page count
hdr[216:224] = b"9.0401M2"
hdr[224:240] = b"Linux".ljust(16, b" ")

# ---------- subheaders ----------
# column text payload: [u16 size][2 pad][names...]
names_blob = b"\x00\x00" + b"ID\x00\x00NAME\x00\x00\x00\x00SCORE\x00\x00\x00"
# offsets within payload (incl. the u16 size prefix = 2 bytes at start)
# payload = u16(size) + names_blob
# name offsets: ID at 4, NAME at 8, SCORE at 16 (relative to payload start)
text_payload = names_blob
text_size = 2 + len(text_payload)          # size field counts itself? use total
coltext = b"\xfd\xff\xff\xff" + u16(text_size) + text_payload
# pad to multiple of 4
while len(coltext) % 4: coltext += b"\x00"

NAME_OFFS = {"ID": (4, 2), "NAME": (8, 4), "SCORE": (16, 5)}

rowsize = bytearray(480)
rowsize[0:4] = b"\xf7\xf7\xf7\xf7"
rowsize[20:24] = u32(ROW_LEN)      # offset + 5*int_len
rowsize[24:28] = u32(NROWS)        # offset + 6*int_len
rowsize[36:40] = u32(NCOLS)        # col_count_p1 (split across 2 fields)
rowsize[40:44] = u32(0)            # col_count_p2
rowsize[60:64] = u32(NROWS)        # mix page row count
rowsize[354:356] = u16(0)          # lcs
rowsize[378:380] = u16(0)          # lcp

colsize = b"\xf6\xf6\xf6\xf6" + u32(NCOLS) + b"\x00" * 12

# column name subheader: entries read at sig(4) + 8*(i+1):
# u16 text-block idx, u16 name offset, u16 name length, u16 pad
cn = bytearray(4 + 8 * (NCOLS + 1) + 12)
cn[0:4] = b"\xff\xff\xff\xff"
for i, nm in enumerate(["ID", "NAME", "SCORE"]):
    off, ln = NAME_OFFS[nm]
    base = 4 + 8 * (i + 1)
    cn[base:base+2] = u16(0)
    cn[base+2:base+4] = u16(off)
    cn[base+4:base+6] = u16(ln)

# column attributes: entry i: u32 rowoffset @12+12i, u32 width @16+12i,
# u8 type @22+12i  (pandas: offset+int_len+8+i*12 etc.)
ca = bytearray(12 + 12 * NCOLS + 8)
ca[0:4] = b"\xfc\xff\xff\xff"
attrs = [(0, 8, 1), (8, 8, 2), (16, 8, 1)]  # (row offset, width, type 1=num 2=char)
for i, (off, w, t) in enumerate(attrs):
    ca[12 + 12*i : 16 + 12*i] = u32(off)
    ca[16 + 12*i : 20 + 12*i] = u32(w)
    ca[22 + 12*i] = t

# one format subheader per column (pandas builds columns here)
def fmt_subheader():
    b = bytearray(48)
    b[0:4] = b"\xfe\xfb\xff\xff"
    # all format/label pointers zero-length into text block 0
    return bytes(b)
fmts = [fmt_subheader() for _ in range(NCOLS)]

subheaders = [bytes(rowsize), bytes(colsize), bytes(coltext), bytes(cn), bytes(ca)] + fmts

# ---------- page ----------
page = bytearray(PAGE_LEN)
BIT_OFF = 16
nsub = len(subheaders)
page[BIT_OFF+0:BIT_OFF+2] = u16(512)            # page type: mix
page[BIT_OFF+4:BIT_OFF+6] = u16(nsub)           # subheader count
PTR_LEN = 12
ptr_area = BIT_OFF + 8
# subheaders packed at the END of the page (standard layout)
cur_end = PAGE_LEN
offsets = []
for sh in subheaders:
    cur_end -= len(sh)
    offsets.append(cur_end)
for i, (sh, off) in enumerate(zip(subheaders, offsets)):
    page[off:off+len(sh)] = sh
    base = ptr_area + PTR_LEN * i
    page[base:base+4] = u32(off)
    page[base+4:base+8] = u32(len(sh))
    page[base+8] = 0    # compression
    page[base+9] = 0    # type

# data rows: after pointer area, 8-aligned
data_start = ptr_area + PTR_LEN * nsub
data_start += (8 - (data_start % 8)) % 8
for r, (idv, nm, sc) in enumerate(rows):
    base = data_start + ROW_LEN * r
    page[base:base+8] = f64(idv)
    page[base+8:base+16] = nm
    page[base+16:base+24] = f64(sc)
# block count = subheaders + data rows
page[BIT_OFF+2:BIT_OFF+4] = u16(nsub + NROWS)

out = sys.argv[1] if len(sys.argv) > 1 else "testfiles/sample.sas7bdat"
with open(out, "wb") as f:
    f.write(hdr)
    f.write(page)
print("wrote", out, HEADER_LEN + PAGE_LEN, "bytes; data_start", data_start,
      "sub offsets", offsets)

import pandas as pd
df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
print(df)
print(df.dtypes)
