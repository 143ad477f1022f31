#!/usr/bin/env python3
"""Extract the ISO 11172-3 Layer III Huffman code tables (Table B.7) and the
synthesis window (Table B.3) from system libraries, and emit
miotts_tpu/runtime/mp3_tables.py.

The Huffman codebooks and the 512-tap synthesis window are pure spec
constants (every encoder/decoder embeds the same data). This sandbox has no
copy of the standard, but it does ship libmp3lame (encoder: stores each
table's codeword array tXHB + codeword-length array tXl in .rodata) and
libmpg123 (decoder: stores the synthesis window base table). We locate the
arrays by their small leading tables (t1/t2/t3/t5 are well known), then
validate every parsed table structurally: the (code, length) pairs must
form a prefix-free code with Kraft sum exactly 1. Anything that fails
validation aborts the emit — a misparsed offset cannot silently ship.

The emitted module is then validated end-to-end by tests/test_mp3.py:
the numpy decoder must agree with BOTH independent system decoders
(mpg123, pygame's dr_mp3) on lame-encoded fixtures at all 9 sample rates.
"""
import sys
from pathlib import Path

import numpy as np

LAME = "/lib/x86_64-linux-gnu/libmp3lame.so.0"
MPG123 = "/lib/x86_64-linux-gnu/libmpg123.so.0"

# (name, xlen, ylen) in lame's declaration order; .rodata lays them out in
# reverse order ending with t1HB. Tables 17-23 reuse t16's codes and 25-31
# reuse t24's (only linbits differ); 0/4/14 carry no codes.
BIG_TABLES = [
    ("t1", 2, 2), ("t2", 3, 3), ("t3", 3, 3), ("t5", 4, 4), ("t6", 4, 4),
    ("t7", 6, 6), ("t8", 6, 6), ("t9", 6, 6), ("t10", 8, 8), ("t11", 8, 8),
    ("t12", 8, 8), ("t13", 16, 16), ("t15", 16, 16), ("t16", 16, 16),
    ("t24", 16, 16),
]

LINBITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
           1, 2, 3, 4, 6, 8, 10, 13, 4, 5, 6, 7, 8, 9, 11, 13]
# table id -> which codebook it uses
CODE_OF = {1: "t1", 2: "t2", 3: "t3", 5: "t5", 6: "t6", 7: "t7", 8: "t8",
           9: "t9", 10: "t10", 11: "t11", 12: "t12", 13: "t13", 15: "t15"}
CODE_OF.update({t: "t16" for t in range(16, 24)})
CODE_OF.update({t: "t24" for t in range(24, 32)})


def find_u16(u16: np.ndarray, pat: list[int]) -> int:
    p = np.array(pat, "<u2")
    hits = [i for i in range(len(u16) - len(p))
            if (u16[i:i + len(p)] == p).all()]
    if len(hits) != 1:
        raise SystemExit(f"pattern {pat[:6]}... hits={len(hits)} (need 1)")
    return hits[0]


def is_prefix_free(codes: list[tuple[int, int]]) -> bool:
    """codes: list of (hlen, code). Checks prefix-freeness and Kraft == 1."""
    kraft = sum(2.0 ** -l for l, _ in codes if l > 0)
    if abs(kraft - 1.0) > 1e-9:
        return False
    seen = []
    for l, c in codes:
        for l2, c2 in seen:
            a, b = (l, c), (l2, c2)
            if a[0] > b[0]:
                a, b = b, a
            if (b[1] >> (b[0] - a[0])) == a[1]:
                return False
        seen.append((l, c))
    return True


def main() -> int:
    so = Path(LAME).read_bytes()
    u16 = np.frombuffer(so, "<u2")
    u8 = np.frombuffer(so, np.uint8)

    # anchor: t2HB = codes of the spec's table 2 (verified small table)
    t2 = find_u16(u16, [1, 2, 1, 3, 1, 1, 3, 2, 0])

    # walk the HB arrays backwards from t2HB in declaration order
    # (declaration order t1..t24 is laid out back-to-front here). Arrays
    # are uint16, zero-padded to 16-byte boundaries between some entries;
    # we locate each by scanning back from the previous start.
    hb: dict[str, list[int]] = {}
    hb["t2"] = u16[t2:t2 + 9].tolist()
    hb["t1"] = u16[t2 + 12:t2 + 16].tolist()
    pos = t2  # scan cursor (u16 index), moving toward lower addresses
    order = ["t3", "t5", "t6", "t7", "t8", "t9", "t10", "t11", "t12",
             "t13", "t15", "t16", "t24"]
    sizes = {n: x * y for n, x, y in BIG_TABLES}
    for name in order:
        n = sizes[name]
        # arrays are emitted back-to-front, each 32-byte aligned with zero
        # padding up to the next array (a trailing 0 is a VALID codeword,
        # so zero-skipping cannot find boundaries — alignment can)
        start_b = ((pos * 2 - 2 * n) // 32) * 32
        start = start_b // 2
        hb[name] = [int(v) for v in u16[start:start + n]]
        pos = start
    # count1 tables sit below t24HB: t33HB then t32HB (sign-shifted codes)
    t32 = find_u16(u16, [1, 10, 8, 20, 12, 20, 16, 32,
                         14, 12, 24, 0, 28, 16, 24, 16])
    t33 = find_u16(u16, [15, 28, 26, 48, 22, 40, 36, 64,
                         14, 24, 20, 32, 12, 16, 8, 0])
    # un-shift the sign-bit room: code = stored >> popcount(nonzero quads)
    def quad_signs(i):
        return bin(i).count("1")

    cnt1A = [int(u16[t32 + i]) >> quad_signs(i) for i in range(16)]
    cnt1B = [int(u16[t33 + i]) >> quad_signs(i) for i in range(16)]
    if cnt1B != [15 - i for i in range(16)]:
        raise SystemExit(f"count1 B mismatch: {cnt1B}")

    # length arrays (uint8, include sign bits): locate each by validating
    # against its HB codes — unique offset where (len - signbits, code) is
    # a prefix-free complete code.
    lens: dict[str, list[int]] = {}
    lo = max(0, 2 * (pos - 1600))
    hi = 2 * (t2 + 64)
    region = u8[lo:hi]
    for name, xlen, ylen in BIG_TABLES:
        n = xlen * ylen
        codes = hb[name]
        found = []
        for off in range(len(region) - n):
            ls = region[off:off + n]
            if ls.min() < 1 or ls.max() > 21:
                continue
            pairs = []
            ok = True
            for i in range(n):
                x, y = i // ylen, i % ylen
                hlen = int(ls[i]) - (x > 0) - (y > 0)
                if hlen < 1 or codes[i] >> hlen:
                    ok = False
                    break
                pairs.append((hlen, codes[i]))
            if ok and is_prefix_free(pairs):
                found.append(off)
        if len(found) != 1:
            raise SystemExit(f"{name}: length array candidates={found}")
        ls = region[found[0]:found[0] + n]
        lens[name] = [int(ls[i]) - (i // ylen > 0) - (i % ylen > 0)
                      for i in range(n)]
        print(f"{name}: codes ok, maxlen={max(lens[name])}")
    # count1 A lengths likewise (signs = popcount of quad index)
    foundA = []
    for off in range(len(region) - 16):
        ls = region[off:off + 16]
        if ls.min() < 1 or ls.max() > 11:
            continue
        pairs = []
        ok = True
        for i in range(16):
            hlen = int(ls[i]) - quad_signs(i)
            if hlen < 1 or cnt1A[i] >> hlen:
                ok = False
                break
            pairs.append((hlen, cnt1A[i]))
        if ok and is_prefix_free(pairs):
            foundA.append(off)
    # dedupe identical byte runs
    uniq = {bytes(region[o:o + 16]) for o in foundA}
    if len(uniq) != 1:
        raise SystemExit(f"count1 A length candidates={foundA}")
    lsA = region[foundA[0]:foundA[0] + 16]
    cnt1A_len = [int(lsA[i]) - quad_signs(i) for i in range(16)]
    print(f"count1 A: lens={cnt1A_len}")

    # synthesis window base table from libmpg123 (int32 "intwinbase",
    # D[i]*65536 for the first half; full 512-tap window reconstructed by
    # the decoder). Locate by its leading ramp.
    mso = Path(MPG123).read_bytes()
    i64 = np.frombuffer(mso[:len(mso) // 8 * 8], "<i8")
    lead = np.array([0, -1, -1, -1, -1, -1, -1, -2, -2, -2, -2, -3], "<i8")
    hits = [i for i in range(len(i64) - 300)
            if (i64[i:i + 12] == lead).all()]
    win = None
    for h in hits:
        cand = i64[h:h + 257]
        if abs(int(cand[-1])) > 60000 and np.all(np.abs(cand) < 100000):
            win = [int(v) for v in cand]
            break
    if win is None:
        raise SystemExit(f"synthesis window not found (hits={hits})")
    print(f"synth window base: {len(win)} entries, last={win[-1]}")

    out = Path(__file__).resolve().parents[1] / "miotts_tpu/runtime/mp3_tables.py"
    with open(out, "w") as f:
        f.write('"""ISO 11172-3 Layer III constant tables (GENERATED — do '
                'not edit).\n\nGenerated by scripts/extract_mp3_tables.py: '
                'Huffman codebooks (Table B.7)\nand the synthesis-window '
                'base (Table B.3 x 65536) are spec constants,\nextracted '
                'from the system libmp3lame/libmpg123 .rodata and '
                'validated\nstructurally (prefix-free, Kraft sum == 1) and '
                'end-to-end against two\nindependent decoders '
                '(tests/test_mp3.py).\n"""\n\n')
        f.write("# codebook name -> (xlen, ylen, lengths, codes)\n")
        f.write("HUFF_BIG = {\n")
        for name, xlen, ylen in BIG_TABLES:
            f.write(f"    {name!r}: ({xlen}, {ylen},\n"
                    f"        {lens[name]},\n        {hb[name]}),\n")
        f.write("}\n\n")
        f.write(f"LINBITS = {LINBITS}\n\n")
        f.write("# table id (0-31) -> codebook key (None: no codes)\n")
        co = {t: CODE_OF.get(t) for t in range(32)}
        f.write(f"CODE_OF = {co}\n\n")
        f.write(f"COUNT1A_LEN = {cnt1A_len}\n")
        f.write(f"COUNT1A_COD = {cnt1A}\n")
        f.write("# count1 table B: value i -> code 15-i, 4 bits\n\n")
        f.write("# synthesis window base: D[i]*65536, i=0..256 "
                "(Table B.3 half;\n# full window by symmetry in mp3.py)\n")
        f.write(f"SYNTH_WIN_BASE = {win}\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
