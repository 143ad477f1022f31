"""Minimal independent FLAC *encoder* — test fixture generator.

No FLAC tooling exists in this sandbox (no `flac`, no ffmpeg, no
torchaudio), so decoder tests build their own streams. This is written
from the format spec (RFC 9639) independently of
miotts_tpu/runtime/flac.py — a shared misunderstanding would still be
caught by the third-party oracle test (pygame/SDL's dr_flac decodes the
same fixtures where available).

Supports: 16-bit mono/stereo, fixed 4096-sample blocking (last frame
short), subframe types CONSTANT / VERBATIM / FIXED(0-2) / LPC(order 2),
rice residuals (4-bit params, any partition order) + escaped partitions,
channel modes independent / left-side / mid-side, wasted bits, proper
CRC-8 / CRC-16 so strict decoders accept the output.
"""

from __future__ import annotations

import struct

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_coded(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    n_cont = 1
    while n >= (1 << (6 * n_cont + (6 - n_cont))):
        n_cont += 1
    for i in range(n_cont):
        out.append(0x80 | ((n >> (6 * (n_cont - 1 - i))) & 0x3F))
    lead_bits = 6 - n_cont
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (n >> (6 * n_cont))
    return bytes([lead]) + bytes(out)


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


def _write_residual(bw: BitWriter, res: np.ndarray, order: int,
                    blocksize: int, partition_order: int = 0,
                    escape_parts: set | None = None) -> None:
    # clamp: 2^po must divide blocksize and the first partition must keep
    # at least one sample after the warmup
    while partition_order and (blocksize % (1 << partition_order)
                               or (blocksize >> partition_order) <= order):
        partition_order -= 1
    bw.write(0, 2)  # rice method 0 (4-bit params)
    bw.write(partition_order, 4)
    n_part = 1 << partition_order
    part_n = blocksize >> partition_order
    pos = 0
    for pi in range(n_part):
        n = part_n - (order if pi == 0 else 0)
        vals = res[pos:pos + n]
        pos += n
        zz = _zigzag(vals.astype(np.int64))
        if escape_parts and pi in escape_parts:
            bw.write(0xF, 4)  # escape
            nbits = int(max(2, (int(np.abs(vals).max(initial=0)).bit_length()
                                + 1)))
            bw.write(nbits, 5)
            for v in vals:
                bw.write_signed(int(v), nbits)
            continue
        mean = float(zz.mean()) if zz.size else 0.0
        k = max(0, int(np.log2(mean + 1)) - 0) if mean > 0 else 0
        k = min(k, 14)
        bw.write(k, 4)
        for z in zz.tolist():
            bw.write_unary(z >> k)
            bw.write(z & ((1 << k) - 1), k)


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str,
                    partition_order: int = 0,
                    escape_parts: set | None = None,
                    wasted: int = 0) -> None:
    blocksize = x.size
    type_code = {"constant": 0, "verbatim": 1, "fixed0": 8, "fixed1": 9,
                 "fixed2": 10, "lpc2": 33}[kind]
    bw.write(0, 1)
    bw.write(type_code, 6)
    if wasted:
        assert not np.any(x & ((1 << wasted) - 1)), "wasted bits must be 0"
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
        x = x >> wasted
    else:
        bw.write(0, 1)
    eff = bps - wasted
    x = x.astype(np.int64)
    if kind == "constant":
        assert np.all(x == x[0])
        bw.write_signed(int(x[0]), eff)
    elif kind == "verbatim":
        for v in x.tolist():
            bw.write_signed(v, eff)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        for v in x[:order].tolist():
            bw.write_signed(v, eff)
        if order == 0:
            res = x
        elif order == 1:
            res = x[1:] - x[:-1]
        else:
            res = x[2:] - 2 * x[1:-1] + x[:-2]
        _write_residual(bw, res, order, blocksize, partition_order,
                        escape_parts)
    elif kind == "lpc2":
        order, prec, shift = 2, 12, 5
        coefs = [int(round(1.5 * (1 << shift))), -(1 << (shift - 1))]
        for v in x[:order].tolist():
            bw.write_signed(v, eff)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        pred = (coefs[0] * x[1:-1] + coefs[1] * x[:-2]) >> shift
        res = x[2:] - pred
        _write_residual(bw, res, order, blocksize, partition_order,
                        escape_parts)


def encode_flac(samples: np.ndarray, sample_rate: int,
                block_size: int = 4096, subframe_kind: str = "fixed2",
                channel_mode: str = "auto", partition_order: int = 0,
                escape_parts: set | None = None, wasted: int = 0) -> bytes:
    """samples: int16-range ints, shape [n] (mono) or [n, 2] (stereo)."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    assert n_ch in (1, 2)
    bps = 16

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_tail = si.bytes() + b"\x00" * 16  # md5 zeros (unverified)
    out.append(0x80)  # last block, STREAMINFO
    out += struct.pack(">I", len(si_tail))[1:]
    out += si_tail

    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(block_size, n - pos)
        blk = x[pos:pos + bs]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # 16-bit blocksize-1 follows
        bw.write(0, 4)  # rate from streaminfo
        mode = channel_mode
        if mode == "auto":
            mode = "independent"
        ch_code = {"independent": n_ch - 1, "left_side": 8,
                   "mid_side": 10}[mode]
        bw.write(ch_code, 4)
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        for b in _utf8_coded(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr_partial = bw
        # CRC-8 covers everything before it — flush current bits to bytes
        assert hdr_partial.nacc == 0
        bw.write(crc8(bytes(hdr_partial.buf)), 8)

        if mode == "independent":
            chans = [(blk[:, c], bps) for c in range(n_ch)]
        elif mode == "left_side":
            left = blk[:, 0]
            side = blk[:, 0] - blk[:, 1]
            chans = [(left, bps), (side, bps + 1)]
        else:  # mid_side
            l, r = blk[:, 0], blk[:, 1]
            side = l - r
            mid = (l + r) >> 1
            chans = [(mid, bps), (side, bps + 1)]
        for cx, cbps in chans:
            kind = subframe_kind
            if kind == "constant" and not np.all(cx == cx[0]):
                kind = "fixed2"
            _write_subframe(bw, cx, cbps, kind, partition_order,
                            escape_parts, wasted)
        bw.align()
        frame_bytes = bytes(bw.buf)
        bw.write(crc16(frame_bytes), 16)
        out += bw.bytes()
        pos += bs
        frame_idx += 1
    return bytes(out)
