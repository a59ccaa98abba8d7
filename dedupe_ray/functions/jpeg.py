"""Baseline-sequential JPEG decoder — pure Python/numpy, no Pillow.

Closes the LAST format of the reference's Go-stdlib image registry
(/root/reference/utils/file.go:6-8 — jpeg/png/gif) on a PIL-less cluster:
PNG and GIF decode in ``stages/multimodal.py``; this module handles
JFIF/EXIF baseline DCT JPEGs (SOF0): 8-bit, 1 or 3 components, any
sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart markers.
Progressive (SOF2), arithmetic coding and 12-bit raise ``ValueError`` and
the media stage quarantines the row.

Decode pipeline per the spec (ITU-T T.81): marker parse → Huffman-decode
(run,size) symbols into zigzag 8×8 coefficient blocks (DC differential per
component) → dequantize → inverse zigzag → 2-D IDCT as two matmuls with
the orthonormal DCT-II basis (vectorized over ALL blocks of a component at
once — no per-block Python loop in the transform) → plane assembly +
nearest-neighbor chroma upsample → YCbCr→RGB (JFIF full-range). The
Huffman stage is a per-symbol Python loop (inherently sequential bit
stream); everything after it is numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "dct2_matrix"]


def dct2_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis C: forward DCT = C @ X @ C.T,
    inverse = C.T @ Y @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c


# zigzag order: index i holds the raster position of the i-th zigzag coeff
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


class _BitReader:
    """MSB-first entropy-segment bit reader with 0xFF00 unstuffing; stops
    at any non-RST marker. Restart markers reset via ``sync_restart``."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        while self.nbits <= 24:
            p = self.pos
            if p >= len(b):
                # spec-permitted: pad with 1-bits at end of stream
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = b[p]
            if byte == 0xFF:
                nxt = b[p + 1] if p + 1 < len(b) else 0xD9
                if nxt == 0x00:  # stuffed data byte
                    self.pos = p + 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: stop fill here
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:  # real marker (EOI/next segment): pad
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos = p + 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def sync_restart(self) -> None:
        """Discard partial bits and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        p = self.pos
        while p + 1 < len(b):
            if b[p] == 0xFF and 0xD0 <= b[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("missing JPEG restart marker")


class _Huff:
    """Canonical JPEG Huffman table → (maxcode/valptr) fast decode."""

    def __init__(self, counts: list[int], values: bytes):
        self.values = values
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += n
            k += n
            self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        peek = br.peek16()
        for ln in range(1, 17):
            code = peek >> (16 - ln)
            if self.maxcode[ln] >= 0 and code <= self.maxcode[ln]:
                br.skip(ln)
                return self.values[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a ``size``-bit magnitude."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w) uint8 grayscale or (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                nv = sum(counts)
                tab = _Huff(counts, seg[i + 17:i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, huff_dc[tt >> 4], huff_ac[tt & 0x0F]))
            return _decode_scan(payload, pos + seglen, frame, scan, qt,
                                restart_interval)
        pos += seglen
    raise ValueError("JPEG without SOS scan")


def _decode_scan(buf: bytes, pos: int, frame: dict, scan: list, qt: dict,
                 restart_interval: int) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient storage (zigzag order), vectorized later
    store: list[np.ndarray] = []
    bw = []  # blocks-wide per component inside the MCU grid
    for c in comps:
        cbw, cbh = mcux * c["hs"], mcuy * c["vs"]
        store.append(np.zeros((cbh * cbw, 64), np.int32))
        bw.append(cbw)
    br = _BitReader(buf, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.sync_restart()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (comp, hdc, hac) in enumerate(scan):
            for by in range(comp["vs"]):
                for bx in range(comp["hs"]):
                    blk = store[ci]
                    row = (my * comp["vs"] + by) * bw[ci] + mx * comp["hs"] + bx
                    t = hdc.decode(br)
                    diff = _extend(br.read(t), t) if t else 0
                    pred[ci] += diff
                    blk[row, 0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = hac.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        blk[row, k] = _extend(br.read(s), s)
                        k += 1
    # dequantize + inverse zigzag + IDCT, vectorized over all blocks
    cmat = dct2_matrix()
    planes = []
    for ci, comp in enumerate(comps):
        q = qt[comp["tq"]][None, :]
        coef = (store[ci] * q).astype(np.float64)
        rast = np.zeros_like(coef)
        rast[:, _ZIGZAG] = coef
        blocks = rast.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", cmat.T, blocks, cmat)
        spatial = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        cbh, cbw = mcuy * comp["vs"], bw[ci]
        plane = spatial.reshape(cbh, cbw, 8, 8).transpose(0, 2, 1, 3)
        plane = plane.reshape(cbh * 8, cbw * 8)
        # nearest-neighbor upsample to full resolution
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG not supported")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
