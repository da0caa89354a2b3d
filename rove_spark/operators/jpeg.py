"""Minimal from-scratch baseline JPEG decoder — pure stdlib + numpy.

Companion to ``operators/png.py`` (round-4 verdict item 8): makes
`multimodal`'s image decode real for the second-most-common payload
format in containers without PIL. Implements the public JPEG standard
(ITU-T T.81) baseline sequential DCT profile:

- marker walk: SOI, APPn/COM (skipped), DQT, DHT, DRI, SOF0, SOS, EOI;
- canonical Huffman decoding (DC categories + AC run/size), with
  0xFF00 byte-unstuffing and RSTn restart-marker handling;
- per-MCU block decode: DC prediction, zigzag, dequantize, float
  8x8 IDCT (orthonormal DCT-III via one matrix product pair);
- chroma upsampling (any H/V sampling factors incl. 4:2:0 / 4:2:2)
  by nearest-neighbor block replication, YCbCr -> RGB per JFIF.

Round 6 adds the progressive DCT profile (SOF2, T.81 annex G): multiple
scans over a persistent coefficient store — DC first/refine
(interleaved, successive approximation by Al), AC first/refine
(non-interleaved spectral bands Ss..Se with EOB-run coding and
correction bits) — then one dequantize + IDCT at the end. Tables may be
redefined between scans; restart markers reset predictors and EOB runs
per scan.

Scope: 8-bit baseline (SOF0/SOF1) + progressive (SOF2). Arithmetic
coding, hierarchical and 12-bit modes raise ValueError — never a
silent wrong decode (same contract as the PNG decoder).

Performance shape: the entropy decode is an inherently sequential bit
stream — per-block Python loops, vectorized IDCT/color math. Decode
runs inside Arrow-batched executors (one Python crossing per batch),
the same story as the Gorilla bit reader and PNG defilters.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_jpeg", "decode_jpeg", "decode_jpeg_gray"]


ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis; IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


class _Huff:
    """Canonical Huffman table: (length, code) -> symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                # past the segment: feed zeros (T.81 allows the final
                # EOB to be padded); block decode will terminate
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                else:  # a real marker ends the entropy segment
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bits = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None
            self.pos += 2  # past FF Dn
        else:
            # tolerate encoders that omit the trailing restart
            d = self.data
            while self.pos + 1 < len(d):
                if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                self.pos += 1


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------- progressive (annex G) --


def _ac_first(rd: _BitReader, ac_t: _Huff, coef, Ss: int, Se: int, Al: int, eobrun: int) -> int:
    """First AC scan of a band (G.1.2.2): run/size coding with EOB-run
    extension; magnitudes enter at precision Al. Returns the remaining
    EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = rd.decode_symbol(ac_t)
        r, s = rs >> 4, rs & 15
        if s:
            k += r
            if k > Se:
                raise ValueError("JPEG progressive AC coefficient overrun")
            coef[k] = _extend(rd.read_bits(s), s) << Al
            k += 1
        else:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rd.read_bits(r)
                break
            k += 16  # ZRL
    return eobrun


def _refine_nonzero(rd: _BitReader, coef, k: int, p1: int) -> None:
    """One correction bit for an already-nonzero coefficient (G.1.2.3):
    history bits below Al are zero, so bit Al of |coef| == bit Al of the
    two's-complement value the spec tests."""
    if rd.read_bit() and (abs(int(coef[k])) & p1) == 0:
        coef[k] += p1 if coef[k] >= 0 else -p1


def _ac_refine(rd: _BitReader, ac_t: _Huff, coef, Ss: int, Se: int, Al: int, eobrun: int) -> int:
    """AC refinement scan (G.1.2.3): newly-nonzero coefficients arrive as
    ±1<<Al; every previously-nonzero coefficient in the band consumes a
    correction bit — including inside EOB runs."""
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = rd.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                val = p1 if rd.read_bit() else -p1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.read_bits(r)
                    break  # this block's tail is handled by the run below
                # r == 15 (ZRL): skip 16 zero-history coefficients
            while k <= Se:
                if coef[k] != 0:
                    _refine_nonzero(rd, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= Se:
            if coef[k] != 0:
                _refine_nonzero(rd, coef, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    rd: _BitReader,
    sel: list,
    comps: list,
    coefs: list,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    Ss: int,
    Se: int,
    Ah: int,
    Al: int,
    mcux: int,
    mcuy: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> None:
    """Apply one progressive scan to the coefficient store. DC scans
    (Ss == 0) may interleave any subset of components in MCU order; AC
    scans are single-component over the component's own block raster."""
    by_id = {c["id"]: c for c in comps}
    # same contract as the baseline path: every scan component must name
    # a frame component, each at most once — a duplicate would silently
    # double-decode one component against another's entropy data
    scan_ids = [cid for cid, _td, _ta in sel]
    if len(scan_ids) != len(set(scan_ids)) or not set(scan_ids) <= set(by_id):
        raise ValueError(
            f"JPEG progressive SOS component ids {scan_ids} must name "
            f"frame components {sorted(by_id)} at most once each"
        )
    if Ss == 0:
        if Se != 0:
            raise ValueError("progressive DC scan must have Se == 0")
        if len(sel) == 1:
            # T.81 A.2.2: a single-component scan is NON-interleaved —
            # it walks the component's true block raster, not the padded
            # MCU grid (they differ for subsampled components)
            cid, td, _ta = sel[0]
            c = by_id[cid]
            ci = comps.index(c)
            dc_t = huff_dc[td] if Ah == 0 else None
            comp_w = -(-(w * c["h"]) // hmax)
            comp_h = -(-(h * c["v"]) // vmax)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            pred = 0
            blk = 0
            for r_ in range(bh):
                for c_ in range(bw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        rd.sync_restart()
                        pred = 0
                    if Ah == 0:
                        s = rd.decode_symbol(dc_t)
                        pred += _extend(rd.read_bits(s), s)
                        coefs[ci][r_, c_, 0] = pred << Al
                    elif rd.read_bit():
                        coefs[ci][r_, c_, 0] |= 1 << Al
                    blk += 1
            return
        order = []
        for cid, td, _ta in sel:
            c = by_id[cid]
            order.append((comps.index(c), c, huff_dc[td] if Ah == 0 else None))
        pred = [0] * len(comps)
        mcu_idx = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                    rd.sync_restart()
                    pred = [0] * len(comps)
                for ci, c, dc_t in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            r_, c_ = my * c["v"] + by, mx * c["h"] + bx
                            if Ah == 0:
                                s = rd.decode_symbol(dc_t)
                                pred[ci] += _extend(rd.read_bits(s), s)
                                coefs[ci][r_, c_, 0] = pred[ci] << Al
                            elif rd.read_bit():
                                coefs[ci][r_, c_, 0] |= 1 << Al
                mcu_idx += 1
        return
    if len(sel) != 1:
        raise ValueError("progressive AC scan must be non-interleaved (one component)")
    cid, _td, ta = sel[0]
    c = by_id[cid]
    ci = comps.index(c)
    ac_t = huff_ac[ta]
    # non-interleaved geometry: the component's true block raster
    comp_w = -(-(w * c["h"]) // hmax)
    comp_h = -(-(h * c["v"]) // vmax)
    bw = -(-comp_w // 8)
    bh = -(-comp_h // 8)
    eobrun = 0
    blk = 0
    for r_ in range(bh):
        for c_ in range(bw):
            if restart_interval and blk and blk % restart_interval == 0:
                rd.sync_restart()
                eobrun = 0
            coef = coefs[ci][r_, c_]
            if Ah == 0:
                eobrun = _ac_first(rd, ac_t, coef, Ss, Se, Al, eobrun)
            else:
                eobrun = _ac_refine(rd, ac_t, coef, Ss, Se, Al, eobrun)
            blk += 1


def decode_jpeg(data: bytes) -> tuple[np.ndarray, int, int]:
    """Baseline JPEG bytes → (pixels uint8[h, w, channels], width, height).
    channels is 1 (grayscale) or 3 (RGB from YCbCr per JFIF)."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    scan = None
    progressive = False
    coefs: list | None = None  # progressive coefficient store (zigzag order)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        # code — skip them, else a fill byte reads as marker 0xFF and the
        # bogus segment length desyncs the walk past real DQT/DHT segments
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qt[tq] = np.frombuffer(seg[i + 1 : i + 65], np.uint8).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = seg[i + 1 : i + 17]
                nsym = sum(counts)
                table = _Huff(counts, seg[i + 17 : i + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. sequential / progressive
            if seg[0] != 8:
                raise ValueError(f"unsupported JPEG precision {seg[0]}")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (marker 0xFF{marker:02X}) — only "
                "sequential DCT (SOF0/SOF1) and progressive DCT (SOF2) "
                "are implemented"
            )
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                sel.append((cid, tt >> 4, tt & 15))
            if not progressive:
                scan = sel
                pos += 2 + ln
                break
            # progressive: decode this scan NOW against the current table
            # state (tables may be redefined between scans), then resume
            # the marker walk where the entropy segment ended
            if frame is None:
                raise ValueError("JPEG SOS before SOF2")
            p_ss, p_se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            p_ah, p_al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            comps = frame["comps"]
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-frame["w"] // (8 * hmax))
            mcuy = -(-frame["h"] // (8 * vmax))
            if coefs is None:
                coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                    for c in comps
                ]
            rd = _BitReader(data, pos + 2 + ln)
            _progressive_scan(
                rd, sel, comps, coefs, huff_dc, huff_ac, restart_interval,
                p_ss, p_se, p_ah, p_al, mcux, mcuy, frame["w"], frame["h"],
                hmax, vmax,
            )
            # skip any padding bits / leftover restart markers up to the
            # next real marker
            p = rd.pos
            while p + 1 < len(data):
                nxt = data[p + 1]
                if data[p] == 0xFF and nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                    break
                p += 1
            pos = p
            continue
        pos += 2 + ln
    if progressive:
        if coefs is None:
            raise ValueError("progressive JPEG contains no scans")
        w, h, comps = frame["w"], frame["h"], frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        planes = []
        for ci, c in enumerate(comps):
            q = qt[c["tq"]].astype(np.int64)
            bh_, bw_, _ = coefs[ci].shape
            cf = coefs[ci].reshape(-1, 64).astype(np.int64) * q  # zigzag dequant
            blocks = np.zeros((cf.shape[0], 64))
            blocks[:, ZIGZAG] = cf
            px = np.einsum("ki,nij,jl->nkl", _C.T, blocks.reshape(-1, 8, 8), _C) + 128.0
            planes.append(
                px.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
            )
        return _finish_planes(planes, comps, hmax, vmax, w, h)

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    # single interleaved scan only: MCU order follows the SOS component
    # list (T.81 — it may differ from SOF order), and a non-interleaved
    # multi-scan baseline file (ns < ncomp per scan) is out of scope —
    # raise by name, never a silent wrong decode (round-5 review)
    if len(scan) != len(frame["comps"]):
        raise ValueError(
            f"unsupported JPEG scan layout: {len(scan)} of "
            f"{len(frame['comps'])} components in SOS — only a single "
            "interleaved scan is implemented"
        )
    by_id = {c["id"]: c for c in frame["comps"]}
    scan_ids = [cid for cid, _, _ in scan]
    # a repeated id would pass the count check and silently decode one
    # component twice against the other's entropy data — require the scan
    # to cover each frame component exactly once
    if set(scan_ids) != set(by_id) or len(scan_ids) != len(set(scan_ids)):
        raise ValueError(
            f"JPEG SOS component ids {scan_ids} do not cover the frame "
            f"components {sorted(by_id)} exactly once"
        )
    scan_comps = [(by_id[cid], td, ta) for cid, td, ta in scan]

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64))

    # decode order = SOS order; plane/pred indices = SOF positions
    decode_order = [
        (comps.index(c), c, huff_dc[td], huff_ac[ta]) for c, td, ta in scan_comps
    ]
    rd = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                rd.sync_restart()
                pred = [0] * len(comps)
            for ci, c, dc_t, ac_t in decode_order:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.int64)
                        s = rd.decode_symbol(dc_t)
                        pred[ci] += _extend(rd.read_bits(s), s)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 15
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            coef[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[ZIGZAG] = coef * q
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_idx += 1

    return _finish_planes(planes, comps, hmax, vmax, w, h)


def _finish_planes(
    planes: list, comps: list, hmax: int, vmax: int, w: int, h: int
) -> tuple[np.ndarray, int, int]:
    """Shared decode tail: upsample to full resolution, crop to (h, w),
    YCbCr → RGB per JFIF (or pass grayscale through)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return px.reshape(h, w, 1), w, h
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), w, h


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """JPEG bytes → flat grayscale uint8 pixels (row-major). Color images
    fold RGB to luma with the same ITU-R 601-2 integer transform as the
    PNG path (L = (R*299 + G*587 + B*114) // 1000)."""
    px, _w, _h = decode_jpeg(data)
    if px.shape[2] == 1:
        return px.reshape(-1)
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8).reshape(-1)
