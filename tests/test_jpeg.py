"""Baseline-JPEG decoder kill tests (operators/jpeg.py).

A from-scratch baseline ENCODER lives here as test tooling: markers,
canonical Huffman (single-length tables — valid and trivially prefix
free), zigzag, DC prediction, byte stuffing, restart markers. The
strong gate is coefficient-level: random QUANTIZED coefficients are
encoded (losslessly, Huffman + DC-diff), decoded by the operator, and
compared EXACTLY against an independent numpy reference that applies
the same dequantize → IDCT → upsample → color → round/clip pipeline.
That kills bugs in marker parsing, Huffman decode, DC prediction,
zigzag placement, dequantize, restart handling, subsampling and color
conversion. An image-level encode(forward DCT)→decode test bounds the
end-to-end numeric error."""

from __future__ import annotations

import numpy as np
import pytest

from rove_spark.operators.jpeg import ZIGZAG, _C, decode_jpeg, decode_jpeg_gray, is_jpeg


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write(1, 1)


# single-length canonical tables: 12 DC symbols and 162 AC symbols all at
# code length 8 (code = symbol index) — prefix-free by construction and
# 0xFF never emitted as a full code (161 < 255)
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _dht(tc: int, th: int, syms: list[int]) -> bytes:
    counts = [0] * 16
    counts[7] = len(syms)  # all length 8
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + (len(body) + 2).to_bytes(2, "big") + body


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_coef_blocks(
    wr: _BitWriter, coef_zz: np.ndarray, pred: int, dc_idx: dict, ac_idx: dict
) -> int:
    """One 64-coefficient block (zigzag order) → bits. Returns new pred."""
    dc = int(coef_zz[0])
    diff = dc - pred
    s = _cat(diff)
    wr.write(dc_idx[s], 8)
    if s:
        wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            wr.write(ac_idx[0xF0], 8)
            run -= 16
        s = _cat(v)
        wr.write(ac_idx[(run << 4) | s], 8)
        wr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        wr.write(ac_idx[0x00], 8)
    return dc


def encode_baseline(
    coef_planes: list[np.ndarray],
    samplings: list[tuple[int, int]],
    w: int,
    h: int,
    qt: np.ndarray,
    restart_interval: int = 0,
    sos_order: list[int] | None = None,
) -> bytes:
    """Assemble a baseline JPEG from per-component ZIGZAG-ORDER quantized
    coefficient arrays shaped [blocks_y, blocks_x, 64]."""
    dc_idx = {s: i for i, s in enumerate(_DC_SYMS)}
    ac_idx = {s: i for i, s in enumerate(_AC_SYMS)}
    qt_zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8)
    out = bytearray(b"\xff\xd8")
    out += _seg(b"\xff\xdb", bytes([0]) + bytes(qt_zz))
    out += _dht(0, 0, _DC_SYMS)
    out += _dht(1, 0, _AC_SYMS)
    if restart_interval:
        out += _seg(b"\xff\xdd", restart_interval.to_bytes(2, "big"))
    ncomp = len(coef_planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samplings[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += _seg(b"\xff\xc0", sof)
    order = sos_order if sos_order is not None else list(range(ncomp))
    sos = bytes([ncomp])
    for ci in order:
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(b"\xff\xda", sos)

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    wr = _BitWriter()
    pred = [0] * ncomp
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                wr.align()
                out += wr.out
                wr = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * ncomp
            for ci in order:  # entropy interleave follows SOS order (T.81)
                hs, vs = samplings[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = coef_planes[ci][my * vs + by, mx * hs + bx]
                        pred[ci] = _encode_coef_blocks(wr, blk, pred[ci], dc_idx, ac_idx)
            mcu_idx += 1
    wr.align()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


# progressive AC tables additionally need the EOBn symbols (r<<4, r<15):
# 15 + ZRL + 160 run/size codes = 176 symbols, still all at length 8
_AC_SYMS_PROG = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _default_scan_script(ncomp: int) -> list:
    """cjpeg-like script: DC first (interleaved, Al=1) + DC refine, two
    spectral AC bands per component at Al=2 with two refinement passes
    down to Al=0 — reconstructs every coefficient exactly."""
    allc = list(range(ncomp))
    scans = [(allc, 0, 0, 0, 1)]
    for c in allc:
        scans += [([c], 1, 5, 0, 2), ([c], 6, 63, 0, 2)]
    scans += [(allc, 0, 0, 1, 0)]
    for al in (1, 0):
        for c in allc:
            scans += [([c], 1, 5, al + 1, al), ([c], 6, 63, al + 1, al)]
    return scans


class _ProgWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    EOB-run accounting and the refinement correction-bit buffer."""

    def __init__(self, ac_idx):
        self.wr = _BitWriter()
        self.ac_idx = ac_idx
        self.eobrun = 0
        self.pending = []  # correction bits owned by the pending EOB run

    def flush_eobrun(self):
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            self.wr.write(self.ac_idx[nb << 4], 8)
            if nb:
                self.wr.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.pending:
            self.wr.write(b, 1)
        self.pending = []


def _encode_ac_first(pw: _ProgWriter, coef, Ss, Se, Al):
    r = 0
    for k in range(Ss, Se + 1):
        v = int(coef[k])
        t = abs(v) >> Al
        if t == 0:
            r += 1
            continue
        pw.flush_eobrun()
        while r > 15:
            pw.wr.write(pw.ac_idx[0xF0], 8)
            r -= 16
        s = t.bit_length()
        pw.wr.write(pw.ac_idx[(r << 4) | s], 8)
        sv = t if v >= 0 else -t
        pw.wr.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
        r = 0
    if r > 0:
        pw.eobrun += 1
        if pw.eobrun == 0x7FFF:
            pw.flush_eobrun()


def _encode_ac_refine(pw: _ProgWriter, coef, Ss, Se, Al):
    absv = {k: abs(int(coef[k])) >> Al for k in range(Ss, Se + 1)}
    eob = 0
    for k in range(Ss, Se + 1):
        if absv[k] == 1:
            eob = k
    r = 0
    br = []  # correction bits since the last emitted symbol (this block)
    for k in range(Ss, Se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            pw.flush_eobrun()
            pw.wr.write(pw.ac_idx[0xF0], 8)
            r -= 16
            for b in br:
                pw.wr.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)  # previously nonzero: correction bit
            continue
        pw.flush_eobrun()
        pw.wr.write(pw.ac_idx[(r << 4) | 1], 8)
        pw.wr.write(1 if int(coef[k]) >= 0 else 0, 1)
        for b in br:
            pw.wr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        pw.eobrun += 1
        pw.pending.extend(br)
        if pw.eobrun == 0x7FFF:
            pw.flush_eobrun()


def encode_progressive(
    coef_planes: list[np.ndarray],
    samplings: list[tuple[int, int]],
    w: int,
    h: int,
    qt: np.ndarray,
    scans: list | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a progressive (SOF2) JPEG from zigzag-order quantized
    coefficient arrays — the multi-scan counterpart of encode_baseline,
    emitting T.81 annex G spectral-selection + successive-approximation
    scans (EOB runs, refinement correction bits, per-scan restarts)."""
    dc_idx = {s: i for i, s in enumerate(_DC_SYMS)}
    ac_idx = {s: i for i, s in enumerate(_AC_SYMS_PROG)}
    ncomp = len(coef_planes)
    if scans is None:
        scans = _default_scan_script(ncomp)
    qt_zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8)
    out = bytearray(b"\xff\xd8")
    out += _seg(b"\xff\xdb", bytes([0]) + bytes(qt_zz))
    out += _dht(0, 0, _DC_SYMS)
    out += _dht(1, 0, _AC_SYMS_PROG)
    if restart_interval:
        out += _seg(b"\xff\xdd", restart_interval.to_bytes(2, "big"))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samplings[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += _seg(b"\xff\xc2", sof)

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    for comp_list, Ss, Se, Ah, Al in scans:
        sos = bytes([len(comp_list)])
        for ci in comp_list:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += _seg(b"\xff\xda", sos)
        pw = _ProgWriter(ac_idx)
        rst = 0
        if Ss == 0 and len(comp_list) == 1:
            # single-component DC scan is NON-interleaved per T.81: walk
            # the component's true block raster (matters for subsampled
            # components, whose padded MCU grid is larger)
            (ci,) = comp_list
            hs, vs = samplings[ci]
            comp_w = -(-(w * hs) // hmax)
            comp_h = -(-(h * vs) // vmax)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            pred = 0
            blk = 0
            for r_ in range(bh):
                for c_ in range(bw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        pw.wr.align()
                        out += pw.wr.out
                        pw = _ProgWriter(ac_idx)
                        out += bytes([0xFF, 0xD0 + (rst % 8)])
                        rst += 1
                        pred = 0
                    dc = int(coef_planes[ci][r_, c_, 0])
                    if Ah == 0:
                        dct = dc >> Al
                        diff = dct - pred
                        s = _cat(diff)
                        pw.wr.write(dc_idx[s], 8)
                        if s:
                            pw.wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        pred = dct
                    else:
                        pw.wr.write((dc >> Al) & 1, 1)
                    blk += 1
        elif Ss == 0:  # DC scan, MCU-interleaved over comp_list
            pred = [0] * ncomp
            mcu_idx = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                        pw.wr.align()
                        out += pw.wr.out
                        pw = _ProgWriter(ac_idx)
                        out += bytes([0xFF, 0xD0 + (rst % 8)])
                        rst += 1
                        pred = [0] * ncomp
                    for ci in comp_list:
                        hs, vs = samplings[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                dc = int(coef_planes[ci][my * vs + by, mx * hs + bx, 0])
                                if Ah == 0:
                                    dct = dc >> Al  # arithmetic shift per T.81
                                    diff = dct - pred[ci]
                                    s = _cat(diff)
                                    pw.wr.write(dc_idx[s], 8)
                                    if s:
                                        pw.wr.write(
                                            diff if diff >= 0 else diff + (1 << s) - 1, s
                                        )
                                    pred[ci] = dct
                                else:
                                    pw.wr.write((dc >> Al) & 1, 1)
                    mcu_idx += 1
        else:  # AC scan, single component, true block raster
            (ci,) = comp_list
            hs, vs = samplings[ci]
            comp_w = -(-(w * hs) // hmax)
            comp_h = -(-(h * vs) // vmax)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            blk = 0
            for r_ in range(bh):
                for c_ in range(bw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        pw.flush_eobrun()
                        pw.wr.align()
                        out += pw.wr.out
                        pw = _ProgWriter(ac_idx)
                        out += bytes([0xFF, 0xD0 + (rst % 8)])
                        rst += 1
                    coef = coef_planes[ci][r_, c_]
                    if Ah == 0:
                        _encode_ac_first(pw, coef, Ss, Se, Al)
                    else:
                        _encode_ac_refine(pw, coef, Ss, Se, Al)
                    blk += 1
            pw.flush_eobrun()
        pw.wr.align()
        out += pw.wr.out
    out += b"\xff\xd9"
    return bytes(out)


def _reference_pixels(coef_planes, samplings, w, h, qt):
    """Independent dequantize → IDCT → upsample → color pipeline (numpy,
    no shared code with the decoder beyond the public ZIGZAG/_C arrays)."""
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    planes = []
    qt_zz = qt.reshape(-1)[ZIGZAG].astype(np.int64)
    for ci, cp in enumerate(coef_planes):
        by, bx, _ = cp.shape
        plane = np.zeros((by * 8, bx * 8))
        for y in range(by):
            for x in range(bx):
                blk = np.zeros(64)
                blk[ZIGZAG] = cp[y, x] * qt_zz
                plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                    _C.T @ blk.reshape(8, 8) @ _C + 128.0
                )
        hs, vs = samplings[ci]
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _rand_coefs(rng, by, bx):
    """Sparse random quantized coefficients in zigzag order (realistic
    energy profile: large DC, decaying AC, mostly zero tail)."""
    c = np.zeros((by, bx, 64), np.int64)
    c[:, :, 0] = rng.integers(-200, 201, (by, bx))
    for k in range(1, 20):
        mask = rng.random((by, bx)) < 0.4
        c[:, :, k] = np.where(mask, rng.integers(-30, 31, (by, bx)), 0)
    # a couple of deep-tail coefficients exercise ZRL (16-zero runs)
    c[:, :, 55] = np.where(rng.random((by, bx)) < 0.3, 5, 0)
    return c


QT_ONES = np.ones((8, 8), np.int64)
QT_MILD = np.full((8, 8), 3, np.int64)


def test_gray_coefficient_exact_roundtrip():
    rng = np.random.default_rng(7)
    coefs = _rand_coefs(rng, 3, 4)  # 32x24
    data = encode_baseline([coefs], [(1, 1)], 32, 24, QT_MILD)
    assert is_jpeg(data)
    px, w, h = decode_jpeg(data)
    assert (w, h, px.shape) == (32, 24, (24, 32, 1))
    ref = _reference_pixels([coefs], [(1, 1)], 32, 24, QT_MILD)
    np.testing.assert_array_equal(px, ref)


def test_color_420_coefficient_exact_roundtrip():
    rng = np.random.default_rng(11)
    # 2 MCUs x 2 MCUs of 16x16: Y is 4x4 blocks, Cb/Cr 2x2
    planes = [_rand_coefs(rng, 4, 4), _rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2)]
    samp = [(2, 2), (1, 1), (1, 1)]
    data = encode_baseline(planes, samp, 32, 32, QT_MILD)
    px, w, h = decode_jpeg(data)
    assert (w, h, px.shape) == (32, 32, (32, 32, 3))
    ref = _reference_pixels(planes, samp, 32, 32, QT_MILD)
    np.testing.assert_array_equal(px, ref)


def test_color_422_with_restarts_and_crop():
    rng = np.random.default_rng(13)
    # 3x2 MCUs of 16x8; image cropped to 44x15 (non-multiple edges);
    # restart every 2 MCUs exercises RSTn + DC-pred reset + alignment
    planes = [_rand_coefs(rng, 2, 6), _rand_coefs(rng, 2, 3), _rand_coefs(rng, 2, 3)]
    samp = [(2, 1), (1, 1), (1, 1)]
    data = encode_baseline(planes, samp, 44, 15, QT_ONES, restart_interval=2)
    px, w, h = decode_jpeg(data)
    assert (w, h, px.shape) == (44, 15, (15, 44, 3))
    ref = _reference_pixels(planes, samp, 44, 15, QT_ONES)
    np.testing.assert_array_equal(px, ref)


def test_image_level_forward_dct_roundtrip():
    """Encode a real image through a forward DCT at q=1 and bound the
    end-to-end reconstruction error (quantization-rounding only)."""
    rng = np.random.default_rng(3)
    x = np.linspace(0, 4 * np.pi, 32)
    img = (
        110
        + 60 * np.sin(x)[None, :] * np.cos(x)[:, None]
        + rng.integers(-6, 7, (32, 32))
    ).clip(0, 255)
    coefs = np.zeros((4, 4, 64), np.int64)
    for by in range(4):
        for bx in range(4):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            d = _C @ blk @ _C.T
            coefs[by, bx] = np.round(d.reshape(-1)[ZIGZAG]).astype(np.int64)
    data = encode_baseline([coefs], [(1, 1)], 32, 32, QT_ONES)
    px, _, _ = decode_jpeg(data)
    err = np.abs(px[:, :, 0].astype(np.int64) - np.round(img).astype(np.int64))
    assert err.max() <= 4 and err.mean() <= 1.0


def test_gray_luma_matches_color_fold():
    rng = np.random.default_rng(17)
    planes = [_rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2)]
    samp = [(1, 1), (1, 1), (1, 1)]  # 4:4:4
    data = encode_baseline(planes, samp, 16, 16, QT_MILD)
    flat = decode_jpeg_gray(data)
    px, _, _ = decode_jpeg(data)
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    np.testing.assert_array_equal(
        flat, ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8).reshape(-1)
    )


def test_unsupported_modes_raise():
    rng = np.random.default_rng(1)
    coefs = _rand_coefs(rng, 1, 1)
    data = bytearray(encode_baseline([coefs], [(1, 1)], 8, 8, QT_ONES))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless) — unsupported
    with pytest.raises(ValueError, match="implemented"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG1234")
    # a baseline scan mislabeled as progressive must raise a NAMED error
    # (its SOS says Ss=0, Se=63 — an illegal progressive DC scan), never
    # silently misdecode
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se == 0"):
        decode_jpeg(bytes(data))


def test_sos_order_differs_from_sof_order():
    """T.81 defines MCU interleave by the SOS component list, which may
    permute SOF order — the decoder must follow the scan (round-5
    review: SOF-order iteration consumed entropy data against the wrong
    components, silently wrong pixels)."""
    rng = np.random.default_rng(29)
    planes = [_rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2)]
    samp = [(1, 1), (1, 1), (1, 1)]
    data = encode_baseline(planes, samp, 16, 16, QT_MILD, sos_order=[2, 0, 1])
    px, _, _ = decode_jpeg(data)
    ref = _reference_pixels(planes, samp, 16, 16, QT_MILD)
    np.testing.assert_array_equal(px, ref)


def test_partial_scan_raises_named_error():
    rng = np.random.default_rng(31)
    planes = [_rand_coefs(rng, 1, 1), _rand_coefs(rng, 1, 1), _rand_coefs(rng, 1, 1)]
    samp = [(1, 1), (1, 1), (1, 1)]
    data = bytearray(encode_baseline(planes, samp, 8, 8, QT_ONES))
    sos = data.index(b"\xff\xda")
    # rewrite SOS to claim 1 component: length 2+1+2+3=8, ns=1, comp 1
    new_sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    # original SOS body length
    old_len = int.from_bytes(data[sos + 2 : sos + 4], "big")
    data[sos : sos + 2 + old_len] = new_sos
    with pytest.raises(ValueError, match="single\\s+interleaved|interleaved"):
        decode_jpeg(bytes(data))


def test_duplicate_sos_component_raises():
    """A repeated SOS component id must raise, not silently decode one
    component against another's entropy data (round-5 review)."""
    rng = np.random.default_rng(37)
    planes = [_rand_coefs(rng, 1, 1), _rand_coefs(rng, 1, 1), _rand_coefs(rng, 1, 1)]
    data = bytearray(encode_baseline(planes, [(1, 1)] * 3, 8, 8, QT_ONES))
    sos = data.index(b"\xff\xda")
    # components (1, 2, 3) -> (1, 1, 2): same length, duplicate id
    assert data[sos + 5] == 1 and data[sos + 7] == 2 and data[sos + 9] == 3
    data[sos + 7] = 1
    data[sos + 9] = 2
    with pytest.raises(ValueError, match="exactly once"):
        decode_jpeg(bytes(data))


# ------------------------------------------------- progressive (SOF2) --


def test_progressive_gray_coefficient_exact():
    """Progressive gray: DC successive approximation + two spectral AC
    bands refined to full precision — decoded pixels must EXACTLY equal
    the reference pipeline on the original coefficients (the scan
    machinery is lossless end-to-end)."""
    rng = np.random.default_rng(41)
    coefs = _rand_coefs(rng, 4, 3)
    data = encode_progressive([coefs], [(1, 1)], 24, 32, QT_MILD)
    px, w, h = decode_jpeg(data)
    assert (w, h) == (24, 32)
    np.testing.assert_array_equal(px, _reference_pixels([coefs], [(1, 1)], 24, 32, QT_MILD))


def test_progressive_color_420_odd_dims_exact():
    """Progressive 4:2:0 color at odd dimensions (33x17): the AC scans
    walk the component's TRUE block raster, which is smaller than the
    MCU-padded store for luma — padding blocks stay uncoded and are
    cropped. Coefficient-exact."""
    rng = np.random.default_rng(43)
    samp = [(2, 2), (1, 1), (1, 1)]
    w, h = 33, 17
    mcux, mcuy = -(-w // 16), -(-h // 16)
    planes = [
        _rand_coefs(rng, mcuy * 2, mcux * 2),
        _rand_coefs(rng, mcuy, mcux),
        _rand_coefs(rng, mcuy, mcux),
    ]
    # zero the luma blocks outside the true raster: non-interleaved AC
    # scans never code them (T.81), so nonzero AC there is unencodable
    bw_l, bh_l = -(-w // 8), -(-h // 8)
    planes[0][:, :, 1:] *= 0
    planes[0][:bh_l, :bw_l, 1:] = _rand_coefs(rng, bh_l, bw_l)[:, :, 1:]
    data = encode_progressive(planes, samp, w, h, QT_MILD)
    px, _, _ = decode_jpeg(data)
    # reference must see what the stream can carry: DC everywhere (DC
    # scans are MCU-interleaved), AC only inside the true raster
    np.testing.assert_array_equal(px, _reference_pixels(planes, samp, w, h, QT_MILD))


def test_progressive_restarts_exact():
    """Restart markers inside progressive scans reset the DC predictor
    and the EOB run per interval; still coefficient-exact."""
    rng = np.random.default_rng(47)
    coefs = _rand_coefs(rng, 3, 4)
    data = encode_progressive([coefs], [(1, 1)], 32, 24, QT_ONES, restart_interval=3)
    px, _, _ = decode_jpeg(data)
    np.testing.assert_array_equal(px, _reference_pixels([coefs], [(1, 1)], 32, 24, QT_ONES))


def test_progressive_eobrun_spans_blocks():
    """Sparse coefficients so EOB runs span many blocks in both first
    and refinement AC scans (correction bits buffered across the run)."""
    rng = np.random.default_rng(53)
    coefs = np.zeros((5, 5, 64), np.int64)
    coefs[:, :, 0] = rng.integers(-100, 101, (5, 5))
    # a few isolated AC spikes leave long EOB runs between them
    for (y, x, k, v) in [(0, 0, 3, 17), (2, 3, 7, -9), (4, 4, 40, 5), (1, 1, 63, -3)]:
        coefs[y, x, k] = v
    data = encode_progressive([coefs], [(1, 1)], 40, 40, QT_ONES)
    px, _, _ = decode_jpeg(data)
    np.testing.assert_array_equal(px, _reference_pixels([coefs], [(1, 1)], 40, 40, QT_ONES))


def test_progressive_matches_baseline_pixels():
    """The same coefficients through encode_baseline and
    encode_progressive must decode to IDENTICAL pixels."""
    rng = np.random.default_rng(59)
    planes = [_rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2), _rand_coefs(rng, 2, 2)]
    samp = [(1, 1), (1, 1), (1, 1)]
    base, _, _ = decode_jpeg(encode_baseline(planes, samp, 16, 16, QT_MILD))
    prog, _, _ = decode_jpeg(encode_progressive(planes, samp, 16, 16, QT_MILD))
    np.testing.assert_array_equal(base, prog)


def test_progressive_noninterleaved_dc_scans_exact():
    """Per-component (ns=1) DC scans are NON-interleaved per T.81 — they
    walk the component's true block raster, which is smaller than the
    padded MCU grid for subsampled luma at odd dims. Blocks outside the
    raster are uncodable in any non-interleaved scan, so they're zeroed
    in the source; decode must be coefficient-exact."""
    rng = np.random.default_rng(61)
    samp = [(2, 2), (1, 1), (1, 1)]
    w, h = 33, 17
    mcux, mcuy = -(-w // 16), -(-h // 16)
    planes = [
        np.zeros((mcuy * 2, mcux * 2, 64), np.int64),
        _rand_coefs(rng, mcuy, mcux),
        _rand_coefs(rng, mcuy, mcux),
    ]
    bw_l, bh_l = -(-w // 8), -(-h // 8)
    planes[0][:bh_l, :bw_l] = _rand_coefs(rng, bh_l, bw_l)
    scans = [([c], 0, 0, 0, 1) for c in range(3)]
    for c in range(3):
        scans += [([c], 1, 63, 0, 1)]
    scans += [([c], 0, 0, 1, 0) for c in range(3)]
    for c in range(3):
        scans += [([c], 1, 63, 1, 0)]
    data = encode_progressive(planes, samp, w, h, QT_MILD, scans=scans)
    px, _, _ = decode_jpeg(data)
    np.testing.assert_array_equal(px, _reference_pixels(planes, samp, w, h, QT_MILD))


def test_progressive_fuzz_random_scan_scripts():
    """Property test: ANY valid progressive scan script — random
    contiguous spectral bands, random successive-approximation ladder
    depth, restarts on/off — must reconstruct random sparse coefficients
    exactly (the encoder/decoder pair is gated by the independent
    reference pipeline, so a complementary bug pair cannot hide)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n_bands=st.integers(1, 4),
        dc_al=st.integers(0, 2),
        ac_al=st.integers(0, 2),
        restart=st.sampled_from([0, 0, 3, 5]),
        by=st.integers(1, 4),
        bx=st.integers(1, 4),
    )
    def case(seed, n_bands, dc_al, ac_al, restart, by, bx):
        rng = np.random.default_rng(seed)
        coefs = _rand_coefs(rng, by, bx)
        # random contiguous band split of 1..63
        cuts = sorted(rng.choice(np.arange(2, 63), size=n_bands - 1, replace=False).tolist())
        edges = [1] + cuts + [64]
        bands = [(edges[i], edges[i + 1] - 1) for i in range(len(edges) - 1)]
        scans = [([0], 0, 0, 0, dc_al)]
        for ss, se in bands:
            scans.append(([0], ss, se, 0, ac_al))
        for al in range(dc_al - 1, -1, -1):
            scans.append(([0], 0, 0, al + 1, al))
        for al in range(ac_al - 1, -1, -1):
            for ss, se in bands:
                scans.append(([0], ss, se, al + 1, al))
        w, h = bx * 8, by * 8
        data = encode_progressive([coefs], [(1, 1)], w, h, QT_ONES,
                                  scans=scans, restart_interval=restart)
        px, _, _ = decode_jpeg(data)
        np.testing.assert_array_equal(
            px, _reference_pixels([coefs], [(1, 1)], w, h, QT_ONES)
        )

    case()


def test_progressive_duplicate_sos_component_raises():
    """A progressive scan listing a component twice must raise the named
    error, not silently double-decode (parity with the baseline check)."""
    rng = np.random.default_rng(67)
    planes = [_rand_coefs(rng, 1, 1), _rand_coefs(rng, 1, 1), _rand_coefs(rng, 1, 1)]
    data = bytearray(encode_progressive(planes, [(1, 1)] * 3, 8, 8, QT_ONES))
    sos = data.index(b"\xff\xda")  # first scan: interleaved DC over 1,2,3
    assert data[sos + 5] == 1 and data[sos + 7] == 2
    data[sos + 7] = 1  # duplicate component 1
    with pytest.raises(ValueError, match="at most once"):
        decode_jpeg(bytes(data))
