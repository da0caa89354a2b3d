"""Gorilla chunk compression: delta-of-delta timestamps + XOR float values.

north_rule mandate (no rove counterpart — the reference keeps series as
plain ``Vec<Option<f32>>`` in memory, ``/root/reference/src/data_switch.rs:
141-145``). Implements the Facebook Gorilla paper's encodings
(Pelkonen et al., VLDB 2015, §4.1/4.2 — public algorithm):

- timestamps: header t0 (64b) + first delta (64b), then delta-of-delta D in
  variable-length classes: ``0`` (D=0), ``10``+7b (−63..64), ``110``+9b
  (−255..256), ``1110``+12b (−2047..2048), ``1111``+64b (the paper uses
  32-bit for the first delta and the fallback; this codec widens both to
  64 so it is total over int64 timestamps — see encode_timestamps);
- float32 values: XOR with the previous value; ``0`` (xor=0), ``10`` +
  meaningful bits when they fit the previous leading/length window,
  ``11`` + 5b leading + 6b length + meaningful bits;
- gaps (NULL slots) are carried in a separate presence bitmap so
  ``Option<f32>`` round-trips exactly (values stream encodes only the
  present points).

Dtype is float32 end-to-end (reference f32 semantics); NaN round-trips
bit-exactly since XOR works on raw bits.

Execution shape: the heavy per-element math (deltas, XORs, leading/
trailing-zero counts, class selection) is vectorized numpy; only the final
bit-packing is a tight Python loop (inherently sequential). Chunks are
bounded (one (series, day) group by default) and encode inside
``applyInPandas``, so the loop cost parallelizes across executors and
never touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TS_CLASSES = (
    (-63, 64, 0b10, 2, 7),
    (-255, 256, 0b110, 3, 9),
    (-2047, 2048, 0b1110, 4, 12),
)


class _BitWriter:
    __slots__ = ("acc", "nbits", "chunks")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.chunks: list[bytes] = []

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        if self.nbits >= 4096:
            spill = self.nbits % 8
            take = self.nbits - spill
            self.chunks.append((self.acc >> spill).to_bytes(take // 8, "big"))
            self.acc &= (1 << spill) - 1
            self.nbits = spill

    def getvalue(self) -> bytes:
        pad = (-self.nbits) % 8
        acc, nbits = self.acc << pad, self.nbits + pad
        return b"".join(self.chunks) + acc.to_bytes(nbits // 8, "big")


class _BitReader:
    """Incremental big-endian bit reader: O(1) amortized per read (a whole-
    blob bigint shift per read would make decode O(n²))."""

    __slots__ = ("data", "byte_pos", "acc", "acc_bits")

    def __init__(self, data: bytes):
        self.data = data
        self.byte_pos = 0
        self.acc = 0
        self.acc_bits = 0

    def read(self, nbits: int) -> int:
        while self.acc_bits < nbits:
            self.acc = (self.acc << 8) | self.data[self.byte_pos]
            self.byte_pos += 1
            self.acc_bits += 8
        self.acc_bits -= nbits
        out = self.acc >> self.acc_bits
        self.acc &= (1 << self.acc_bits) - 1
        return out


def encode_timestamps(ts: np.ndarray) -> bytes:
    """int64 seconds → delta-of-delta bitstream."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    out = _BitWriter()
    out.write(n, 32)
    if n == 0:
        return out.getvalue()
    out.write(int(ts[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    if n == 1:
        return out.getvalue()
    deltas = np.diff(ts)
    # 64-bit first delta + 64-bit fallback class: the codec is total over
    # int64 (the paper's 32-bit fallback assumes bounded wall-clock deltas;
    # a batch engine must not crash on pathological input)
    out.write(int(deltas[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    dod = np.diff(deltas)
    # hot loop with inlined accumulator (cf. encode_values)
    acc, nbits = out.acc, out.nbits
    chunks = out.chunks
    for d in dod.tolist():
        if d == 0:
            acc <<= 1
            nbits += 1
        elif -63 <= d <= 64:
            acc = (((acc << 2) | 0b10) << 7) | (d + 63)
            nbits += 9
        elif -255 <= d <= 256:
            acc = (((acc << 3) | 0b110) << 9) | (d + 255)
            nbits += 12
        elif -2047 <= d <= 2048:
            acc = (((acc << 4) | 0b1110) << 12) | (d + 2047)
            nbits += 16
        else:
            acc = (((acc << 4) | 0b1111) << 64) | (d & 0xFFFFFFFFFFFFFFFF)
            nbits += 68
        if nbits >= 4096:
            spill = nbits % 8
            take = nbits - spill
            chunks.append((acc >> spill).to_bytes(take // 8, "big"))
            acc &= (1 << spill) - 1
            nbits = spill
    out.acc, out.nbits = acc, nbits
    return out.getvalue()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = r.read(64)
    out[0] = t0 - (1 << 64) if t0 >= (1 << 63) else t0
    if n == 1:
        return out
    d = r.read(64)
    delta = d - (1 << 64) if d >= (1 << 63) else d
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            pass
        else:
            cls = 1
            while cls < 4 and r.read(1) == 1:
                cls += 1
            if cls < 4:
                lo, _hi, _p, _pl, vbits = _TS_CLASSES[cls - 1]
                delta += r.read(vbits) + lo
            else:
                raw = r.read(64)
                delta += raw - (1 << 64) if raw >= (1 << 63) else raw
        out[i] = out[i - 1] + delta
    return out


def encode_values(values: np.ndarray) -> bytes:
    """float32 array → XOR bitstream (Gorilla §4.2, 32-bit variant:
    5-bit leading-zero count, 6-bit meaningful length)."""
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float32)).view(np.uint32)
    n = len(v)
    out = _BitWriter()
    out.write(n, 32)
    if n == 0:
        return out.getvalue()
    out.write(int(v[0]), 32)
    if n == 1:
        return out.getvalue()
    xors = v[1:] ^ v[:-1]
    # vectorized leading/trailing zero counts for 32-bit words
    nz = xors != 0
    lead = np.where(nz, 31 - np.floor(np.log2(np.maximum(xors, 1)).astype(np.int64)), 32)
    low = (xors & (~xors + np.uint32(1))).astype(np.uint64)  # lowest set bit
    trail = np.where(nz, np.round(np.log2(np.maximum(low, 1))).astype(np.int64), 32)
    # hot loop: accumulator inlined (method-call overhead is ~40% of encode
    # time otherwise); flushed back into the writer at the end
    xs = xors.tolist()
    ld = lead.astype(np.int64).tolist()
    tr = trail.astype(np.int64).tolist()
    acc, nbits = out.acc, out.nbits
    chunks = out.chunks
    prev_lead, prev_mlen = -1, -1
    for i, x in enumerate(xs):
        if x == 0:
            acc <<= 1
            nbits += 1
        else:
            lz = ld[i]
            if lz > 31:
                lz = 31  # 5-bit field
            tz = tr[i]
            mlen = 32 - lz - tz
            if prev_lead >= 0 and lz >= prev_lead and (32 - prev_lead - prev_mlen) <= tz:
                acc = (acc << 2) | 0b10
                acc = (acc << prev_mlen) | (x >> (32 - prev_lead - prev_mlen))
                nbits += 2 + prev_mlen
            else:
                acc = (((acc << 2) | 0b11) << 11) | (lz << 6) | (mlen - 1)
                acc = (acc << mlen) | (x >> tz)
                nbits += 13 + mlen
                prev_lead, prev_mlen = lz, mlen
        if nbits >= 4096:
            spill = nbits % 8
            take = nbits - spill
            chunks.append((acc >> spill).to_bytes(take // 8, "big"))
            acc &= (1 << spill) - 1
            nbits = spill
    out.acc, out.nbits = acc, nbits
    return out.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out.view(np.float32)
    cur = r.read(32)
    out[0] = cur
    # hot loop: bit reader inlined (same rationale as the encoder)
    data = r.data
    byte_pos, acc, acc_bits = r.byte_pos, r.acc, r.acc_bits
    lead, mlen = 0, 0
    vals = out
    for i in range(1, n):
        if acc_bits < 1:
            acc = (acc << 8) | data[byte_pos]
            byte_pos += 1
            acc_bits += 8
        top = (acc >> (acc_bits - 1)) & 1
        acc_bits -= 1
        if top == 0:
            acc &= (1 << acc_bits) - 1  # keep the accumulator bounded
            vals[i] = cur
            continue
        if acc_bits < 1:
            acc = (acc << 8) | data[byte_pos]
            byte_pos += 1
            acc_bits += 8
        ctrl = (acc >> (acc_bits - 1)) & 1
        acc_bits -= 1
        if ctrl == 1:  # '11': new window
            while acc_bits < 11:
                acc = (acc << 8) | data[byte_pos]
                byte_pos += 1
                acc_bits += 8
            acc_bits -= 11
            hdr = (acc >> acc_bits) & 0x7FF
            lead = hdr >> 6
            mlen = (hdr & 0x3F) + 1
        while acc_bits < mlen:
            acc = (acc << 8) | data[byte_pos]
            byte_pos += 1
            acc_bits += 8
        acc_bits -= mlen
        bits = (acc >> acc_bits) & ((1 << mlen) - 1)
        acc &= (1 << acc_bits) - 1
        cur ^= bits << (32 - lead - mlen)
        vals[i] = cur
    return out.view(np.float32)


def encode_chunk_masked(ts_seconds: np.ndarray, values: np.ndarray, present: np.ndarray) -> dict:
    """Encode a chunk: all slot timestamps, presence bitmap, and the XOR
    stream over *present* values only."""
    ts_blob = encode_timestamps(ts_seconds)
    present = np.asarray(present, dtype=bool)
    val_blob = encode_values(np.asarray(values, dtype=np.float32)[present])
    presence = np.packbits(present).tobytes()
    raw = np.asarray(ts_seconds, dtype=np.int64).tobytes() + np.asarray(
        values, dtype=np.float32
    )[present].tobytes()
    return {
        "n_points": int(len(ts_seconds)),
        "n_present": int(present.sum()),
        "ts_codec": ts_blob,
        "val_codec": val_blob,
        "presence": presence,
        "checksum": zlib.crc32(raw) & 0xFFFFFFFF,
    }


def decode_chunk_masked(chunk: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (ts_seconds int64[n], values float32[n] with NaN at gaps,
    present bool[n])."""
    ts = decode_timestamps(chunk["ts_codec"])
    n = chunk["n_points"]
    present = np.unpackbits(np.frombuffer(chunk["presence"], dtype=np.uint8))[:n].astype(bool)
    vals_present = decode_values(chunk["val_codec"])
    values = np.full(n, np.nan, dtype=np.float32)
    values[present] = vals_present
    return ts, values, present


# ---------------------------------------------------------------- Spark --

CHUNK_SCHEMA = (
    "series_id string, chunk_start timestamp, n_points int, n_present int, "
    "ts_codec binary, val_codec binary, presence binary, checksum long"
)


def compress_series(
    df,
    value_col: str,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    chunk: str = "day",
    group_chunk: str = "month",
):
    """DataFrame (series, ts, value[, …]) → Gorilla chunk table, one row
    per (series, ``chunk`` start).

    Two-level chunking: the *shuffle group* is (series, ``group_chunk``)
    — coarse, so each grouped-UDF invocation amortizes its fixed Arrow/
    pandas overhead over many points (44k day-groups of ~24 points ran 6×
    slower than 2k month-groups emitting the same day-chunks) — while the
    *codec chunk* stays fine-grained (``chunk``) for retention/seek
    granularity. Group size stays bounded (series × month), which is the
    hot-key story for this stage (SURVEY §4)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def enc(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("_epoch")
        out = []
        for (series, chunk_start), part in pdf.groupby(["_series", "_chunk"], sort=False):
            ts = part["_epoch"].to_numpy(np.int64)
            raw = part[value_col].to_numpy(dtype=np.float32, na_value=np.nan)
            present = part[value_col].notna().to_numpy()
            c = encode_chunk_masked(ts, raw, present)
            out.append(
                (
                    series,
                    chunk_start,
                    c["n_points"],
                    c["n_present"],
                    c["ts_codec"],
                    c["val_codec"],
                    c["presence"],
                    c["checksum"],
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "series_id",
                "chunk_start",
                "n_points",
                "n_present",
                "ts_codec",
                "val_codec",
                "presence",
                "checksum",
            ],
        )

    from rove_spark.operators.util import parallel_groups

    prepped = df.select(
        F.col(series_col).cast("string").alias("_series"),
        F.date_trunc(group_chunk, F.col(ts_col)).alias("_group"),
        F.date_trunc(chunk, F.col(ts_col)).alias("_chunk"),
        F.unix_timestamp(F.col(ts_col)).alias("_epoch"),
        F.col(value_col).cast("float").alias(value_col),
    )
    return (
        parallel_groups(prepped, "_series", "_group")
        .groupBy("_series", "_group")
        .applyInPandas(enc, CHUNK_SCHEMA)
    )


def decompress_series(chunks_df, value_col: str = "value"):
    """Chunk table → long (series_id, ts, value, is_gap) rows; verifies the
    CRC of every chunk (corruption surfaces as an exception, not silence)."""
    import pandas as pd

    def dec(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                chunk = {
                    "n_points": row.n_points,
                    "ts_codec": row.ts_codec,
                    "val_codec": row.val_codec,
                    "presence": row.presence,
                }
                ts, values, present = decode_chunk_masked(chunk)
                raw = ts.tobytes() + values[present].tobytes()
                if (zlib.crc32(raw) & 0xFFFFFFFF) != row.checksum:
                    raise ValueError(f"checksum mismatch for {row.series_id}@{row.chunk_start}")
                frames.append(
                    pd.DataFrame(
                        {
                            "series_id": row.series_id,
                            "ts": pd.to_datetime(ts, unit="s"),
                            value_col: pd.Series(values).where(present, None),
                            "is_gap": ~present,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=["series_id", "ts", value_col, "is_gap"]
            )

    from rove_spark.operators.util import parallel_groups

    # chunk rows are few but CPU-heavy to decode — spread them explicitly
    # (AQE would coalesce this tiny-by-bytes stage onto one worker)
    return parallel_groups(chunks_df, "series_id", "chunk_start").mapInPandas(
        dec, f"series_id string, ts timestamp, {value_col} float, is_gap boolean"
    )
