"""Image validation stage: decode / verify inside an Arrow-batched UDF.

Design for 100 TB: the `bytes` column is the dominant cost.  The validator
is a **scalar pandas UDF over exactly (bytes, w, h, fmt)** returning a
struct of booleans — the caption and passthrough columns never cross the
JVM/Python boundary, and `bytes` itself crosses once, in Arrow batches
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.  The original
`bytes` column is passed through untouched JVM-side (byte-exact invariant).

Reference analogue: the sampled row-validator ``_validate_stats``
(``additional_charge_checks.py:758-792,840-868``) — here run on every row,
vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources import codecs as C

MIN_DIM, MAX_DIM = 2, 16384

_FLAG_SCHEMA = (
    "magic_ok boolean, decodable boolean, dims_match boolean, "
    "dims_bounds boolean, psnr_ok boolean"
)


def validate_batch(
    data: pd.Series,
    w: pd.Series,
    h: pd.Series,
    fmt: pd.Series,
    min_dim: int = MIN_DIM,
    max_dim: int = MAX_DIM,
) -> pd.DataFrame:
    """Shared by the Spark UDF and the pandas oracle (engine parity).
    Dimension bounds come from PipelineSettings (config.py)."""
    n = len(data)
    magic_ok = np.zeros(n, dtype=bool)
    decodable = np.zeros(n, dtype=bool)
    dims_match = np.zeros(n, dtype=bool)
    dims_bounds = np.zeros(n, dtype=bool)
    psnr_ok = np.ones(n, dtype=bool)  # lossless formats are byte-exact
    for i in range(n):
        b = data.iloc[i]
        if b is None or (isinstance(b, float) and pd.isna(b)) or len(b) == 0:
            continue
        b = bytes(b)
        f = fmt.iloc[i]
        sniffed = C.sniff_format(b)
        magic_ok[i] = sniffed is not None and sniffed == f
        try:
            if f == "jpeg":  # reserved hook: no jpeg library in sandbox
                C.decode_jpeg_stub(b)
            img = C.decode(b, sniffed)
        except (C.CodecError, NotImplementedError):
            continue
        decodable[i] = True
        ih, iw = img.shape[:2]
        dims_match[i] = (iw == w.iloc[i]) and (ih == h.iloc[i])
        dims_bounds[i] = min_dim <= iw <= max_dim and min_dim <= ih <= max_dim
        if sniffed in C.LOSSY_FORMATS:
            # the north rule's lossy invariant, made real by the DQJ codec:
            # the stream's own quantization tables must guarantee ≥ 40 dB
            # worst-case fidelity (LAION/DataComp-style quality-factor
            # filtering; see codecs.dqj_psnr_floor).  Header-only — no
            # re-encode in the hot path.  Lossless formats skip this:
            # byte-exact by construction.
            try:
                psnr_ok[i] = C.LOSSY_PSNR_FLOOR[sniffed](b) >= 40.0
            except C.CodecError:
                psnr_ok[i] = False
    return pd.DataFrame(
        {
            "magic_ok": magic_ok,
            "decodable": decodable,
            "dims_match": dims_match,
            "dims_bounds": dims_bounds,
            "psnr_ok": psnr_ok,
        }
    )


def image_validator_udf(min_dim: int = MIN_DIM, max_dim: int = MAX_DIM):
    """pandas_udf (bytes, w, h, fmt) -> struct of validity flags.  The
    dimension bounds are closed over (tiny ints shipped with the UDF)."""
    from pyspark.sql import functions as F

    @F.pandas_udf(_FLAG_SCHEMA)
    def _validate(
        data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series
    ) -> pd.DataFrame:
        return validate_batch(data, w, h, fmt, min_dim, max_dim)

    return _validate
