"""Deterministic image+caption fixture corpus (FIXTURES.md F1).

Generates the exact ``input_hint`` schema:
``(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash long)`` with planted anomalies for every pipeline rule, fixed seed ⇒
byte-identical tables.  The sibling ``labels`` table is produced by the
pandas oracle (``oracle/pandas_oracle.py``) from the generated data itself,
so expected labels are *computed*, never hand-maintained.

Skew knobs (FIXTURES.md): ~80% of captions in one language (hot key for the
salting path) and ~25% of rows sharing one phash bucket (hot partition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import text as TX
from . import codecs as C
from . import seed_corpus as SCorp

FORMATS = ("png", "ppm", "bmp")  # base lossless mix; DQJ cohorts are index-gated below
HOT_LANG = "en"
HOT_LANG_FRACTION = 0.8
HOT_PHASH_FRACTION = 0.25
MIN_DIM, MAX_DIM = 2, 16384


def ahash64(img: np.ndarray) -> int:
    """Average-hash: 8x8 grid sample of the grayscale image vs its mean.
    Deterministic pixel-content hash → int64 (the `phash` column)."""
    if img.ndim == 3:
        gray = img.mean(axis=2)
    else:
        gray = img.astype(np.float64)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    grid = gray[np.ix_(ys, xs)]
    bits = (grid > grid.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's-complement into signed int64 range (subtracting 2**63 instead
    # would CLEAR the top bit — aliasing fingerprints that differ only in
    # bit 63 onto the same value)
    return val - (1 << 64) if val >= (1 << 63) else val


def _block_image(flip: int = 0) -> np.ndarray:
    """32×32 RGB of 4×4-pixel blocks aligned to the 8×8 ahash grid: a
    40/215 checkerboard, with the first `flip` diagonal blocks pushed
    across the grid mean.  Every block sits ≥80 gray levels from the grid
    mean, so `ahash64(_block_image(k))` differs from `ahash64(_block_image(0))`
    in EXACTLY k bits — deterministic planted Hamming-k image near-dups."""
    vals = np.where(np.add.outer(np.arange(8), np.arange(8)) % 2 == 0, 215, 40)
    for j in range(flip):
        vals[j, j] = 255 - vals[j, j]
    img = np.kron(vals, np.ones((4, 4), dtype=vals.dtype)).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


def _make_image(rng: np.random.Generator, size: tuple[int, int] | None = None) -> np.ndarray:
    if size is None:
        s = int(rng.integers(8, 65))
        size = (s, s)
    return rng.integers(0, 256, size=size + (3,), dtype=np.uint8)


def generate_corpus(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Build the images table as pandas (driver-side; fixture scale only)."""
    rng = np.random.default_rng(seed)
    langs = list(SCorp.LANGS)

    # pre-generate caption pools
    pools = {lang: SCorp.sentences(lang, max(200, n_rows // 4), seed + 7) for lang in langs}
    gib_pool = SCorp.gibberish(max(50, n_rows // 20), seed + 13)

    hot_img = _make_image(np.random.default_rng(seed + 99), (32, 32))
    hot_phash_bytes = {fmt: C.ENCODERS[fmt](hot_img) for fmt in FORMATS}

    rows = []
    for i in range(n_rows):
        u = rng.random()
        image_id = f"img{i:010d}"
        # ~0.5% duplicate ids (uniqueness rule material for dedup metrics)
        if i > 10 and rng.random() < 0.005:
            image_id = f"img{int(rng.integers(0, i)):010d}"

        fmt = FORMATS[int(rng.integers(0, 3))]
        if rng.random() < HOT_PHASH_FRACTION:
            img = hot_img
            data = hot_phash_bytes[fmt]
        else:
            img = _make_image(rng)
            data = C.ENCODERS[fmt](img)
        h_true, w_true = img.shape[:2]
        w_decl, h_decl = w_true, h_true

        # image anomalies
        r = rng.random()
        if r < 0.01:  # NULL bytes
            data = None
        elif r < 0.015:  # corrupted: truncate or garble magic
            data = data[: max(4, len(data) // 3)] if rng.random() < 0.5 else b"XX" + data[2:]
        elif r < 0.025:  # declared dims mismatch
            w_decl = w_true + int(rng.integers(1, 5))
        elif r < 0.030:  # wrong fmt label vs magic
            fmt = FORMATS[(FORMATS.index(fmt) + 1) % 3]
        elif r < 0.035:  # bounds violation: giant declared dims (also mismatch)
            w_decl, h_decl = 20000, 20000
        elif r < 0.040:  # bounds violation: tiny actual image (1x1, decodes fine)
            img = _make_image(rng, (1, 1))
            data = C.ENCODERS[fmt](img)
            h_true, w_true = 1, 1
            w_decl, h_decl = 1, 1
        elif i % 37 == 5:  # lossy DQJ at default quality (clears the 40 dB floor)
            # index-gated (not rng-gated) so these cohorts don't perturb the
            # rng stream of every subsequent row
            fmt = "dqj"
            data = C.encode_dqj(img)
        elif i % 37 == 17:  # lossy DQJ at low quality → psnr_ok rule failure
            fmt = "dqj"
            data = C.encode_dqj(img, quality=60)
        elif i % 101 == 13:  # planted image near-dup cluster, base fingerprint
            img = _block_image(0)
            data = C.ENCODERS[fmt](img)
            h_true, w_true = img.shape[:2]
            w_decl, h_decl = w_true, h_true
        elif i % 101 == 47:  # near-dup variant: ahash Hamming EXACTLY 2 from base
            img = _block_image(2)
            data = C.ENCODERS[fmt](img)
            h_true, w_true = img.shape[:2]
            w_decl, h_decl = w_true, h_true

        # caption: hot-language skew
        lang = HOT_LANG if u < HOT_LANG_FRACTION else langs[int(rng.integers(0, len(langs)))]
        pool = pools[lang]
        caption = pool[int(rng.integers(0, len(pool)))]

        rc = rng.random()
        if rc < 0.02:  # blank
            caption = None if rc < 0.01 else ""
        elif rc < 0.04:  # too short
            caption = pool[int(rng.integers(0, len(pool)))].split()[0][:6]
        elif rc < 0.05:  # too long (> MAX_CHARS)
            caption = " ".join(
                pool[int(rng.integers(0, len(pool)))] for _ in range(400)
            )
        elif rc < 0.07:  # symbol heavy
            caption = caption + " @#$%^&*!!! ###" * max(3, len(caption) // 20)
        elif rc < 0.09:  # repetition
            word = caption.split()[0]
            caption = " ".join([word] * 30)
        elif rc < 0.11:  # gibberish (high perplexity)
            caption = gib_pool[int(rng.integers(0, len(gib_pool)))]
        elif rc < 0.13:  # toxicity
            words = caption.split()
            words.insert(int(rng.integers(0, len(words))), TX.TOXICITY_WORDS[int(rng.integers(0, len(TX.TOXICITY_WORDS)))])
            caption = " ".join(words)
        elif rc < 0.16:  # PII (scrubbed, not dropped)
            kind = int(rng.integers(0, 3))
            if kind == 0:
                caption += f" contact user{int(rng.integers(1, 999))}@example.com"
            elif kind == 1:
                caption += f" ssn {int(rng.integers(100, 999))}-{int(rng.integers(10, 99))}-{int(rng.integers(1000, 9999))}"
            else:
                caption += f" call ({int(rng.integers(200, 999))}) {int(rng.integers(200, 999))}-{int(rng.integers(1000, 9999))}"

        phash = ahash64(img) if data is not None else 0
        rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": w_decl,
                "h": h_decl,
                "fmt": fmt,
                "caption": caption,
                "phash": phash,
            }
        )

    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def write_corpus(
    out_dir: str, n_rows: int, seed: int = 42, n_files: int | None = None
) -> str:
    """Write the images table under out_dir; returns the table path.

    Large tiers are written as a DIRECTORY of part files: a single parquet
    file with one huge row group is unsplittable, which serializes the scan
    stage no matter how many cores the session has (and faked an early
    scaling measurement).  ≥2 files per core keeps every level fully
    subscribed (BASELINE.md §3 protocol: ≥128 tasks).
    """
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pdf = generate_corpus(n_rows, seed)
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    if n_files is None:
        n_files = 128 if n_rows >= 50_000 else 1
    path = os.path.join(out_dir, "images.parquet")
    if n_files == 1:
        pq.write_table(table, path)
        return path
    if os.path.isfile(path):
        os.remove(path)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    per = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))
    return path
