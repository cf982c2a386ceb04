"""Image near-duplicate detection — the multimodal twin of the SimHash
text pipeline (a training-data pipeline dedups images, not just text).

Two layers, scale-ordered:

* :func:`phash_near_dup_pairs` — pure Catalyst: pigeonhole chunk
  banding + popcount verify over the STORED ``phash`` column
  (input_hint ships one per row), via the shared
  :func:`~sitemapper_spark.operators.dedup_ops.hamming_band_pairs`
  core. No decode, no Python, never all-pairs — the 100 TB path.
* :func:`decode_signatures` — Arrow ``mapInPandas`` decode producing a
  recomputed perceptual hash plus an exact brightness-invariant
  fingerprint (md5 of the offset-normalized pixel array). Feeding its
  ``phash_rec`` into the banding instead of the stored column verifies
  the payloads themselves; the ``norm_fp`` equality join gives an
  EXACT verification layer for pairs the perceptual hash recalls
  (used by the oracled ``image_near_dup`` query: a global brightness
  shift preserves dhash block-mean differences bit-for-bit AND the
  offset-normalized pixels, so planted shifted twins are provably the
  only surviving pairs).

The perceptual hash is `functions/images.dhash64` (8x9 block-mean
difference hash); hamming distance over it is the standard near-dup
metric for re-encoded / brightness-shifted / lightly-edited images.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.images import decode_image, dhash64
from .dedup_ops import hamming_band_pairs

__all__ = [
    "phash_near_dup_pairs",
    "decode_signatures",
    "designed_hash_pixels",
    "flip_last_col_bits",
]


def _dhash_grid(w: int, h: int):
    """The exact block grid dhash64 reduces over (same linspace)."""
    ys = np.linspace(0, h, 9, dtype=np.int64)
    xs = np.linspace(0, w, 10, dtype=np.int64)
    return ys, xs


def designed_hash_pixels(bits: np.ndarray, w: int = 16, h: int = 12) -> np.ndarray:
    """(h, w, 3) uint8 pixels whose ``dhash64`` equals ``bits`` EXACTLY.

    ``bits`` is (8, 8) in {0, 1}: bit (i, j) = (block[i, j+1] >
    block[i, j]). Each of the hash's 8x9 blocks is filled with one
    constant, built as a per-row walk v[i, j+1] = v[i, j] ± 8 from 128
    — values stay in [64, 192] and every comparison is strict by an
    8-gray margin. All values are multiples of 4, so the qjpg
    quantizer ((v // 4) * 4 + 2) shifts every block by exactly +2 and
    preserves every comparison: the construction survives the lossy
    path bit-for-bit.

    This is the constructive oracle for the hamming > 0 banding
    contract (``image_near_dup_h2``): a hash function inverted onto
    its own block grid, so planted hamming distances are exact by
    construction, not by hoping a pixel edit flips the right bit.
    """
    assert bits.shape == (8, 8)
    vals = np.empty((8, 9), dtype=np.int64)
    vals[:, 0] = 128
    for j in range(8):
        vals[:, j + 1] = vals[:, j] + np.where(bits[:, j] > 0, 8, -8)
    ys, xs = _dhash_grid(w, h)
    px = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(8):
        for j in range(9):
            px[ys[i]:ys[i + 1], xs[j]:xs[j + 1], :] = np.uint8(vals[i, j])
    return px


def flip_last_col_bits(bits: np.ndarray, rows: list[int]) -> np.ndarray:
    """Flip comparison (row, 7) for each given row — the LAST column.

    Block (i, 8) participates in exactly ONE comparison
    (block[i, 8] > block[i, 7]), so regenerating pixels from the
    flipped pattern changes only that bit of the hash: the resulting
    twin is at hamming == len(rows) from the original, exactly.
    (Flipping an interior bit (i, j<7) would move block (i, j+1),
    which also feeds comparison (i, j+1) — not hamming-exact.)
    """
    out = bits.copy()
    for r in rows:
        out[r, 7] ^= 1
    return out


def phash_near_dup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 2,
) -> DataFrame:
    """(id_a, id_b, hamming) image pairs within ``max_hamming`` bits of
    perceptual-hash distance. Perfect recall ≤ max_hamming (pigeonhole
    banding), exact popcount precision; shuffles only (id, chunk) keys.
    """
    return hamming_band_pairs(
        images.select(id_col, phash_col), id_col, phash_col, max_hamming
    )


_SIG_SCHEMA = "image_id string, phash_rec bigint, norm_fp string, err string"


def decode_signatures(images: DataFrame) -> DataFrame:
    """Decode each payload and emit (image_id, phash_rec, norm_fp):
    ``phash_rec`` = dhash64 over the decoded pixels; ``norm_fp`` = md5
    of the offset-normalized int16 pixel array (px - px[0,0,0]) —
    invariant under exact global brightness shifts, distinct otherwise.
    Decode failures report err instead of failing the job."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                try:
                    px = decode_image(bytes(data), fmt)
                    norm = (px.astype(np.int16) - np.int16(px[0, 0, 0]))
                    fp = hashlib.md5(norm.tobytes()).hexdigest()
                    out.append((image_id, dhash64(px), fp, None))
                except Exception as e:  # noqa: BLE001 — row-level report
                    out.append((image_id, None, None, str(e)[:200]))
            yield pd.DataFrame(
                out, columns=["image_id", "phash_rec", "norm_fp", "err"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        sig, schema=_SIG_SCHEMA
    )
