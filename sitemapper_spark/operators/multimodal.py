"""Multimodal (image/audio/video) column operators.

Media ride as opaque ``binary`` columns with typed metadata
(BASELINE.json.input_hint: ``bytes, w, h, fmt, caption, phash``); all
compute is Arrow-batched ``mapInPandas`` so each Python worker sees
whole record batches. The Spark-side plumbing (schemas, batch shapes,
partitioning) is real and tested; codecs this container lacks are
stubbed behind ``NotImplementedError`` as mandated:

* image decode: REAL for the corpus formats (pure-numpy PNG + the
  deterministic lossy stand-in, :mod:`sitemapper_spark.functions.images`);
* image resize / grayscale / phash: REAL (numpy block-mean);
* audio decode / video frame-sample: STUBS — deterministic fakes for
  plumbing tests, ``NotImplementedError`` for real codecs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.images import decode_image, dhash64, psnr, synth_pixels

__all__ = [
    "decode_verify",
    "image_features",
    "resize_images",
    "audio_decode_stub",
    "video_frame_sample_stub",
]

_VERIFY_SCHEMA = (
    "url string, image_id string, fmt string, phash bigint, ok boolean, "
    "psnr_db double, caption_ok boolean, err string"
)


def _verify_batches(
    batches: Iterator[pd.DataFrame], min_psnr_db: float
) -> Iterator[pd.DataFrame]:
    """mapInPandas body of :func:`decode_verify` (module-level so the
    batch math is unit-benchable without a SparkSession)."""
    from ..corpus import caption_for  # local import: avoid cycle

    # Decode + reference synthesis are per-row (zlib streams and
    # per-id seeded generators), but the verify MATH is vectorized
    # across the batch: images of one (h, w) shape — in practice
    # the whole corpus — are stacked and PSNR/equality computed in
    # a handful of numpy ops instead of ~6 tiny-array ops per row.
    # Semantics identical to the per-row form: mse == 0 on uint8
    # stacks ⇔ np.array_equal, and per-row error capture is
    # preserved (a failed decode yields ok=false + err, never a
    # failed job).
    for pdf in batches:
        n = len(pdf)
        urls = pdf["url"].tolist()
        ids = pdf["image_id"].tolist()
        fmts = pdf["fmt"].tolist()
        caps = pdf["caption"].tolist()
        px_list: list = [None] * n
        errs: list = [None] * n
        for i, (data, fmt) in enumerate(zip(pdf["bytes"], fmts)):
            try:
                if data is None:
                    raise ValueError("null payload")
                px_list[i] = decode_image(bytes(data), fmt)
            except NotImplementedError as e:
                errs[i] = f"stub: {e}"
            except Exception as e:
                errs[i] = str(e)[:200]
        ok = np.zeros(n, dtype=bool)
        psnr_db = np.zeros(n, dtype=np.float64)
        by_shape: dict = {}
        for i, (w, h) in enumerate(zip(pdf["w"], pdf["h"])):
            if errs[i] is None:
                ref = synth_pixels(ids[i], int(w), int(h))
                if px_list[i].shape == ref.shape:
                    by_shape.setdefault(ref.shape, []).append((i, ref))
                else:  # corrupt header: decoded shape ≠ stated w/h
                    try:
                        psnr(ref, px_list[i])  # raises like before
                    except Exception as e:
                        errs[i] = str(e)[:200]
        for shape, pairs in by_shape.items():
            idxs = np.fromiter((i for i, _ in pairs), dtype=np.int64)
            px = np.stack([px_list[i] for i in idxs]).astype(np.float64)
            refs = np.stack([r for _, r in pairs]).astype(np.float64)
            mse = np.mean((px - refs) ** 2, axis=(1, 2, 3))
            with np.errstate(divide="ignore"):
                p = 10.0 * np.log10(255.0**2 / mse)  # inf where mse=0
            eq = mse == 0.0  # exact: uint8 → float64 is lossless
            is_png = np.fromiter(
                (fmts[i] == "png" for i in idxs), dtype=bool
            )
            ok[idxs] = (is_png & eq) | (p >= min_psnr_db)
            psnr_db[idxs] = np.minimum(p, 999.0)
        cap_ok = [
            errs[i] is None and caps[i] == caption_for(urls[i])
            for i in range(n)
        ]
        failed = np.fromiter((e is not None for e in errs), dtype=bool)
        ok[failed] = False
        psnr_db[failed] = 0.0
        yield pd.DataFrame(
            {
                "url": urls,
                "image_id": ids,
                "fmt": fmts,
                "phash": pdf["phash"].astype("int64").tolist(),
                "ok": ok,
                "psnr_db": psnr_db,
                "caption_ok": cap_ok,
                "err": errs,
            }
        )



def decode_verify(pages: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Decode every image and verify the per-row invariant: decoded
    pixels vs the deterministic source (PSNR ≥ 40 dB lossy / exact
    lossless) + caption equality (input_hint contract).

    ``bytes`` stays columnar Arrow end-to-end; rows where decode fails
    report ``ok=false`` instead of failing the job (fetch-error
    semantics)."""
    cols = ["url", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return pages.select(*cols).mapInPandas(
        lambda it: _verify_batches(it, min_psnr_db), schema=_VERIFY_SCHEMA
    )


_FEAT_SCHEMA = (
    "image_id string, mean_lum double, std_lum double, phash bigint, "
    "phash_recomputed bigint"
)


def image_features(pages: DataFrame) -> DataFrame:
    """Per-image features: luminance stats + recomputed perceptual hash
    (compared against the stored ``phash`` column downstream)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, fmt, phash in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["phash"]
            ):
                try:
                    px = decode_image(bytes(data), fmt)
                    lum = px.astype(np.float64).mean(axis=2)
                    out.append(
                        (image_id, round(float(lum.mean()), 4),
                         round(float(lum.std()), 4), int(phash),
                         dhash64(px))
                    )
                except Exception:
                    out.append((image_id, None, None, int(phash), None))
            yield pd.DataFrame(
                out,
                columns=["image_id", "mean_lum", "std_lum", "phash",
                         "phash_recomputed"],
            )

    return pages.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        feats, schema=_FEAT_SCHEMA
    )


def _block_mean_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real numpy block-mean resize (area-average downsample)."""
    h, w, c = px.shape
    ys = np.linspace(0, h, out_h + 1, dtype=np.int64)
    xs = np.linspace(0, w, out_w + 1, dtype=np.int64)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = px[
                ys[i] : max(ys[i + 1], ys[i] + 1),
                xs[j] : max(xs[j + 1], xs[j] + 1),
            ].mean(axis=(0, 1))
    return out.round().clip(0, 255).astype(np.uint8)


def resize_images(pages: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → block-mean resize → re-encode (PNG). Returns
    (image_id, bytes, w, h, fmt) with the resized payload."""
    from ..functions.images import png_encode

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode_image(bytes(data), fmt)
                    small = _block_mean_resize(px, out_w, out_h)
                    out.append((image_id, png_encode(small), out_w, out_h, "png"))
                except Exception:
                    out.append((image_id, None, out_w, out_h, "png"))
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return pages.select("image_id", "bytes", "fmt").mapInPandas(
        rz, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def audio_decode_stub(media: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """STUB: audio decode. No audio codec libraries exist in this
    container; the Spark plumbing (binary column in, float frame stats
    out, Arrow batching) is real — a deterministic fake 'decoder'
    (bytes → int16 PCM view) stands in so batch shape and schema are
    testable. Raises ``NotImplementedError`` for real formats."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf[fmt_col]):
                if fmt in ("pcm16", "fake"):
                    a = np.frombuffer(bytes(data), dtype="<i2").astype(np.float64)
                    out.append((mid, len(a), round(float(np.abs(a).mean()), 3)))
                else:
                    raise NotImplementedError(
                        f"audio codec {fmt!r}: no audio libraries in container"
                    )
            yield pd.DataFrame(out, columns=["image_id", "n_samples", "mean_abs"])

    return media.select("image_id", "bytes", fmt_col).mapInPandas(
        dec, schema="image_id string, n_samples bigint, mean_abs double"
    )


def video_frame_sample_stub(
    media: DataFrame, every_n: int = 10, fmt_col: str = "fmt"
) -> DataFrame:
    """STUB: video frame sampling. A 'fakevid' payload is a
    concatenation of fixed-size raw RGB frames — the sampler slices
    every ``every_n``-th frame (real plumbing: one row in, many rows
    out via mapInPandas). Real containers (mp4 etc.) raise
    ``NotImplementedError``."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf[fmt_col], pdf["w"], pdf["h"]
            ):
                if fmt != "fakevid":
                    raise NotImplementedError(
                        f"video container {fmt!r}: no video libraries in container"
                    )
                frame_sz = int(w) * int(h) * 3
                buf = bytes(data)
                n_frames = len(buf) // frame_sz
                for fi in range(0, n_frames, every_n):
                    frame = np.frombuffer(
                        buf[fi * frame_sz : (fi + 1) * frame_sz], dtype=np.uint8
                    )
                    out.append((mid, fi, round(float(frame.mean()), 3)))
            yield pd.DataFrame(out, columns=["image_id", "frame_idx", "mean_val"])

    return media.select("image_id", "bytes", fmt_col, "w", "h").mapInPandas(
        sample, schema="image_id string, frame_idx int, mean_val double"
    )
