"""The vendored PNG shim (tests/vendor/minipil) that backs the PIL-present
evidence run (VERDICT r3 #7). Exercised in a subprocess with PYTHONPATH set
so the parent pytest process never gains a ``PIL`` module (that would flip
``functions.images.HAVE_PIL`` for the rest of the suite).

The Spark-side evidence run itself is ``scripts/pil_evidence.sh`` — it runs
the skipif-gated test tests/test_multimodal.py::
test_extract_features_decodes_real_png_with_pil with the shim importable on
driver AND executors; its result is recorded in COVERAGE.md.
"""

import os
import subprocess
import sys

VENDOR = os.path.join(os.path.dirname(__file__), "vendor", "minipil")

CHECKS = r"""
import io
import numpy as np
from PIL import Image, UnidentifiedImageError

rng = np.random.default_rng(7)
# gray / LA / RGB / RGBA roundtrip through a real PNG, convert("RGB") parity
for shape in [(5, 7, 3), (4, 3, 4), (9, 2, 1), (6, 6, 2)]:
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr if shape[2] > 1 else arr[:, :, 0]).save(buf, format="PNG")
    rgb = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"), dtype=np.uint8)
    assert rgb.shape == (shape[0], shape[1], 3)
    if shape[2] >= 3:
        assert (rgb == arr[:, :, :3]).all()  # alpha dropped, like Pillow
    else:
        assert (rgb == np.repeat(arr[:, :, :1], 3, axis=2)).all()

# decoder handles filter types 1-4 (our encoder only emits 0, so filtered
# scanlines are synthesized here)
import struct, zlib
def enc(px, ft):
    h, w, c = px.shape
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    out, prev = bytearray(), np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int64)
        f = bytearray([ft])
        for i in range(len(line)):
            a = line[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ft == 1: v = line[i] - a
            elif ft == 2: v = line[i] - b
            elif ft == 3: v = line[i] - (a + b) // 2
            else:
                p = a + b - cc; pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                v = line[i] - (a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc))
            f.append(v & 0xFF)
        out += f
        prev = line
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))

px = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
for ft in (1, 2, 3, 4):
    got = np.asarray(Image.open(io.BytesIO(enc(px, ft))))
    assert (got == px).all(), f"filter {ft}"

# hostile bytes raise the PIL-compatible error class (an OSError), which
# decode paths convert to the documented ValueError contract
try:
    Image.open(io.BytesIO(b"junk-not-a-png"))
except UnidentifiedImageError:
    pass
else:
    raise AssertionError("corrupt bytes did not raise")

# non-PNG save must fail loudly: the shim must never silently stand in for
# Pillow's JPEG/WebP encoders
try:
    Image.fromarray(px).save(io.BytesIO(), format="JPEG")
except NotImplementedError:
    pass
else:
    raise AssertionError("JPEG save did not raise")
print("MINIPIL_OK")
"""


def test_minipil_codec_contract():
    env = dict(os.environ, PYTHONPATH=VENDOR)
    out = subprocess.run(
        [sys.executable, "-c", CHECKS], capture_output=True, text=True, env=env,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MINIPIL_OK" in out.stdout
