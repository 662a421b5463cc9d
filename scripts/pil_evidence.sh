#!/bin/sh
# PIL-present evidence run (VERDICT r3 #7): execute the skipif-gated
# real-codec test with the vendored pure-Python PNG shim importable as PIL
# on the driver AND the Spark Python workers (they inherit PYTHONPATH).
# This drives the production `from PIL import Image` branch of
# operators/multimodal._decode_blob end-to-end with real PNG bytes.
#
# Scoped to the gated test on purpose: putting a PNG-only shim on the path
# of the FULL suite would flip functions.images.HAVE_PIL and route
# JPEG/WebP encodes into it (it raises NotImplementedError for those,
# by design).
set -e
cd "$(dirname "$0")/.."
PYTHONPATH="$PWD/tests/vendor/minipil${PYTHONPATH:+:$PYTHONPATH}" \
  exec python -m pytest \
  tests/test_multimodal.py::test_extract_features_decodes_real_png_with_pil \
  -v "$@"
