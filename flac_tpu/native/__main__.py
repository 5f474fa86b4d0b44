"""Explicit native build step: `python -m flac_tpu.native`.

Compiles flac_native.cpp with the host toolchain, verifies the ABI
stamp, and reports which runtime a fresh process would use.
"""

import sys

from . import ABI_VERSION, AVAILABLE, BUILD_ERROR, _SO, build

so = build(force="--force" in sys.argv)
if so is None:
    print(f"BUILD FAILED: {BUILD_ERROR}", file=sys.stderr)
    sys.exit(1)
print(f"built {so} (ABI v{ABI_VERSION}); "
      f"native runtime {'ACTIVE' if AVAILABLE else 'inactive this run'}")
