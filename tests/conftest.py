"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere, deterministically."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend; tests run on a
# deterministic 8-device virtual CPU mesh instead
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache, READ-ONLY by default: the suite is
# compile-dominated on 2 CPUs (cold run ~25+ min), but two distinct
# native crashes live in the cache write/read machinery:
#  - `executable.serialize()` (the write path) segfaults after ~70 tests
#    of accumulated in-process compiles (reproduced twice, different
#    tests each time — accumulation-dependent, not one bad graph);
#  - stale AOT entries compiled under a different jaxlib/CPU feature set
#    SIGILL when deserialized (xla cpu_aot_loader warns exactly this).
# So: the cache directory is keyed by cpuinfo flags + jaxlib version
# (kills stale-entry reads), and cache WRITES are disabled in the test
# process unless FLAC_TPU_CACHE_WRITE=1 — reads never call serialize().
# To (re)populate a cold cache, run the suite once as the warmer:
#   FLAC_TPU_CACHE_WRITE=1 python -m pytest tests/ -q
# (a warmer crash is harmless: entries written before it persist, and a
# rerun resumes from them).
import hashlib  # noqa: E402

import jaxlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _flags = [ln for ln in f if ln.startswith("flags")][0]
    _cpu_key = hashlib.sha1(
        (_flags + jaxlib.__version__).encode()).hexdigest()[:12]
except (OSError, IndexError):
    _cpu_key = "generic-" + jaxlib.__version__
jax.config.update("jax_compilation_cache_dir",
                  f"/root/repo/.jax_cache-{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The crashes are driven by ACCUMULATION: after roughly 50-100
# (de)serialize calls in one process the next one faults regardless of
# which entry it touches (reproduced on reads and writes, different tests
# each run).  So instead of choosing between "no cache" (cold every run)
# and "crash eventually", cap the number of persistent-cache operations
# per process; past the budget every compile is plain in-process (safe).
# Combined with pytest-xdist file splitting (pytest.ini: -n 2), each
# worker stays far below the crash threshold while the hottest graphs
# still load from cache.
# Default 0 = persistent cache fully OFF for the suite: cached CPU AOT
# entries deserialize with mismatched target-feature flags on this image
# (xla cpu_aot_loader warns "+prefer-no-scatter ... could lead to
# SIGILL") and intermittently kill xdist workers mid-run — a crashed
# worker wedges the whole session.  Cold compiles are slower (~40 min
# full suite on 2 CPUs) but deterministic.  Opt back in with
# FLAC_TPU_CACHE_OPS=N (+ FLAC_TPU_CACHE_WRITE=1 for the warmer).
_CACHE_OP_BUDGET = int(os.environ.get("FLAC_TPU_CACHE_OPS", "0"))
_CACHE_WRITES = os.environ.get("FLAC_TPU_CACHE_WRITE") == "1"
from jax._src import compilation_cache as _cc  # noqa: E402

_orig_get = _cc.get_executable_and_time
_orig_put = _cc.put_executable_and_time
_budget = {"n": _CACHE_OP_BUDGET}


def _capped_get(*a, **k):
    if _budget["n"] <= 0:
        return None, None
    _budget["n"] -= 1
    return _orig_get(*a, **k)


def _capped_put(*a, **k):
    # serialize() is the crashier direction: writes only in the
    # explicitly opted-in warmer run (FLAC_TPU_CACHE_WRITE=1)
    if not _CACHE_WRITES or _budget["n"] <= 0:
        return None
    _budget["n"] -= 1
    return _orig_put(*a, **k)


_cc.get_executable_and_time = _capped_get
_cc.put_executable_and_time = _capped_put

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_FLAC = "/root/repo/.ref_build/src/flac/flac"


@pytest.fixture(scope="session")
def oracle_flac():
    """Path to the reference flac binary, or skip."""
    if not os.path.exists(REFERENCE_FLAC):
        pytest.skip("reference flac binary not built")
    return REFERENCE_FLAC


def make_test_signal(n: int, channels: int = 2, bps: int = 16,
                     seed: int = 0, kind: str = "music"):
    """Deterministic pseudo-musical test signal: sum of sines + noise with
    varying amplitude, the standard shape FLAC compresses well."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    full = (1 << (bps - 1)) - 1
    out = np.zeros((channels, n))
    for c in range(channels):
        sig = np.zeros(n)
        for f, a in ((220 * (c + 1), 0.4), (440, 0.2), (1230.5, 0.1)):
            sig += a * np.sin(2 * np.pi * f * t + c)
        sig += 0.02 * rng.standard_normal(n)
        env = 0.1 + 0.9 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.3 * t))
        out[c] = sig * env
    out = np.clip(out * 0.5 * full, -full - 1, full)
    return np.round(out).astype(np.int32)


@pytest.fixture
def music():
    return make_test_signal(44100)
