"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4) — the TPU-world
answer to testing multi-node without a cluster. Must be set before the first
jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may import jax (registering a TPU plugin)
# before this conftest runs, making the env vars above too late — force the
# platform through the live config instead. HCTR_TEST_TPU=1 keeps the native
# platform (for the opt-in slow/perf tests).
import jax  # noqa: E402

if os.environ.get("HCTR_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_hctr_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Reference checkout (read-only), used as a behavioral oracle when present.
REFERENCE_PATH = os.environ.get("HCTR_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def _ensure_native_built():
    """Build the C++ components once so native tests run (best effort)."""
    import shutil
    import subprocess
    native = os.path.join(REPO_ROOT, "handwritten_chinese_ocr_samples_tpu",
                          "native")
    if not shutil.which("make") or not shutil.which("g++"):
        return
    targets = [os.path.join(native, "libeditdistance.so"),
               os.path.join(native, "dgr2png")]
    if all(os.path.exists(t) for t in targets):
        return
    subprocess.run(["make", "-C", native], capture_output=True, timeout=300)


_ensure_native_built()
