"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware.

Also enables the persistent compilation cache (XLA compiles are ~0.4s each
in this environment; the cache amortizes them across runs) and full-precision
matmuls (the default matmul precision performs bf16 passes, which is far too
coarse for geometry/normal-equation math).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# silence the spurious XLA:CPU AOT "machine feature" warnings triggered by
# pseudo-features (prefer-no-scatter/gather) the TPU plugin registration bakes
# into locally-written cache entries
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize registers the remote-TPU ("axon") PJRT
# plugin and force-sets jax_platforms at interpreter startup; the env var
# alone cannot override it. Point the config back at CPU for tests.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), ".jax_cache", "cpu"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _reclaim_jit_mmaps():
    """Release compiled-executable caches after every test module.

    Each large XLA:CPU executable holds thousands of mmap'd JIT code
    regions (one per thunk). A single pytest process accumulating the
    pipeline programs of every module crosses the kernel's
    vm.max_map_count limit (65530 by default) mid-suite, and the next
    LLVM compile segfaults on a failed mmap. clear_caches() unmaps them
    all; the persistent compilation cache makes re-loads cheap."""
    yield
    import gc

    from liorf_tpu.utils import gc_control

    gc_control.restore()  # unfreeze anything a pipeline quiesced
    jax.clear_caches()
    gc.collect()
