# Test configuration: run the suite on a virtual 8-device CPU mesh so that
# multi-chip sharding paths are exercised without TPU hardware, and enable
# x64 so deterministic-solver tests can validate against the reference's
# float64 CPU oracle (reference uses double on CPU, src/common.hpp).
#
# Note: the environment pre-imports jax via sitecustomize with
# JAX_PLATFORMS=axon (the real TPU chip), so env vars are too late here —
# use jax.config.update, which takes effect as long as no backend has been
# initialized yet. Opt back into the real chip with LBFGS_TPU_TESTS=1.
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

if not os.environ.get("LBFGS_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# TPU mode: leave x64 off — the chip has no native f64 and the software
# emulation is both ~1000x slower and unstable through the axon tunnel;
# f64-oracle tests skip themselves when x64 is unavailable.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite compiles ~250 distinct whole-training-run XLA CPU
    programs (many of them 8-virtual-device SPMD). Letting them all stay
    live segfaulted the XLA CPU compiler (inside
    ``backend_compile_and_load``) near the END of the suite — reproduced
    2/2 at the same test, which passes in isolation, with its whole file,
    and with multi-file prefixes (VERDICT round 4: an accumulated
    compiler-state interaction, not OOM). Dropping executable references at
    module boundaries keeps the live-program population bounded; the
    next module recompiles what it needs (lru-cached solver wrappers hold
    ``jax.jit`` objects whose underlying executables repopulate on call).
    """
    yield
    jax.clear_caches()
