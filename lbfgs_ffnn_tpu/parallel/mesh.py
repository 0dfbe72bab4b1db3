"""Device mesh construction and multi-host runtime init.

The reference has no multi-device story at all — its only parallelism is
OpenMP threads over the sample axis and a single CUDA device (SURVEY.md
§2.6). The TPU framework scales the same sample/batch axis across chips and
hosts: a 1-D ``data`` mesh over all devices, batch-sharded objective
evaluation, replicated solver state, gradient reduction over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import AxisType, Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    Axes are ``Auto``-typed: solvers run unchanged and GSPMD propagates the
    batch sharding / inserts the gradient all-reduce. On a pod slice,
    ``jax.make_mesh`` picks an ICI-contiguous order so the psum rides ICI,
    not DCN.
    """
    if devices is not None:
        devs = list(devices)
        if n_devices is not None:
            devs = devs[:n_devices]
        import numpy as np

        return Mesh(np.asarray(devs), (axis_name,), axis_types=(AxisType.Auto,))
    n = n_devices if n_devices is not None else len(jax.devices())
    if n > len(jax.devices()):
        raise ValueError(f"requested {n} devices, have {len(jax.devices())}")
    if n == len(jax.devices()):
        return jax.make_mesh((n,), (axis_name,), axis_types=(AxisType.Auto,))
    import numpy as np

    return Mesh(np.asarray(jax.devices()[:n]), (axis_name,), axis_types=(AxisType.Auto,))


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host process-group init (``jax.distributed.initialize``).

    Call once per host before any jax computation when running a multi-host
    pod slice; a no-op for single-process runs. Arguments default to the
    standard cluster-environment autodetection.

    On the CPU backend, cross-process collectives need an explicit
    implementation — without it each process sees only its own devices and
    ``jax.process_count()`` stays 1. Gloo is enabled here automatically, so
    N plain CPU processes federate into one global device set: the
    "multi-host pod without a pod" test rig (see
    tests/test_multiprocess.py, which drives a real 2-process sharded
    gradient reduction through this entry point).
    """
    if num_processes is not None and num_processes <= 1:
        return
    # Inspect the configured platform WITHOUT touching the backend —
    # jax.default_backend() would initialize it, which must not happen
    # before jax.distributed.initialize.
    import os

    platforms = str(getattr(jax.config, "jax_platforms", None) or
                    os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in platforms:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: single-process CPU still works
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
