"""Profiling: jax.profiler trace wrapper.

The reference's tracing story is wall-clock timestamps per iteration
(std::chrono / cudaEvent, SURVEY.md §5); on TPU the equivalent deep view is
an XLA profiler trace (op-level timeline, HBM traffic, MXU utilization)
viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lbfgs_ffnn_tpu_trace"):
    """``with trace('/tmp/dir'): run()`` captures a device trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
