"""Measured XLA:TPU compiler options for the hot edit programs.

The flagship parametric edit is HBM-bound (BASELINE.md round-4 trace:
every top op at 500-650 GB/s of the ~819 GB/s v5e roofline). Raising XLA's
scoped-VMEM limit gives its fusion/prefetch passes more on-chip scratch and
was device-measured (2026-08-19, /tmp probe sweep recorded in BASELINE.md):

    scoped vmem   img/s/chip (batch 12 bf16 flagship)
    default       1.0493
    48 MiB        1.0700
    64 MiB        1.0737   <- +2.3%, the knee
    96 MiB        1.0676
    128 MiB       1.0394   (over-reserving starves the allocator)

Policy (repo rule: measure before keeping): the 64 MiB default is applied
only to program families where it was measured to win — the parametric
edit. Other programs opt in via ``RGIE_SCOPED_VMEM_KIB``; ``0`` disables
everywhere. The option goes through ``jax.jit(compiler_options=...)`` so it
reaches the (possibly remote) TPU compiler; the client-side XLA_FLAGS parser
does not know TPU flag names on this host.

No reference analog: the reference leaves compiler tuning to torch defaults
(`/root/reference/src/optimize_image_param.py` has no backend knobs).
"""
from __future__ import annotations

import os

_DEFAULT_KIB = 65536


def tpu_compiler_options(measured_default_kib: int | None = _DEFAULT_KIB) -> dict | None:
    """Return ``compiler_options`` for jitting a hot TPU program, or None.

    ``measured_default_kib`` is the limit to apply when the env var is
    unset: the parametric callers pass the device-measured 64 MiB default;
    program families where the lever has NOT been measured pass ``None``
    (pure opt-in — only an explicit ``RGIE_SCOPED_VMEM_KIB`` activates it).

    None (= compiler defaults) on CPU/GPU platforms, under the test suite,
    or when RGIE_SCOPED_VMEM_KIB=0. Must only be called where the backend
    is about to be initialized anyway (CLI/bench main paths) — deciding the
    platform touches jax.default_backend().
    """
    kib = os.environ.get("RGIE_SCOPED_VMEM_KIB", "")
    if kib == "0":
        return None
    if not kib:
        if measured_default_kib is None:
            return None
        kib = str(measured_default_kib)
    import jax

    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}
