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

The round-5 curated sweep over further TPU options
(scripts/sweep_compiler_options.py, tables in BASELINE.md) found ONE more
riser: the bundle-aware fusion cost model, +0.7% over the svmem64 champion
(1.0744 -> 1.0821 at --runs 2, re-confirmed 1.0743 -> 1.0819 at --runs 4);
every other accepted candidate was a wash within +/-0.15%. It joins the
flagship default below.

Policy (repo rule: measure before keeping): these defaults are applied only
to program families where they were measured to win — the parametric edit.
Scoped-VMEM was swept on the GAN and diffusion benches too and LOSES there
(monotonically; tables in BASELINE.md), so those jit sites keep compiler
defaults; experiments go through ``RGIE_SCOPED_VMEM_KIB`` (``0`` disables)
or the generic ``RGIE_XLA_OPTS="name=value,..."`` merge. The options go
through ``jax.jit(compiler_options=...)`` so they reach the (possibly
remote) TPU compiler; the client-side XLA_FLAGS parser does not know TPU
flag names on this host.

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
    opts: dict[str, str] = {}
    kib = os.environ.get("RGIE_SCOPED_VMEM_KIB", "")
    if not kib and measured_default_kib is not None:
        kib = str(measured_default_kib)
        # The second measured flagship win (round-5 confirm A/B, +0.7%)
        # rides the same measured-family gate as the scoped-VMEM default.
        if os.environ.get("RGIE_BUNDLE_COST_MODEL", "1") != "0":
            opts["xla_tpu_use_bundle_aware_cost_model_for_fusions"] = "true"
    if kib and kib != "0":
        opts["xla_tpu_scoped_vmem_limit_kib"] = kib
    # Generic experiment lever: RGIE_XLA_OPTS="name=value,name=value" merges
    # over the measured defaults (bench rows record the final dict, so every
    # A/B run is reproducible from its bench_history.jsonl line alone).
    extra = os.environ.get("RGIE_XLA_OPTS", "")
    for kv in filter(None, (p.strip() for p in extra.split(","))):
        name, _, value = kv.partition("=")
        opts[name.strip()] = value.strip()
    if not opts:
        return None
    import jax

    if jax.default_backend() != "tpu":
        return None
    return opts
