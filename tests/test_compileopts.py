"""tpu_compiler_options: platform gating + env overrides.

The measured sweep behind the 64 MiB default is in
rgie_tpu/utils/compileopts.py (device-measured 2026-08-19).
"""
import jax

from rgie_tpu.utils import compileopts


def test_none_on_cpu(monkeypatch):
    monkeypatch.delenv("RGIE_SCOPED_VMEM_KIB", raising=False)
    assert jax.default_backend() == "cpu"  # conftest forces cpu
    assert compileopts.tpu_compiler_options() is None


def test_default_on_tpu(monkeypatch):
    # The measured flagship default: 64 MiB scoped VMEM (round-4 sweep)
    # + bundle-aware fusion cost model (round-5 confirm A/B, +0.7%).
    monkeypatch.delenv("RGIE_SCOPED_VMEM_KIB", raising=False)
    monkeypatch.delenv("RGIE_BUNDLE_COST_MODEL", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert compileopts.tpu_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}
    # Each default is independently disablable.
    monkeypatch.setenv("RGIE_BUNDLE_COST_MODEL", "0")
    assert compileopts.tpu_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}


def test_env_override_and_disable(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("RGIE_SCOPED_VMEM_KIB", "49152")
    assert compileopts.tpu_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "49152"}
    monkeypatch.setenv("RGIE_SCOPED_VMEM_KIB", "0")
    assert compileopts.tpu_compiler_options() is None


def test_opt_in_families(monkeypatch):
    # Families where the lever is unmeasured (diffusion/GAN) pass
    # measured_default_kib=None: only an explicit env var activates it.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("RGIE_SCOPED_VMEM_KIB", raising=False)
    assert compileopts.tpu_compiler_options(measured_default_kib=None) is None
    monkeypatch.setenv("RGIE_SCOPED_VMEM_KIB", "65536")
    assert compileopts.tpu_compiler_options(measured_default_kib=None) == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}
    monkeypatch.setenv("RGIE_SCOPED_VMEM_KIB", "0")
    assert compileopts.tpu_compiler_options(measured_default_kib=None) is None


def test_generic_xla_opts_lever(monkeypatch):
    # RGIE_XLA_OPTS="k=v,k2=v2" merges over the measured defaults — the
    # generic A/B lever (every bench row records the final dict).
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("RGIE_SCOPED_VMEM_KIB", raising=False)
    monkeypatch.setenv("RGIE_XLA_OPTS",
                       "xla_tpu_use_bundle_aware_cost_model_for_fusions=true")
    assert compileopts.tpu_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}
    # Works for opt-in families (no scoped-VMEM default), overrides the
    # scoped-VMEM key when named explicitly, and tolerates spaces/empties.
    assert compileopts.tpu_compiler_options(measured_default_kib=None) == {
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}
    monkeypatch.setenv("RGIE_XLA_OPTS",
                       " xla_tpu_scoped_vmem_limit_kib=98304 , ")
    monkeypatch.setenv("RGIE_BUNDLE_COST_MODEL", "0")
    assert compileopts.tpu_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "98304"}
    monkeypatch.setenv("RGIE_XLA_OPTS", "")
    monkeypatch.setenv("RGIE_SCOPED_VMEM_KIB", "0")
    assert compileopts.tpu_compiler_options() is None


def test_jit_accepts_none_options():
    # The CPU/None path must leave jax.jit semantics untouched.
    fn = jax.jit(lambda x: x * 2, compiler_options=compileopts.tpu_compiler_options())
    assert float(fn(2.0)) == 4.0
