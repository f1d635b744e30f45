"""Karras-sigma / lu-lambda DPM tables + sigma-space stepping (VERDICT r2
missing #4). Tables are checked against independently hand-computed values of
the public formulas diffusers implements (karras rho-7 interpolation, linear
log-sigma lu spacing, piecewise-log-linear sigma->t); stepping is checked for
the terminal-sigma analytic limit and an invert->sample round trip through
the production pipeline.

Reference configuration being reproduced:
`/root/reference/src/pipelines/InversionResamplingStableDiffusionXLPipeline.py:29-32`
(use_karras_sigmas=True + use_lu_lambdas=True, karras precedence; inverse
scheduler drops duplicate rounded timesteps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.diffusion import schedulers as SCH


def _train_sigmas():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                        dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas).astype(np.float32).astype(np.float64)
    return np.sqrt((1 - acp) / acp)


def test_karras_sigma_table_matches_hand_computed():
    sched = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True)
    ts_sig = _train_sigmas()
    smin, smax = ts_sig[0], ts_sig[-1]
    ramp = np.linspace(0, 1, 10)
    expect = (smax ** (1 / 7.0) + ramp * (smin ** (1 / 7.0) - smax ** (1 / 7.0))) ** 7.0
    got = np.asarray(sched.sigmas)
    np.testing.assert_allclose(got[:-1], expect, rtol=1e-5)
    assert got[-1] == 0.0                       # final_sigmas_type 'zero'
    assert got[0] == pytest.approx(smax, rel=1e-5)   # first step at sigma_max
    # Descending, and timesteps descend with them.
    assert np.all(np.diff(got[:-1]) < 0)
    ts = np.asarray(sched.timesteps)
    assert ts[0] == 999 and np.all(np.diff(ts) <= 0)


def test_sigma_to_t_interpolation():
    """sigma exactly on a grid point -> its integer t; between grid points ->
    the log-linear interpolant."""
    ts_sig = _train_sigmas()
    log_sigmas = np.log(ts_sig)
    # on-grid
    t = SCH._sigma_to_t(np.asarray([ts_sig[137]]), log_sigmas)
    assert t[0] == pytest.approx(137, abs=1e-3)
    # halfway in log-space between 400 and 401
    mid = np.exp(0.5 * (log_sigmas[400] + log_sigmas[401]))
    t = SCH._sigma_to_t(np.asarray([mid]), log_sigmas)
    assert t[0] == pytest.approx(400.5, abs=1e-3)


def test_lu_lambda_table_matches_hand_computed():
    sched = SCH.make_dpm_sigma_schedule(8, use_karras_sigmas=False,
                                        use_lu_lambdas=True)
    ts_sig = _train_sigmas()
    lmin, lmax = np.log(ts_sig[0]), np.log(ts_sig[-1])
    ramp = np.linspace(0, 1, 8)
    expect = np.exp(lmax + ramp * (lmin - lmax))
    np.testing.assert_allclose(np.asarray(sched.sigmas)[:-1], expect, rtol=1e-5)


def test_karras_precedence_over_lu():
    """Both flags set (the reference's exact config) -> karras wins."""
    both = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True,
                                       use_lu_lambdas=True)
    karras = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True)
    np.testing.assert_array_equal(np.asarray(both.sigmas),
                                  np.asarray(karras.sigmas))


def test_inverse_dedup_shortens_schedule():
    """With many steps, rounded karras timesteps collide at the dense
    low-sigma end; the inverse table drops duplicates (reference comment:
    'resulting in lower number of inversion steps than specified')."""
    fwd = SCH.make_dpm_sigma_schedule(200, use_karras_sigmas=True)
    inv = SCH.make_dpm_sigma_schedule(200, use_karras_sigmas=True, inverse=True)
    ts = np.asarray(inv.timesteps)
    assert inv.num_inference_steps == len(np.unique(np.asarray(fwd.timesteps)))
    assert inv.num_inference_steps < 200
    assert len(np.unique(ts)) == len(ts)          # strictly unique
    assert np.all(np.diff(ts) > 0)                # ascending
    sig = np.asarray(inv.sigmas)
    assert sig[0] == sig[1]                       # identity first step
    assert np.all(np.diff(sig[1:]) > 0)
    assert sig[-1] == pytest.approx(_train_sigmas()[-1], rel=1e-5)


def test_dpm_sigma_step_terminal_limit():
    """Stepping to sigma=0 must collapse to the x0 prediction."""
    sched = SCH.make_dpm_sigma_schedule(4, use_karras_sigmas=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    state = SCH.dpm_init_state(x.shape)
    i = 3  # last step: sigmas[3] -> sigmas[4] == 0
    out, _ = SCH.dpm_sigma_step(sched, eps, jnp.asarray(i), x, state)
    sig = float(sched.sigmas[i])
    alpha = 1.0 / np.sqrt(1 + sig * sig)
    x0 = (np.asarray(x) - sig * alpha * np.asarray(eps)) / alpha
    np.testing.assert_allclose(np.asarray(out), x0, rtol=1e-4, atol=1e-5)


def test_constant_eps_sigma_round_trip():
    """With a constant-eps 'model' the 2M sigma stepping retraces itself:
    inversion (ascending) then sampling (descending) lands within the final
    collapse-to-x0 distance of the original (the last forward step targets
    sigma 0, which clips off the sigma_min*eps component by construction)."""
    steps = 6
    fwd = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True)
    inv = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True, inverse=True)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)) * 0.2
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32) * 0.1)

    x = x0
    st = SCH.dpm_init_state(x.shape)
    for i in range(inv.num_inference_steps):
        x, st = SCH.dpm_sigma_step(inv, eps, jnp.asarray(i), x, st)
    assert float(jnp.mean(jnp.abs(x - x0))) > 0.5 * float(jnp.mean(jnp.abs(x0)))
    st = SCH.dpm_init_state(x.shape)
    for i in range(fwd.num_inference_steps):
        x, st = SCH.dpm_sigma_step(fwd, eps, jnp.asarray(i), x, st)
    # Final step collapses to x0-prediction: residual ~ sigma_min * |eps|.
    bound = 2.0 * float(fwd.sigmas[-2]) * float(jnp.mean(jnp.abs(eps))) + 1e-3
    assert float(jnp.mean(jnp.abs(x - x0))) < bound


def test_pipeline_sigma_wiring():
    """pipe.reverse_sample / pipe.sample in sigma mode must match a manual
    per-step loop over the SAME UNet + dpm_sigma_step exactly (scan wiring,
    index selection, timestep tables)."""
    from rgie_tpu.diffusion.pipeline import (InversionResamplingPipeline,
                                             PipelineParams)
    from rgie_tpu.diffusion.unet import UNetConfig, create_unet
    from rgie_tpu.diffusion.vae import VaeConfig, create_vae

    cfg = UNetConfig.tiny()
    unet, unet_vars = create_unet(jax.random.PRNGKey(0), cfg, sample_hw=8)
    vae, vae_vars = create_vae(jax.random.PRNGKey(1), VaeConfig.tiny(),
                               image_hw=16)
    steps = 4
    ss = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True,
                                     use_lu_lambdas=True)
    ssi = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True,
                                      use_lu_lambdas=True, inverse=True)
    pipe = InversionResamplingPipeline(
        unet=unet, vae=vae, sched=SCH.make_schedule(steps),
        scheduler_type="dpm", sigma_sched=ss, sigma_sched_inv=ssi)
    params = PipelineParams(unet=unet_vars, vae=vae_vars)

    lat = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 8, 8, 4)).astype(np.float32)) * 0.2
    embeds = jnp.zeros((1, 4, cfg.cross_attention_dim))

    noisy, pivots = pipe.reverse_sample(params, lat, embeds)
    assert pivots.shape[0] == ssi.num_inference_steps + 1
    x = lat
    st = SCH.dpm_init_state(x.shape)
    for i in range(ssi.num_inference_steps):
        eps, _ = unet.apply(unet_vars, x, ssi.timesteps[i], embeds)
        x, st = SCH.dpm_sigma_step(ssi, eps, jnp.asarray(i), x, st)
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(x),
                               rtol=1e-3, atol=1e-4)

    out = pipe.sample(params, noisy, embeds, guidance_scale=1.0)
    x = noisy
    st = SCH.dpm_init_state(x.shape)
    for i in range(ss.num_inference_steps):
        eps, _ = unet.apply(unet_vars, x, ss.timesteps[i], embeds)
        x, st = SCH.dpm_sigma_step(ss, eps, jnp.asarray(i), x, st)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-3, atol=1e-4)


def test_diffusers_exact_forward_endpoints():
    """VERDICT r4 #6: exact mode builds karras between the leading-spaced
    inference sigma endpoints (steps_offset 1, the SD/SDXL config default),
    not the full training range — hand-computed: at 10 steps the selected
    timesteps are 901..91, so the table spans sigma(901)..sigma(91)."""
    ts_sig = _train_sigmas()
    sched = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True,
                                        diffusers_exact=True)
    got = np.asarray(sched.sigmas)
    ramp = np.linspace(0, 1, 10)
    smax, smin = ts_sig[901], ts_sig[91]
    expect = (smax ** (1 / 7.0)
              + ramp * (smin ** (1 / 7.0) - smax ** (1 / 7.0))) ** 7.0
    np.testing.assert_allclose(got[:-1], expect, rtol=1e-5)
    assert got[-1] == 0.0
    ts = np.asarray(sched.timesteps)
    assert ts[0] == 901 and ts[-1] == 91
    # default mode spans the full training range instead
    dflt = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True)
    assert float(dflt.sigmas[0]) > float(got[0])
    assert np.asarray(dflt.timesteps)[0] == 999


def test_diffusers_exact_linspace_spacing():
    ts_sig = _train_sigmas()
    sched = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True,
                                        diffusers_exact=True,
                                        timestep_spacing="linspace")
    # linspace(0, 999, 11).round()[::-1][:-1] -> [999, 899, ..., 100]
    assert np.asarray(sched.timesteps)[0] == 999
    assert float(sched.sigmas[0]) == pytest.approx(ts_sig[999], rel=1e-5)
    assert float(sched.sigmas[-2]) == pytest.approx(ts_sig[100], rel=1e-5)


def test_diffusers_exact_lu_endpoints():
    ts_sig = _train_sigmas()
    sched = SCH.make_dpm_sigma_schedule(8, use_karras_sigmas=False,
                                        use_lu_lambdas=True,
                                        diffusers_exact=True)
    ratio = 1000 // 9
    ts_sel = (np.arange(9) * ratio).round()[::-1][:-1].astype(int) + 1
    lmax, lmin = np.log(ts_sig[ts_sel[0]]), np.log(ts_sig[ts_sel[-1]])
    expect = np.exp(lmax + np.linspace(0, 1, 8) * (lmin - lmax))
    np.testing.assert_allclose(np.asarray(sched.sigmas)[:-1], expect,
                               rtol=1e-5)


def test_diffusers_exact_inverse_table():
    """Exact inverse: no identity prepend (first step is first-order, the
    diffusers lower_order_nums warmup) and the final target is the TRAINING
    sigma_max, as the diffusers inverse scheduler appends it."""
    ts_sig = _train_sigmas()
    inv = SCH.make_dpm_sigma_schedule(10, use_karras_sigmas=True,
                                      inverse=True, diffusers_exact=True)
    sig = np.asarray(inv.sigmas)
    ts = np.asarray(inv.timesteps)
    assert len(sig) == len(ts) + 1
    assert sig[0] != sig[1]                      # no identity first step
    assert np.all(np.diff(sig) > 0)              # strictly ascending
    assert sig[-1] == pytest.approx(ts_sig[-1], rel=1e-5)  # training max
    assert np.all(np.diff(ts) > 0)               # dedup'd ascending
    # dedup still applies at high step counts
    inv200 = SCH.make_dpm_sigma_schedule(200, use_karras_sigmas=True,
                                         inverse=True, diffusers_exact=True)
    assert inv200.num_inference_steps < 200
    assert len(np.unique(np.asarray(inv200.timesteps))) == \
        inv200.num_inference_steps


def test_diffusers_exact_round_trip():
    """The exact-mode tables still invert->sample back to the original.

    The diffusers convention is NOT endpoint-self-consistent: the inverse
    table's final appended target is the TRAINING sigma_max while forward
    sampling starts at the karras max — so the self-consistent round trip
    stops the inversion one step early, at the karras max (== the forward
    table's first sigma), exactly where the reference's end_iteration
    truncation would leave it."""
    steps = 6
    fwd = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True,
                                      diffusers_exact=True)
    inv = SCH.make_dpm_sigma_schedule(steps, use_karras_sigmas=True,
                                      inverse=True, diffusers_exact=True)
    # no dedup at 6 steps: the inverse sigma grid is the forward one reversed
    assert float(inv.sigmas[inv.num_inference_steps - 1]) == \
        pytest.approx(float(fwd.sigmas[0]), rel=1e-6)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32)) * 0.2
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32) * 0.1)

    x = x0
    st = SCH.dpm_init_state(x.shape)
    for i in range(inv.num_inference_steps - 1):   # stop at the karras max
        x, st = SCH.dpm_sigma_step(inv, eps, jnp.asarray(i), x, st)
    assert float(jnp.mean(jnp.abs(x - x0))) > 0.5 * float(jnp.mean(jnp.abs(x0)))
    st = SCH.dpm_init_state(x.shape)
    for i in range(fwd.num_inference_steps):
        x, st = SCH.dpm_sigma_step(fwd, eps, jnp.asarray(i), x, st)
    bound = 2.0 * float(fwd.sigmas[-2]) * float(jnp.mean(jnp.abs(eps))) + 1e-3
    assert float(jnp.mean(jnp.abs(x - x0))) < bound
