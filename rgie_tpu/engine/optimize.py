"""Per-image optimization engine, fused into a single XLA program.

TPU-native redesign of the reference's host-driven Adam loop
(`/root/reference/src/baselines/optimize_image.py:56-97`): the N-step loop —
cosine ramp-up/ramp-down LR schedule, objective fwd+bwd, Adam update, best-x
tracking — becomes one `lax.scan`, so an entire edit is ONE device program
with zero host round-trips (the reference syncs on `float(loss)` every step).
Batching over images is a `vmap` away; sharding over chips is a NamedSharding
on the batch axis (see rgie_tpu.parallel).

The gradient-free Nelder-Mead path (`optimize_image.py:126-148`) stays
host-driven (the algorithm is inherently sequential) but calls a jitted
objective, removing the reference's per-eval CPU<->device tensor rebuild.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rgie_tpu.config import OptimizeConfig


def lr_ramp_schedule(learning_rate: float, num_steps: int,
                     rampdown_length: float = 0.25, rampup_length: float = 0.05):
    """The reference's cosine ramp LR schedule (optimize_image.py:68-73):
    t = step/N; ramp = cos-eased min(1, (1-t)/down) * min(1, t/up)."""

    def schedule(step):
        t = step / num_steps
        ramp = jnp.minimum(1.0, (1.0 - t) / rampdown_length)
        ramp = 0.5 - 0.5 * jnp.cos(ramp * jnp.pi)
        ramp = ramp * jnp.minimum(1.0, t / rampup_length)
        return learning_rate * ramp

    return schedule


class OptResult(NamedTuple):
    best_x: jnp.ndarray
    best_loss: jnp.ndarray
    best_step: jnp.ndarray
    first_loss: jnp.ndarray
    last_x: jnp.ndarray
    losses: jnp.ndarray  # (num_steps,)


class _AdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_torch(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam scaling with torch.optim.Adam numerics.

    optax.scale_by_adam computes the bias correction ``1 - b2**t`` in float32,
    which cancels catastrophically for small t (5.8e-4 relative error at t=2
    with b2=0.999) while torch computes it in float64. We use
    ``-expm1(t * log(b2))`` (log precomputed in f64) which is accurate in f32,
    giving trajectory parity with the reference loop (optimize_image.py:56-97)
    to ~1e-6.
    """
    import math

    log_b1 = math.log(b1)
    log_b2 = math.log(b2)

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return _AdamState(count=jnp.zeros([], jnp.int32), mu=zeros,
                          nu=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu)
        nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g, updates, state.nu)
        t = (state.count + 1).astype(jnp.float32)
        bc1 = -jnp.expm1(t * log_b1)
        bc2 = -jnp.expm1(t * log_b2)
        out = jax.tree.map(lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        return out, _AdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimizeConfig) -> optax.GradientTransformation:
    """Adam with the ramp schedule, matching torch.optim.Adam semantics
    (eps added after sqrt, f64-accurate bias correction)."""
    sched = lr_ramp_schedule(cfg.learning_rate, cfg.num_steps,
                             cfg.lr_rampdown_length, cfg.lr_rampup_length)
    return optax.chain(
        scale_by_adam_torch(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps),
        optax.scale_by_schedule(lambda count: -sched(count)),
    )


def optimize(objective: Callable[[jnp.ndarray], jnp.ndarray],
             x0: jnp.ndarray,
             cfg: OptimizeConfig) -> OptResult:
    """Run the fused Adam edit loop. ``objective`` maps x -> scalar loss and
    closes over the image/context (all static under jit).

    Semantics match optimize_image.py:56-97: the loss at step k is evaluated
    at x_k *before* the update; best-x is the argmin over those evaluations;
    the update at step k uses lr(k); returns the best (not last) x.
    """
    opt = make_optimizer(cfg)
    opt_state = opt.init(x0)
    grad_fn = jax.value_and_grad(objective)

    def step_fn(carry, step):
        x, opt_state, best_x, best_loss, best_step = carry
        loss, grads = grad_fn(x)
        better = loss < best_loss
        best_x = jnp.where(better, x, best_x)
        best_loss = jnp.where(better, loss, best_loss)
        best_step = jnp.where(better, step, best_step)
        updates, opt_state = opt.update(grads, opt_state)
        x = optax.apply_updates(x, updates)
        return (x, opt_state, best_x, best_loss, best_step), loss

    init = (x0, opt_state, x0, jnp.asarray(jnp.inf, x0.dtype), jnp.asarray(0, jnp.int32))
    # unroll: while-loop iteration boundaries are scheduling barriers on TPU
    # (the device trace showed ~3% IDLE between steps); a small unroll lets
    # XLA fuse/overlap across consecutive Adam steps. Default 1 until the
    # unrolled body is device-measured faster (repo rule: measure perf
    # changes on the TPU before keeping them) — A/B via RGIE_SCAN_UNROLL=2.
    unroll = int(os.environ.get("RGIE_SCAN_UNROLL", "1"))
    (x, _, best_x, best_loss, best_step), losses = jax.lax.scan(
        step_fn, init, jnp.arange(cfg.num_steps),
        unroll=max(1, min(unroll, cfg.num_steps)))
    return OptResult(best_x=best_x, best_loss=best_loss, best_step=best_step,
                     first_loss=losses[0], last_x=x, losses=losses)


def make_edit_program(objective: Callable[[jnp.ndarray, Any], jnp.ndarray],
                      cfg: OptimizeConfig,
                      donate_context: bool = False) -> Callable:
    """Build ``edit(x0, context) -> OptResult`` where ``objective(x, context)``
    is the per-image loss. The returned function is jittable and vmappable:
    ``jax.vmap(edit)`` edits a batch of images in lockstep, and sharding the
    batch axis across a mesh scales it over chips."""

    def edit(x0, context):
        return optimize(lambda x: objective(x, context), x0, cfg)

    return edit


def optimize_gradient_free(objective: Callable[[np.ndarray], float],
                           x0: np.ndarray, verbose: bool = False,
                           maxiter: int = None):
    """Nelder-Mead path (reference: optimize_image.py:126-148). ``objective``
    should already be jitted; x stays on host (the simplex algorithm is
    sequential), but each eval is one device call instead of the reference's
    tensor reconstruction + `.item()` round trip."""
    from scipy.optimize import minimize

    neval = [0]

    def wrapped(x):
        loss = float(objective(np.asarray(x, dtype=np.float32)))
        neval[0] += 1
        if verbose:
            print(f"[{neval[0]}] [loss:{loss: 3.6f}]")
        return loss

    options = {"disp": verbose}
    if maxiter is not None:
        options["maxiter"] = maxiter
    result = minimize(wrapped, np.asarray(x0, dtype=np.float64).ravel(),
                      method="Nelder-Mead", options=options)
    return np.asarray(result.x, dtype=np.float32), result
