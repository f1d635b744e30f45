"""Guidance-regressor (midu) training — the framework's training workload.

Reference: `/root/reference/src/clf/train_guidance_clf.py:179-333`: Adam
lr 1e-5 / wd 5e-5, MSE on teacher VA labels, noisy latents at random
timesteps, best-val checkpointing. TPU-native redesign:

  * the train step is ONE pjit'd program over a (data, model) mesh — batch
    sharded over ``data`` (the gradient all-reduce the reference's dormant
    NCCL helpers never performed becomes an XLA psum over ICI), midu conv
    channels shardable over ``model``;
  * feature extraction (UNet mid-block at noisy latents) is a frozen function
    of the batch, fused into the same program when the UNet is present;
  * epochs loop on host, steps are device-side.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rgie_tpu.config import TrainGuidanceConfig
from rgie_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainGuidanceConfig) -> optax.GradientTransformation:
    # torch Adam(weight_decay=...) is L2-regularized Adam (NOT AdamW):
    # grad += wd * param before the Adam moments (train_guidance_clf.py:159).
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-cfg.learning_rate),
    )


def create_train_state(params: Any, cfg: TrainGuidanceConfig) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros([], jnp.int32))


def make_train_step(model_apply: Callable, cfg: TrainGuidanceConfig,
                    features_fn: Optional[Callable] = None):
    """Build the jittable train step.

    model_apply(params, features) -> predictions.
    features_fn(batch) -> features: the frozen UNet mid-block tap (or identity
    for precomputed features).
    """
    opt = make_optimizer(cfg)

    def loss_fn(params, features, labels):
        out = model_apply(params, features)
        return jnp.mean((out - labels) ** 2), out

    def train_step(state: TrainState, features, labels):
        if features_fn is not None:
            features = features_fn(features)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, features, labels)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, out

    return train_step


def make_eval_step(model_apply: Callable):
    def eval_step(params, features, labels):
        out = model_apply(params, features)
        return jnp.mean((out - labels) ** 2), out

    return eval_step


def shard_train_step(train_step, mesh, state: TrainState):
    """jit the train step with the batch sharded over 'data' and the state
    replicated: XLA inserts the gradient psum over ICI."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    state = jax.device_put(state, repl)
    jitted = jax.jit(train_step,
                     in_shardings=(repl, data, data),
                     out_shardings=(repl, repl, data))
    return jitted, state


def get_noisy_latents(key: jax.Array, latents: jnp.ndarray,
                      alphas_cumprod: jnp.ndarray,
                      num_train_timesteps: int = 1000) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample random timesteps and add scheduler noise
    (reference: get_noisy_latents, train_guidance_clf.py:336-362):
    x_t = sqrt(a_t) x_0 + sqrt(1 - a_t) eps."""
    kt, kn = jax.random.split(key)
    b = latents.shape[0]
    t = jax.random.randint(kt, (b,), 0, num_train_timesteps)
    noise = jax.random.normal(kn, latents.shape, latents.dtype)
    a = alphas_cumprod[t].reshape(b, *([1] * (latents.ndim - 1)))
    noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
    return noisy, t
