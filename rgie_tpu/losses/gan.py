"""GAN losses (hinge / least-square / non-saturated / wasserstein).

Reference: `/root/reference/src/external/imaginaire/losses/gan.py:31-173`.
The torch code jit-fuses min+mean by hand (gan.py:13-28); XLA fuses these
automatically. Multi-scale discriminator outputs are averaged per-scale first
so high-res patches don't dominate the gradient (gan.py:70-76). Top-k
training (gan.py:102-118) is a ``k`` fraction argument instead of module
state.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp

Output = Union[jnp.ndarray, Sequence[jnp.ndarray]]


def _single_loss(dis_output: jnp.ndarray, gan_mode: str, t_real: bool,
                 dis_update: bool, real_label: float, fake_label: float,
                 k: float) -> jnp.ndarray:
    if not dis_update:
        assert t_real, "The target should be real when updating the generator."

    if not dis_update and k < 1:
        flat = dis_output.reshape(-1)
        kk = max(1, math.ceil(k * flat.shape[-1]))
        flat, _ = jax.lax.top_k(flat, kk)
        dis_output = flat

    label = real_label if t_real else fake_label

    if gan_mode in ("non_saturated", "softplus"):
        target = jnp.full_like(dis_output, label)
        # binary_cross_entropy_with_logits
        loss = jnp.mean(jnp.maximum(dis_output, 0) - dis_output * target +
                        jnp.log1p(jnp.exp(-jnp.abs(dis_output))))
    elif gan_mode == "least_square":
        target = jnp.full_like(dis_output, label)
        loss = 0.5 * jnp.mean((dis_output - target) ** 2)
    elif gan_mode == "hinge":
        if dis_update:
            if t_real:
                loss = -jnp.mean(jnp.minimum(dis_output - 1.0, 0.0))
            else:
                loss = -jnp.mean(jnp.minimum(-dis_output - 1.0, 0.0))
        else:
            loss = -jnp.mean(dis_output)
    elif gan_mode == "wasserstein":
        loss = -jnp.mean(dis_output) if t_real else jnp.mean(dis_output)
    else:
        raise ValueError(f"Unexpected gan_mode {gan_mode}")
    return loss


def gan_loss(dis_output: Output, t_real: bool, gan_mode: str = "hinge",
             dis_update: bool = True, reduce: bool = True,
             real_label: float = 1.0, fake_label: float = 0.0,
             k: float = 1.0):
    """GANLoss.forward equivalent (gan.py:58-85)."""
    if isinstance(dis_output, (list, tuple)):
        losses = [_single_loss(o, gan_mode, t_real, dis_update,
                               real_label, fake_label, k) for o in dis_output]
        if reduce:
            return jnp.mean(jnp.stack(losses))
        return losses
    return _single_loss(dis_output, gan_mode, t_real, dis_update,
                        real_label, fake_label, k)
