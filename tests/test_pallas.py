"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.ops import chain as CH
from rgie_tpu.ops.pallas import pointwise_chain as PC


def _params(rng):
    p = CH.init_params()
    return p.replace(
        exposure=jnp.asarray(rng.uniform(-0.4, 0.4), jnp.float32),
        saturation=jnp.asarray(rng.uniform(0.4, 1.8), jnp.float32),
        contrast=jnp.asarray(rng.uniform(0.5, 1.6), jnp.float32),
        tone=jnp.asarray(rng.uniform(0.6, 1.4, (8, 1)).astype(np.float32)),
        color=jnp.asarray(rng.uniform(0.6, 1.4, (8, 3)).astype(np.float32)),
    )


def test_fused_pointwise_chain_parity(rng):
    import jax._src.pallas.pallas_call as _pc

    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 128, 3)).astype(np.float32))
    params = _params(rng)
    expect = np.asarray(PC.reference_pointwise_chain(img, params))
    with jax.disable_jit(False):
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(PC.fused_pointwise_chain(img, params, rows=8))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_fused_chain_identity_params(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 8, 128, 3)).astype(np.float32))
    params = CH.init_params()
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PC.fused_pointwise_chain(img, params, rows=8))
    np.testing.assert_allclose(got, np.asarray(img), atol=1e-5)
