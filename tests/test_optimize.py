"""Engine tests: LR schedule oracle, exact Adam-trajectory parity against
torch.optim.Adam (the reference's optimizer, optimize_image.py:56-97), best-x
semantics, and a tiny end-to-end parametric edit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgie_tpu.config import OptimizeConfig, ParamEditConfig
import rgie_tpu.engine.optimize as ENG


def reference_lr(step, num_steps, lr, down=0.25, up=0.05):
    t = step / num_steps
    ramp = min(1.0, (1.0 - t) / down)
    ramp = 0.5 - 0.5 * np.cos(ramp * np.pi)
    ramp = ramp * min(1.0, t / up)
    return lr * ramp


def test_lr_schedule_matches_reference():
    sched = ENG.lr_ramp_schedule(0.05, 300)
    for step in [0, 1, 5, 15, 150, 225, 260, 299]:
        np.testing.assert_allclose(float(sched(jnp.asarray(step, jnp.float32))),
                                   reference_lr(step, 300, 0.05), rtol=1e-4, atol=1e-9)


def test_adam_trajectory_matches_torch():
    """Run the reference loop verbatim in torch on a quadratic and demand the
    same iterates (tol 1e-5) from our scanned optimizer."""
    import torch

    a = np.array([3.0, -1.0, 0.5], dtype=np.float32)
    num_steps, lr = 25, 0.05

    # torch reference (mirrors optimize_image.py:56-97)
    x_t = torch.tensor([1.0, 2.0, -0.5], requires_grad=True)
    opt = torch.optim.Adam([x_t], betas=(0.9, 0.999), lr=lr)
    torch_losses = []
    for step in range(num_steps):
        for g in opt.param_groups:
            g["lr"] = reference_lr(step, num_steps, lr)
        loss = torch.sum((x_t - torch.tensor(a)) ** 2 * torch.tensor([1.0, 2.0, 3.0]))
        torch_losses.append(float(loss))
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
    torch_final = x_t.detach().numpy()

    # ours
    def objective(x):
        return jnp.sum((x - jnp.asarray(a)) ** 2 * jnp.asarray([1.0, 2.0, 3.0]))

    cfg = OptimizeConfig(num_steps=num_steps, learning_rate=lr)
    result = jax.jit(lambda x0: ENG.optimize(objective, x0, cfg))(
        jnp.asarray([1.0, 2.0, -0.5]))

    np.testing.assert_allclose(np.asarray(result.losses), np.asarray(torch_losses),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(result.last_x), torch_final, rtol=1e-4, atol=1e-5)


def test_best_x_semantics():
    """best-x is the argmin over pre-update evaluations; first_loss is step 0."""

    def objective(x):
        return jnp.sum(x * x)

    cfg = OptimizeConfig(num_steps=50, learning_rate=0.3)
    result = ENG.optimize(objective, jnp.asarray([2.0]), cfg)
    losses = np.asarray(result.losses)
    assert float(result.first_loss) == losses[0]
    assert float(result.best_loss) == losses.min()
    assert int(result.best_step) == int(losses.argmin())
    np.testing.assert_allclose(float(objective(result.best_x)), losses.min(), rtol=1e-6)


def test_optimize_converges_quadratic():
    def objective(x):
        return jnp.sum((x - 3.0) ** 2)

    cfg = OptimizeConfig(num_steps=200, learning_rate=0.3)
    result = ENG.optimize(objective, jnp.zeros(4), cfg)
    np.testing.assert_allclose(np.asarray(result.best_x), 3.0, atol=0.1)
    assert float(result.best_loss) < float(result.first_loss)


def test_gradient_free_nelder_mead():
    @jax.jit
    def objective(x):
        return jnp.sum((x - 1.5) ** 2)

    x_opt, res = ENG.optimize_gradient_free(objective, np.zeros(3, np.float32))
    np.testing.assert_allclose(x_opt, 1.5, atol=1e-3)


@pytest.mark.slow
def test_parametric_edit_end_to_end(key):
    """Tiny end-to-end slice: random-weight regressor+CLIP, 8 steps, 48px."""
    from rgie_tpu.engine import parametric as P
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.clip import create_clip_image_encoder
    from rgie_tpu.models.emotion import create_regressor

    k1, k2, k3 = jax.random.split(key, 3)
    reg = create_regressor(k1, input_size=64, crop_size=56)
    va = ValenceArousalLoss(regressor=reg)
    clip_enc = create_clip_image_encoder(
        k2, width=64, layers=2, heads=2, patch_size=16, input_resolution=64, output_dim=32)
    cfg = ParamEditConfig(
        optimize=OptimizeConfig(num_steps=8, learning_rate=0.05),
        input_size=48, crop_size=48)
    edit = jax.jit(P.make_single_edit(va, clip_enc, cfg))
    models = P.models_of(va, clip_enc)

    image = jax.random.uniform(k3, (1, 48, 48, 3))
    result, edited = edit(models, image, jnp.asarray([0.1, 0.1]))
    assert edited.shape == image.shape
    assert np.isfinite(float(result.best_loss))
    assert float(result.best_loss) <= float(result.first_loss)

    metrics = P.evaluate_edit(va, image, edited)
    assert metrics["va_delta"].shape == (1, 2)
    assert np.isfinite(float(metrics["rec_error"]))


def test_remat_objective_matches_plain(key):
    """cfg.remat=True must be a pure memory/time trade: identical loss and
    gradient to the plain objective (jax.checkpoint semantics)."""
    from rgie_tpu.engine import parametric as P
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.clip import create_clip_image_encoder
    from rgie_tpu.models.emotion import create_regressor
    from rgie_tpu.ops import chain as CH

    k1, k2, k3 = jax.random.split(key, 3)
    reg = create_regressor(k1, input_size=64, crop_size=56)
    va = ValenceArousalLoss(regressor=reg)
    clip_enc = create_clip_image_encoder(
        k2, width=64, layers=2, heads=2, patch_size=16, input_resolution=64, output_dim=32)
    models = P.models_of(va, clip_enc)

    image = jax.random.uniform(k3, (1, 48, 48, 3))
    feats = clip_enc.embed_normalized(image)
    ctx = P.EditContext(image=image, target=jnp.asarray([[0.6, 0.4]]),
                        clip_features=feats)
    x = CH.pack_params(CH.init_params(jnp.float32)) + 0.01

    base = ParamEditConfig(optimize=OptimizeConfig(num_steps=2),
                           input_size=48, crop_size=48)
    obj_plain = P.make_objective(va, clip_enc, base)
    obj_remat = P.make_objective(va, clip_enc,
                                 dataclasses.replace(base, remat=True))
    l0, g0 = jax.value_and_grad(obj_plain)(x, ctx, models)
    l1, g1 = jax.value_and_grad(obj_remat)(x, ctx, models)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5, atol=1e-7)
