"""The weight_dis objective path: discriminator converters (torch-naming
parity, incl. spectral-norm realization) and the realism terms wired into both
edit objectives (reference: optimize_image_param.py:91-98,315-330 and
optimize_image_imaginaire.py:132-137)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from rgie_tpu.utils import torch_convert as TC


def _torch_pixel_dis(size=120, n_scale=3, num_features=64):
    """Hand-built torch twin with the reference's exact module naming
    (src/baselines/models/Discriminator.py:38-68)."""
    n_dis, max_ch = 4, 256

    def conv_block(cin, cout):
        return nn.Sequential(nn.ReflectionPad2d(1), nn.Conv2d(cin, cout, 4, 2),
                             nn.LeakyReLU(0.2))

    def final_dim(dim_len, scale):
        return int((dim_len / 2) / (2 ** (n_dis - 1 + scale)))

    class TorchDis(nn.Module):
        def __init__(self):
            super().__init__()
            self.modules_features = nn.ModuleList()
            self.modules_logs = nn.ModuleList()
            for scale in range(n_scale):
                ch = num_features
                layers = [conv_block(3, ch)]
                for _ in range(1, n_dis):
                    layers.append(conv_block(ch, ch * 2))
                    if ch < max_ch:
                        ch = ch * 2
                self.modules_features.append(nn.Sequential(*layers))
                h = final_dim(size, scale)
                self.modules_logs.append(nn.Sequential(
                    nn.Flatten(1), nn.Linear(ch * 2 * h * h, 128),
                    nn.LeakyReLU(0.2), nn.Linear(128, 1)))

        def forward(self, x):
            logits = []
            im = x
            for scale in range(n_scale):
                feat = self.modules_features[scale](im)
                logits.append(self.modules_logs[scale](feat))
                if scale != n_scale - 1:
                    im = nn.functional.avg_pool2d(im, 3, 2, 1)
            return torch.sigmoid(torch.mean(torch.stack(logits), dim=0))

    return TorchDis()


@pytest.mark.slow
def test_pixel_discriminator_converter_parity(rng):
    from rgie_tpu.models.discriminators import PixelDiscriminator

    tm = _torch_pixel_dis()
    tm.eval()
    x = rng.uniform(0, 1, (2, 120, 120, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    variables = jax.tree.map(jnp.asarray, TC.convert_pixel_discriminator(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        size_w=120, size_h=120))
    model = PixelDiscriminator(size_w=120, size_h=120)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def _torch_multires_dis(num_dis=2, nf=4, num_layers=3, max_nf=16, spectral=True):
    """Hand-built torch twin of the imaginaire MultiResPatchDiscriminator with
    its module naming: discriminators.{i}.layer{n}.0.layers.conv
    (multires_patch.py:286-292), spectral weight norm like the shipped yaml."""

    class Block(nn.Module):
        def __init__(self, cin, cout, stride, act=True):
            super().__init__()
            conv = nn.Conv2d(cin, cout, 3, stride, 1)
            if spectral:
                conv = nn.utils.spectral_norm(conv)
            self.layers = nn.Sequential()
            self.layers.add_module("conv", conv)
            self.act = nn.LeakyReLU(0.2) if act else nn.Identity()

        def forward(self, x):
            return self.act(self.layers.conv(x))

    class Patch(nn.Module):
        def __init__(self):
            super().__init__()
            f = nf
            setattr(self, "layer0", nn.Sequential(Block(3, f, 2)))
            for n in range(num_layers):
                f_prev, f = f, min(f * 2, max_nf)
                stride = 2 if n < num_layers - 1 else 1
                setattr(self, f"layer{n + 1}", nn.Sequential(Block(f_prev, f, stride)))
            setattr(self, f"layer{num_layers + 1}",
                    nn.Sequential(Block(f, 1, 1, act=False)))

        def forward(self, x):
            for n in range(num_layers + 2):
                x = getattr(self, f"layer{n}")(x)
            return x

    class MultiRes(nn.Module):
        def __init__(self):
            super().__init__()
            self.discriminators = nn.ModuleList([Patch() for _ in range(num_dis)])

        def forward(self, x):
            outs = []
            for d in self.discriminators:
                outs.append(d(x))
                x = nn.functional.interpolate(x, scale_factor=0.5, mode="bilinear",
                                              align_corners=True,
                                              recompute_scale_factor=True)
            return outs

    return MultiRes()


@pytest.mark.slow
def test_multires_patch_discriminator_converter_parity(rng):
    from rgie_tpu.models.discriminators import MultiResPatchDiscriminator

    tm = _torch_multires_dis()
    x_t = torch.from_numpy(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
    for _ in range(5):  # converge spectral-norm power iteration
        tm(x_t)
    tm.eval()
    with torch.no_grad():
        expect = [o.numpy() for o in tm(x_t)]

    sd = {f"discriminator_a.{k}": v.numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray,
                             TC.convert_multires_patch_discriminator(sd, "a", num_layers=3))
    model = MultiResPatchDiscriminator(num_discriminators=2, num_filters=4,
                                       num_layers=3, max_num_filters=16)
    x = jnp.asarray(np.asarray(x_t).transpose(0, 2, 3, 1))
    outs, _, _ = model.apply(variables, x)
    assert len(outs) == len(expect)
    for got, exp in zip(outs, expect):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), exp,
                                   rtol=1e-3, atol=1e-4)


def test_parametric_objective_dis_term(key, rng):
    """weight_dis > 0 adds a BCE-to-real term with gradient through the EDIT
    (the reference's dis(image) on the unedited input is a zero-gradient no-op
    — divergence documented in discriminator_realism_loss)."""
    from rgie_tpu.config import OptimizeConfig, ParamEditConfig
    from rgie_tpu.engine import parametric as P
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.models.discriminators import PixelDiscriminator
    from rgie_tpu.models.emotion import create_regressor
    from rgie_tpu.ops import chain as CH

    k1, k2, k3 = jax.random.split(key, 3)
    regressor = create_regressor(k1, input_size=64, crop_size=56)
    va_loss = ValenceArousalLoss(regressor=regressor)
    dis_model = PixelDiscriminator(size_w=120, size_h=120)
    dis_vars = dis_model.init(k2, jnp.zeros((1, 120, 120, 3)))

    cfg = ParamEditConfig(optimize=OptimizeConfig(num_steps=2),
                          weight_clf=0.0, weight_recon=0.0, weight_dis=1.0,
                          input_size=120, crop_size=120)
    objective = P.make_objective(va_loss, None, cfg, dis_model)
    image = jnp.asarray(rng.uniform(0, 1, (1, 120, 120, 3)).astype(np.float32))
    ctx = P.EditContext(image=image, target=jnp.zeros((1, 2)),
                        clip_features=jnp.zeros((1, 1)))
    models = P.models_of(va_loss, None, dis_vars)
    x0 = CH.pack_params(CH.init_params())
    loss, g = jax.value_and_grad(lambda x: objective(x, ctx, models))(x0)
    assert float(loss) > 0.0  # -log(sigmoid) > 0
    assert float(jnp.abs(g).max()) > 0.0  # gradient flows through the dis term

    # weight_dis = 0 objective differs
    cfg0 = dataclasses.replace(cfg, weight_clf=0.15, weight_dis=0.0)
    obj0 = P.make_objective(va_loss, None, cfg0, dis_model)
    assert not np.allclose(float(loss), float(obj0(x0, ctx, models)))


def test_gan_objective_dis_term(key, rng):
    """The MUNIT edit's hinge realism term relu(-gan_loss) matches the
    reference formula and feeds gradient into the style code."""
    from rgie_tpu.config import GanEditConfig, MunitGenConfig, OptimizeConfig
    from rgie_tpu.engine import gan as GE
    from rgie_tpu.losses.emotion_loss import ValenceArousalLoss
    from rgie_tpu.losses.gan import gan_loss
    from rgie_tpu.models.discriminators import MultiResPatchDiscriminator
    from rgie_tpu.models.emotion import create_regressor
    from rgie_tpu.models.munit import create_generator

    k1, k2, k3 = jax.random.split(key, 3)
    gen = create_generator(k1, MunitGenConfig(num_filters=8, max_num_filters=16,
                                              num_res_blocks=1,
                                              num_downsamples_style=2),
                           image_size=32)
    regressor = create_regressor(k2, input_size=32, crop_size=28, normalize=False)
    va_loss = ValenceArousalLoss(regressor=regressor)
    dis_model = MultiResPatchDiscriminator(num_discriminators=2, num_filters=4,
                                           num_layers=2, max_num_filters=8)
    dis_vars = dis_model.init(k3, jnp.zeros((1, 32, 32, 3)))

    cfg = GanEditConfig(optimize=OptimizeConfig(num_steps=2), weight_clf=0.0,
                        weight_recon=0.0, weight_dis=1.0,
                        input_size=32, crop_size=32)
    objective = GE.make_objective(gen, va_loss, cfg, dis_model)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    content, style = gen.encode_a(image)
    models = GE.models_of(gen, va_loss, dis_vars)
    ctx = GE.GanEditContext(content=content, target=jnp.zeros((1, 2)))

    loss = objective(style[0], ctx, models)
    # oracle: decode -> clamp -> relu(-hinge_gen_loss)
    img = jnp.clip(gen.decode_a(content, style), -1.0, 1.0)
    outs, _, _ = dis_model.apply(dis_vars, img)
    expect = jax.nn.relu(-gan_loss(outs, True, gan_mode="hinge", dis_update=False))
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)
