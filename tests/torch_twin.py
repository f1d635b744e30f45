"""A PyTorch twin of the FULL parametric edit, for full-stack numerical parity
testing (VERDICT r1 item 2): filter chain -> deterministic ten-crop ResNet-50
VA loss -> CLIP recon -> Adam with the reference's cosine-ramp schedule and
best-x tracking (reference loop: /root/reference/src/baselines/optimize_image.py:56-97,
objective: src/optimize_image_param.py:237-259).

The ops mirror rgie_tpu.ops.filters' exact formulas (which are themselves
oracle-tested against the reference's kornia/hand-rolled semantics), and the
ten-crop uses rgie_tpu.ops.geometry.ten_crop_offsets' deterministic grid (the
documented RandomCrop deviation), so a shared-weight run is expected to track
the JAX stack step for step.

Models use torchvision / OpenAI-CLIP parameter naming so the production
converters (rgie_tpu.utils.torch_convert) move the weights across.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF

from rgie_tpu.ops.geometry import ten_crop_offsets

# ---------------------------------------------------------------------------
# Filter chain (NCHW), formula-identical to rgie_tpu.ops.filters
# ---------------------------------------------------------------------------


def _rgb_to_hsv(im):
    cmax, _ = im.max(1)
    cmin, _ = im.min(1)
    delta = cmax - cmin
    r, g, b = im[:, 0], im[:, 1], im[:, 2]
    safe = torch.where(delta == 0, torch.ones_like(delta), delta)
    h_r = ((g - b) / safe) % 6.0
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    idx = im.argmax(1)
    h = torch.where(idx == 0, h_r, torch.where(idx == 1, h_g, h_b))
    h = torch.where(delta == 0, torch.zeros_like(h), h) / 6.0
    s = torch.where(cmax == 0, torch.zeros_like(cmax),
                    delta / torch.where(cmax == 0, torch.ones_like(cmax), cmax))
    return h, s, cmax


def _hsv_to_rgb(h, s, v):
    c = v * s
    x = c * (1.0 - torch.abs((h * 6.0) % 2.0 - 1.0))
    m = v - c
    idx = torch.floor(h * 6.0).long() % 6
    o = torch.zeros_like(c)
    r = torch.where(idx == 0, c, torch.where(idx == 1, x, torch.where(
        idx == 2, o, torch.where(idx == 3, o, torch.where(idx == 4, x, c)))))
    g = torch.where(idx == 0, x, torch.where(idx == 1, c, torch.where(
        idx == 2, c, torch.where(idx == 3, x, o))))
    b = torch.where(idx == 0, o, torch.where(idx == 1, o, torch.where(
        idx == 2, x, torch.where(idx == 3, c, torch.where(idx == 4, c, x)))))
    return torch.stack([r, g, b], 1) + m[:, None]


def apply_exposure(im, p):
    return torch.clamp(im * torch.exp2(p), 0, 1)


def apply_saturation(im, p):
    h, s, v = _rgb_to_hsv(im)
    return _hsv_to_rgb(h, s * torch.clamp(p, min=0.0), v)


def apply_curve(im, w):
    """w: (K,) for tone (shared) or (3, K) per channel."""
    k = w.shape[-1]
    if w.dim() == 1:
        w = w[None].expand(3, k)
    knots = torch.arange(k, dtype=im.dtype) / k
    seg = torch.clamp(im[:, :, None] - knots[None, :, None, None], 0.0, 1.0 / k)
    total = (seg * w[None, :, :, None, None]).sum(2)
    return torch.minimum(total, torch.ones_like(total))


def apply_contrast(im, p):
    gray = 0.299 * im[:, 0] + 0.587 * im[:, 1] + 0.114 * im[:, 2]
    mean = gray.mean(dim=(1, 2), keepdim=True)[:, None]
    return torch.clamp((im - mean) * p + mean, 0, 1)


_SHARP_K = torch.tensor([[1.0, 1, 1], [1, 5, 1], [1, 1, 1]]) / 13.0


def apply_sharpness(im, p):
    factor = torch.clamp(p, min=0.0)
    pad = TF.pad(im, (1, 1, 1, 1), mode="reflect")
    deg = torch.clamp(TF.conv2d(pad, _SHARP_K.to(im.dtype).expand(3, 1, 3, 3),
                                groups=3), 0, 1)
    mask = torch.zeros_like(im)
    mask[:, :, 1:-1, 1:-1] = 1.0
    deg = mask * deg + (1 - mask) * im
    return im + factor * (deg - im)


def apply_gaussian_blur(im, p, size=25):
    xs = torch.arange(size, dtype=im.dtype) - (size - 1) / 2.0
    s = torch.clamp(p, min=1e-8)
    g = torch.exp(-0.5 * (xs / s) ** 2)
    g = g / g.sum()
    pad = size // 2
    x = TF.pad(im, (pad, pad, pad, pad), mode="reflect")
    x = TF.conv2d(x, g.view(1, 1, size, 1).expand(3, 1, size, 1), groups=3)
    x = TF.conv2d(x, g.view(1, 1, 1, size).expand(3, 1, 1, size), groups=3)
    return torch.clamp(x, 0, 1)


def _interp_matrix(src, n):
    taps = torch.arange(n, dtype=src.dtype)
    return torch.clamp(1.0 - torch.abs(src[:, None] - taps[None]), min=0.0)


def apply_scale(im, s):
    """s: (4,) = (sx, sy, cx, cy); src = c + (dst - c)/s, zeros padding —
    mirrors rgie_tpu.ops.geometry.scale_about_center's separable zoom."""
    h, w = im.shape[2], im.shape[3]
    sx = torch.where(torch.abs(s[0]) < 1e-12, torch.full_like(s[0], 1e-12), s[0])
    sy = torch.where(torch.abs(s[1]) < 1e-12, torch.full_like(s[1], 1e-12), s[1])
    ys = torch.arange(h, dtype=im.dtype)
    xs = torch.arange(w, dtype=im.dtype)
    src_y = s[3] + (ys - s[3]) / sy
    src_x = s[2] + (xs - s[2]) / sx
    row_m = _interp_matrix(src_y, h)
    col_m = _interp_matrix(src_x, w)
    out = torch.einsum("oi,bcij->bcoj", row_m, im)
    return torch.einsum("pj,bcoj->bcop", col_m, out)


def edit_image(im, x, input_size):
    """The full chain on the packed 41-vector with the reference's clamps
    (get_params_from_vector, optimize_image_param.py:262-292); [0,1] clamp
    after every op (apply_params, image_transformations.py:60-64)."""
    i = 0
    exposure = x[i]; i += 1
    saturation = x[i]; i += 1
    tone = x[i:i + 8]; i += 8
    color = x[i:i + 24].view(3, 8); i += 24
    contrast = x[i]; i += 1
    sharp = x[i]; i += 1
    blur = x[i]; i += 1
    scale_raw = x[i:i + 4]
    scale = torch.cat([torch.clamp(scale_raw[0:2], min=1.0),
                       torch.clamp(scale_raw[2:4], 0.0, float(input_size))])
    contrast = torch.where(contrast < 0, torch.zeros_like(contrast), contrast)

    im = torch.clamp(apply_exposure(im, exposure), 0, 1)
    im = torch.clamp(apply_saturation(im, saturation), 0, 1)
    im = torch.clamp(apply_curve(im, tone), 0, 1)
    im = torch.clamp(apply_curve(im, color), 0, 1)
    im = torch.clamp(apply_contrast(im, contrast), 0, 1)
    im = torch.clamp(apply_sharpness(im, sharp), 0, 1)
    im = torch.clamp(apply_gaussian_blur(im, blur), 0, 1)
    im = torch.clamp(apply_scale(im, scale), 0, 1)
    return im


# ---------------------------------------------------------------------------
# Models with converter-compatible naming
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = TF.relu(self.bn1(self.conv1(x)))
        out = TF.relu(self.bn2(self.conv2(out)))
        return TF.relu(self.bn3(self.conv3(out)) + idn)


class TorchResNet50(nn.Module):
    """torchvision-named ResNet-50 (convert_resnet50-compatible)."""

    def __init__(self, num_classes=4):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(64, 3, 1)
        self.layer2 = self._make(128, 4, 2)
        self.layer3 = self._make(256, 6, 2)
        self.layer4 = self._make(512, 3, 2)
        self.fc = nn.Linear(2048, num_classes)

    def _make(self, planes, blocks, stride):
        ds = nn.Sequential(nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                           nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, ds)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(TF.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean((2, 3)))


class _ClipBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

    def forward(self, x):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.mlp.c_fc(self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)
        return x + self.mlp.c_proj(h)


class TorchClipVisual(nn.Module):
    """OpenAI-CLIP-named visual tower (convert_clip_visual-compatible)."""

    def __init__(self, width=64, layers=2, heads=2, patch=16, resolution=96,
                 out_dim=32):
        super().__init__()
        self.patch = patch
        self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
        n_tok = (resolution // patch) ** 2 + 1
        self.positional_embedding = nn.Parameter(torch.randn(n_tok, width) * 0.02)
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_ClipBlock(width, heads) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, out_dim) * width ** -0.5)

    def forward(self, x):
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for b in self.transformer.resblocks:
            x = b(x)
        return self.ln_post(x[:, 0]) @ self.proj


# ---------------------------------------------------------------------------
# The full edit (reference: optimization, optimize_image.py:56-97)
# ---------------------------------------------------------------------------


def va_predict(model, im, input_size, crop_size):
    """Resize(shorter) + deterministic ten-crop + normalize + ResNet + mean +
    sigmoid — EmotionRegressor's exact pipeline. Assumes square input already
    at input_size (resize is then the identity)."""
    assert im.shape[2] == input_size and im.shape[3] == input_size
    offs = ten_crop_offsets(input_size, input_size, crop_size)
    crops = torch.cat([im[:, :, t:t + crop_size, l:l + crop_size]
                       for (t, l) in offs], 0)
    out = torch.sigmoid(model((crops - 0.5) / 0.5))
    return out.mean(0, keepdim=True)[:, :2]


def clip_embed(model, im):
    f = model((im - 0.5) / 0.5)
    return f / f.norm(dim=-1, keepdim=True)


def lr_ramp(lr, step, num_steps, down=0.25, up=0.05):
    t = step / num_steps
    ramp = min(1.0, (1.0 - t) / down)
    ramp = 0.5 - 0.5 * math.cos(ramp * math.pi)
    return lr * ramp * min(1.0, t / up)


def run_edit(image, alpha, va_model, clip_model, num_steps=30, lr=0.05,
             weight_clf=0.15, weight_recon=1.0, input_size=96, crop_size=80,
             x0=None):
    """Full edit; returns (best_x, losses, va0, target).

    ``x0``: starting vector. The default identity init sits on subgradient
    KINKS of the scale op (every sampled coordinate lands exactly on the
    bilinear kernel's corners, where JAX's balanced-tie and torch's clamp
    subgradients differ) — parity tests should pass a perturbed x0.
    """
    for p in list(va_model.parameters()) + list(clip_model.parameters()):
        p.requires_grad_(False)
    va_model.eval()
    clip_model.eval()

    with torch.no_grad():
        va0 = va_predict(va_model, image, input_size, crop_size)
        target = torch.clamp(va0 + alpha, 0, 1)
        feats0 = clip_embed(clip_model, image)

    if x0 is None:
        x = torch.zeros(41)
        x[1] = 1.0            # saturation
        x[2:34] = 1.0         # tone + color knots
        x[34] = 1.0           # contrast
        x[36] = 1e-4          # blur
        x[37:39] = 1.0        # scale
    else:
        x = x0.clone()
    x.requires_grad_(True)
    opt = torch.optim.Adam([x], lr=lr)

    losses, best_loss, best_x = [], float("inf"), x.detach().clone()
    for step in range(num_steps):
        # the engine passes cfg.crop_size as the unpack clamp bound
        # (engine/parametric.py make_single_edit -> CH.edit_image)
        out = edit_image(image, x, crop_size)
        err = target - va_predict(va_model, out, input_size, crop_size)
        loss = weight_clf * (err * err).sum(-1).mean()
        if weight_recon > 0:
            loss = loss + weight_recon * (1 - (feats0 * clip_embed(clip_model, out)).sum())
        loss_val = float(loss.detach())
        if loss_val < best_loss:
            best_loss = loss_val
            best_x = x.detach().clone()
        for g in opt.param_groups:
            g["lr"] = lr_ramp(lr, step, num_steps)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return best_x, np.asarray(losses), va0.numpy(), target.numpy()


# ---------------------------------------------------------------------------
# Inception-v3 twin (torchvision module naming; optional pytorch-fid pooling
# variant) for the FID feature-extractor converter parity test.
# ---------------------------------------------------------------------------


class _IncConv(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return TF.relu(self.bn(self.conv(x)))


def _avg3(x, fid_variant):
    return TF.avg_pool2d(x, 3, stride=1, padding=1,
                         count_include_pad=not fid_variant)


class _IncA(nn.Module):
    def __init__(self, cin, pool_features, fid_variant):
        super().__init__()
        self.fid_variant = fid_variant
        self.branch1x1 = _IncConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = _IncConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = _IncConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _IncConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _IncConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _IncConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _IncConv(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg3(x, self.fid_variant))
        return torch.cat([self.branch1x1(x), b5, bd, bp], 1)


class _IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _IncConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _IncConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _IncConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _IncConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd, TF.max_pool2d(x, 3, 2)], 1)


class _IncC(nn.Module):
    def __init__(self, cin, c7, fid_variant):
        super().__init__()
        self.fid_variant = fid_variant
        self.branch1x1 = _IncConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = _IncConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = _IncConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _IncConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _IncConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _IncConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _IncConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _IncConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _IncConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _IncConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg3(x, self.fid_variant))
        return torch.cat([self.branch1x1(x), b7, bd, bp], 1)


class _IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _IncConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = _IncConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _IncConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _IncConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _IncConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _IncConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, TF.max_pool2d(x, 3, 2)], 1)


class _IncE(nn.Module):
    def __init__(self, cin, pool_mode, fid_variant):
        super().__init__()
        self.pool_mode = pool_mode
        self.fid_variant = fid_variant
        self.branch1x1 = _IncConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = _IncConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = _IncConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _IncConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _IncConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _IncConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _IncConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _IncConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _IncConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = TF.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg3(x, self.fid_variant)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TorchInceptionV3(nn.Module):
    """torchvision inception_v3 (aux head omitted), with the pytorch-fid
    pooling variant when fid_variant=True. Returns (2048-d pool feats, logits)."""

    def __init__(self, num_classes=1008, fid_variant=True):
        super().__init__()
        fv = fid_variant
        self.Conv2d_1a_3x3 = _IncConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _IncConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _IncConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _IncConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _IncConv(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32, fv)
        self.Mixed_5c = _IncA(256, 64, fv)
        self.Mixed_5d = _IncA(288, 64, fv)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128, fv)
        self.Mixed_6c = _IncC(768, 160, fv)
        self.Mixed_6d = _IncC(768, 160, fv)
        self.Mixed_6e = _IncC(768, 192, fv)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280, "avg", fv)
        self.Mixed_7c = _IncE(2048, "max" if fv else "avg", fv)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = TF.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = TF.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        return feats, self.fc(feats)


# ---------------------------------------------------------------------------
# MUNIT autoencoder twin (imaginaire module naming, so the PRODUCTION
# converter utils.torch_convert.convert_munit_autoencoder consumes our
# state_dict) + the full GAN style edit loop — the torch side of the
# full-stack GAN parity test. Forward semantics mirror
# /root/reference/src/external/imaginaire/generators/munit.py via
# rgie_tpu/models/munit.py.
# ---------------------------------------------------------------------------


class _ImagConvBlock(nn.Module):
    """imaginaire Conv2dBlock: reflect pad + conv (+norm)(+act) in an order
    string. State keys: layers.conv.*, layers.norm.* (instance) or
    layers.norm.fc.layers.conv.* (AdaIN)."""

    def __init__(self, cin, cout, k, s, pad, norm="none", act="relu",
                 order="CNA", style_dim=None):
        super().__init__()
        self.pad, self.order, self.norm_type, self.act = pad, order, norm, act
        self.layers = nn.ModuleDict({"conv": nn.Conv2d(cin, cout, k, s)})
        nc = cin if order.index("N") < order.index("C") else cout
        if norm == "instance":
            self.layers["norm"] = nn.InstanceNorm2d(nc, affine=True)
        elif norm == "adaptive":
            ad = nn.Module()
            ad.fc = nn.Module()
            ad.fc.layers = nn.ModuleDict({"conv": nn.Linear(style_dim, nc * 2)})
            self.layers["norm"] = ad

    def forward(self, x, style=None):
        import torch.nn.functional as TF
        for op in self.order:
            if op == "C":
                if self.pad:
                    x = TF.pad(x, (self.pad,) * 4, mode="reflect")
                x = self.layers["conv"](x)
            elif op == "N" and self.norm_type == "instance":
                n = self.layers["norm"]
                x = TF.instance_norm(x, weight=n.weight, bias=n.bias, eps=1e-5)
            elif op == "N" and self.norm_type == "adaptive":
                y = self.layers["norm"].fc.layers["conv"](style)
                gamma, beta = y.chunk(2, -1)
                x = (TF.instance_norm(x, eps=1e-5) * (1 + gamma[:, :, None, None])
                     + beta[:, :, None, None])
            elif op == "A" and self.act == "relu":
                x = torch.relu(x)
            elif op == "A" and self.act == "tanh":
                x = torch.tanh(x)
        return x


class _ImagResBlock(nn.Module):
    def __init__(self, c, norm, style_dim=None, order="NACNAC"):
        super().__init__()
        self.conv_block_0 = _ImagConvBlock(c, c, 3, 1, 1, norm, "relu",
                                           order[:3], style_dim)
        self.conv_block_1 = _ImagConvBlock(c, c, 3, 1, 1, norm, "relu",
                                           order[3:], style_dim)

    def forward(self, x, style=None):
        return x + self.conv_block_1(self.conv_block_0(x, style), style)


class _ImagLinearBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.layers = nn.ModuleDict({"conv": nn.Linear(cin, cout)})

    def forward(self, x):
        return torch.relu(self.layers["conv"](x))


class TorchMunitAutoEncoder(nn.Module):
    """One MUNIT domain (imagenet2imagenet.yaml shapes, parameterized small)."""

    def __init__(self, nf=8, max_nf=32, nf_mlp=16, latent=8, res=2,
                 d_style=3, d_content=2, mlp_blocks=2):
        super().__init__()
        self.latent = latent
        se = nn.Module()
        chans, blocks = nf, [_ImagConvBlock(3, nf, 7, 1, 3)]
        for _ in range(2):
            blocks.append(_ImagConvBlock(chans, chans * 2, 4, 2, 1))
            chans *= 2
        for _ in range(d_style - 2):
            blocks.append(_ImagConvBlock(chans, chans, 4, 2, 1))
        blocks += [nn.AdaptiveAvgPool2d(1), nn.Conv2d(chans, latent, 1)]
        se.model = nn.ModuleList(blocks)
        self.style_encoder = se

        ce = nn.Module()
        chans = nf
        blocks = [_ImagConvBlock(3, nf, 7, 1, 3, norm="instance")]
        for _ in range(d_content):
            blocks.append(_ImagConvBlock(chans, min(chans * 2, max_nf), 4, 2, 1,
                                         norm="instance"))
            chans = min(chans * 2, max_nf)
        for _ in range(res):
            blocks.append(_ImagResBlock(chans, "instance"))
        ce.model = nn.ModuleList(blocks)
        self.content_encoder = ce
        self.content_dim = chans

        dec = nn.Module()
        blocks = [_ImagResBlock(chans, "adaptive", nf_mlp) for _ in range(res)]
        for _ in range(d_content):
            blocks += [nn.Upsample(scale_factor=2, mode="nearest"),
                       _ImagConvBlock(chans, chans // 2, 5, 1, 2,
                                      norm="adaptive", style_dim=nf_mlp)]
            chans //= 2
        # converter expects the output block at index res + 2*d_content + 1
        blocks += [nn.Identity(), _ImagConvBlock(chans, 3, 7, 1, 3, act="none")]
        dec.decoder = nn.ModuleList(blocks)
        self.decoder = dec

        mlp = nn.Module()
        dims = [latent] + [nf_mlp] * mlp_blocks
        mlp.model = nn.ModuleList([_ImagLinearBlock(dims[i], dims[i + 1])
                                   for i in range(mlp_blocks)])
        self.mlp = mlp

    def encode(self, x):
        c = x
        for m in self.content_encoder.model:
            c = m(c)
        s = x
        for m in self.style_encoder.model:
            s = m(s)
        return c, s.flatten(1)

    def decode(self, content, style):
        v = style
        for m in self.mlp.model:
            v = m(v)
        x = content
        for m in self.decoder.decoder:
            x = m(x, v) if isinstance(m, (_ImagConvBlock, _ImagResBlock)) else m(x)
        return x


def va_predict_raw(model, im, input_size, crop_size):
    """va_predict without the [0,1]->[-1,1] normalization (the GAN path's
    normalize=False regressor on [-1,1] images)."""
    assert im.shape[2] == input_size and im.shape[3] == input_size
    offs = ten_crop_offsets(input_size, input_size, crop_size)
    crops = torch.cat([im[:, :, t:t + crop_size, l:l + crop_size]
                       for (t, l) in offs], 0)
    return torch.sigmoid(model(crops)).mean(0, keepdim=True)[:, :2]


def run_gan_edit(image, alpha, ae, va_model, num_steps=20, lr=0.05,
                 weight_clf=0.2, weight_recon=1.0, input_size=48, crop_size=40):
    """Full MUNIT style edit (reference optimize_image_imaginaire.py:100-145):
    frozen content code, Adam on the 8-dim style, clf + L1 content recon.
    image (1, 3, H, W) in [-1, 1]. Returns (best_style, losses, edited)."""
    for p in list(ae.parameters()) + list(va_model.parameters()):
        p.requires_grad_(False)
    ae.eval(); va_model.eval()

    with torch.no_grad():
        content, style0 = ae.encode(image)
        va0 = va_predict_raw(va_model, image, input_size, crop_size)
        target = torch.clamp(va0 + alpha, 0, 1)

    style = style0[0].detach().clone().requires_grad_(True)
    opt = torch.optim.Adam([style], lr=lr)
    losses, best_loss, best_style = [], float("inf"), style.detach().clone()
    for step in range(num_steps):
        img = torch.clamp(ae.decode(content, style[None]), -1, 1)
        err = target - va_predict_raw(va_model, img, input_size, crop_size)
        loss = weight_clf * (err * err).sum(-1).mean()
        if weight_recon > 0:
            content_new, _ = ae.encode(img)
            loss = loss + weight_recon * (content_new - content).abs().mean()
        loss_val = float(loss.detach())
        if loss_val < best_loss:
            best_loss, best_style = loss_val, style.detach().clone()
        for g in opt.param_groups:
            g["lr"] = lr_ramp(lr, step, num_steps)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses.append(loss_val)
    with torch.no_grad():
        edited = torch.clamp(ae.decode(content, best_style[None]), -1, 1)
    return best_style, np.asarray(losses), edited
