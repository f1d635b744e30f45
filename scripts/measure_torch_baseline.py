#!/usr/bin/env python
"""Measure the PyTorch-CPU anchor for bench.py's vs_baseline.

The reference (`/root/reference/src/optimize_image_param.py`) cannot run here
(kornia/torchvision/clip are not installed), so this script re-creates its
exact per-step workload in plain torch on CPU — the same math bench.py runs
fused on TPU:

  filter chain (exposure, saturation, tone, color, contrast, sharp, blur,
  scale) -> ten-crop 448px ResNet-50(4)+sigmoid VA loss (w=0.15) + CLIP
  ViT-B/32 recon loss (w=1.0) -> backward -> Adam step on the 41-dim vector.

Writes artifacts/torch_baseline.json {"step_seconds": ...} which bench.py
reads. Reference workload parameters: optimize_image_param.py:30-59.
"""

import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF

torch.manual_seed(0)


# ----------------------------------------------------------------------------
# torchvision-equivalent ResNet-50 (torchvision is not installed)
# ----------------------------------------------------------------------------

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
        out = self.bn3(self.conv3(out))
        return TF.relu(out + idn)


class ResNet50(nn.Module):
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


# ----------------------------------------------------------------------------
# CLIP ViT-B/32 image tower
# ----------------------------------------------------------------------------

class ClipViT(nn.Module):
    def __init__(self, width=768, layers=12, heads=12, patch=32, out_dim=512):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        self.cls = nn.Parameter(torch.randn(width) * 0.02)
        self.pos = nn.Parameter(torch.randn(50, width) * 0.02)
        self.ln_pre = nn.LayerNorm(width)
        self.blocks = nn.ModuleList([
            nn.ModuleDict(dict(
                ln1=nn.LayerNorm(width),
                attn=nn.MultiheadAttention(width, heads, batch_first=True),
                ln2=nn.LayerNorm(width),
                fc=nn.Linear(width, width * 4),
                proj=nn.Linear(width * 4, width),
            )) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, out_dim) * width ** -0.5)

    def forward(self, x):
        x = self.conv1(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(x.shape[0], 1, -1), x], dim=1) + self.pos
        x = self.ln_pre(x)
        for b in self.blocks:
            h = b["ln1"](x)
            x = x + b["attn"](h, h, h, need_weights=False)[0]
            h = b["ln2"](x)
            h = b["fc"](h)
            h = h * torch.sigmoid(1.702 * h)
            x = x + b["proj"](h)
        return self.ln_post(x[:, 0]) @ self.proj


# ----------------------------------------------------------------------------
# The reference's differentiable filter chain (torch, NCHW)
# ----------------------------------------------------------------------------

def rgb2lum(im):
    return (0.27 * im[:, 0] + 0.67 * im[:, 1] + 0.06 * im[:, 2])[:, None]


def apply_chain(im, x):
    i = 0
    exposure = x[i]; i += 1
    saturation = x[i]; i += 1
    tone = x[i:i + 8].view(1, 1, 8, 1); i += 8
    color = x[i:i + 24].view(1, 3, 8, 1); i += 24
    contrast = x[i]; i += 1
    sharp = x[i]; i += 1
    blur = x[i]; i += 1
    scale = x[i:i + 4]

    # exposure
    im = torch.clamp(im * torch.exp2(exposure), 0, 1)
    # saturation (HSV scale)
    cmax, idx = im.max(1, keepdim=True)
    cmin = im.min(1, keepdim=True)[0]
    delta = cmax - cmin
    safe = torch.where(delta == 0, torch.ones_like(delta), delta)
    s = torch.where(cmax == 0, torch.zeros_like(cmax), delta / torch.clamp(cmax, min=1e-8))
    r, g, b = im[:, 0:1], im[:, 1:2], im[:, 2:3]
    h = torch.where(idx == 0, ((g - b) / safe) % 6,
                    torch.where(idx == 1, (b - r) / safe + 2, (r - g) / safe + 4)) / 6
    h = torch.where(delta == 0, torch.zeros_like(h), h)
    s2 = s * torch.clamp(saturation, min=0)
    c = cmax * s2
    xx = c * (1 - torch.abs((h * 6) % 2 - 1))
    m = cmax - c
    sector = (h * 6).floor().long() % 6
    o = torch.zeros_like(c)
    rr = torch.where(sector == 0, c, torch.where(sector == 1, xx, torch.where(
        sector == 2, o, torch.where(sector == 3, o, torch.where(sector == 4, xx, c)))))
    gg = torch.where(sector == 0, xx, torch.where(sector == 1, c, torch.where(
        sector == 2, c, torch.where(sector == 3, xx, o))))
    bb = torch.where(sector == 0, o, torch.where(sector == 1, o, torch.where(
        sector == 2, xx, torch.where(sector == 3, c, torch.where(sector == 4, c, xx)))))
    im = torch.clamp(torch.cat([rr, gg, bb], 1) + m, 0, 1)
    # tone + color curves
    for p in (tone, color):
        total = im * 0
        for k in range(8):
            total = total + torch.clamp(im - k / 8, 0, 1 / 8) * p[:, :, k][..., None]
        im = torch.clamp(torch.clamp(total, max=1.0), 0, 1)
    # contrast (mean-subtraction, 601 gray)
    gray = 0.299 * im[:, 0] + 0.587 * im[:, 1] + 0.114 * im[:, 2]
    mean = gray.mean()
    im = torch.clamp((im - mean) * torch.clamp(contrast, min=0) + mean, 0, 1)
    # sharp (PIL smooth blend)
    k = torch.tensor([[1, 1, 1], [1, 5, 1], [1, 1, 1]], dtype=im.dtype) / 13
    pad = TF.pad(im, (1, 1, 1, 1), mode="reflect")
    deg = torch.clamp(TF.conv2d(pad, k.expand(3, 1, 3, 3), groups=3), 0, 1)
    mask = torch.zeros_like(im)
    mask[:, :, 1:-1, 1:-1] = 1
    deg = mask * deg + (1 - mask) * im
    im = torch.clamp(im + torch.clamp(sharp, min=0) * (deg - im), 0, 1)
    # gaussian blur 25x25 separable
    sigma = torch.clamp(blur, min=1e-8)
    xs = torch.arange(25, dtype=im.dtype) - 12
    gk = torch.exp(-0.5 * (xs / sigma) ** 2)
    gk = gk / gk.sum()
    pad = TF.pad(im, (12, 12, 12, 12), mode="reflect")
    im2 = TF.conv2d(pad, gk.view(1, 1, 25, 1).expand(3, 1, 25, 1), groups=3)
    im2 = TF.conv2d(im2, gk.view(1, 1, 1, 25).expand(3, 1, 1, 25), groups=3)
    im = torch.clamp(im2, 0, 1)
    # scale about center (bilinear grid sample, zeros padding)
    sx = torch.clamp(scale[0], min=1.0)
    sy = torch.clamp(scale[1], min=1.0)
    hh, ww = im.shape[2], im.shape[3]
    ys = torch.linspace(-1, 1, hh)
    xs2 = torch.linspace(-1, 1, ww)
    gy, gx = torch.meshgrid(ys, xs2, indexing="ij")
    grid = torch.stack([gx / sx, gy / sy], dim=-1)[None]
    im = torch.clamp(TF.grid_sample(im, grid, align_corners=True, padding_mode="zeros"), 0, 1)
    return im


def main():
    steps = int(os.environ.get("BASELINE_STEPS", "3"))
    image = torch.rand(1, 3, 256, 256)

    va_model = ResNet50(4).eval()
    clip_model = ClipViT().eval()
    for p in list(va_model.parameters()) + list(clip_model.parameters()):
        p.requires_grad_(False)

    def va_predict(im):
        im480 = TF.interpolate(im, size=(480, 480), mode="bilinear", antialias=True)
        crops = []
        for _ in range(10):
            t, l = np.random.randint(0, 33), np.random.randint(0, 33)
            crops.append(im480[:, :, t:t + 448, l:l + 448])
        crops = torch.cat(crops, 0)
        out = torch.sigmoid(va_model((crops - 0.5) / 0.5)).mean(0, keepdim=True)
        return out[:, :2]

    def clip_embed(im):
        im224 = TF.interpolate(im, size=(224, 224), mode="bilinear")
        f = clip_model((im224 - 0.5) / 0.5)
        return f / f.norm(dim=-1, keepdim=True)

    with torch.no_grad():
        target = torch.clamp(va_predict(image) + 0.1, 0, 1)
        feats0 = clip_embed(image)

    x = torch.zeros(41)
    x[1] = 1.0; x[2:34] = 1.0; x[34] = 1.0; x[36] = 1e-4; x[37:39] = 1.0
    x.requires_grad_(True)
    opt = torch.optim.Adam([x], lr=0.05)

    def step():
        out = apply_chain(image, x)
        err = target - va_predict(out)
        loss = 0.15 * torch.mean((err * err).sum(-1)) + 1.0 * (1 - (feats0 * clip_embed(out)).sum())
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.time()
    for _ in range(steps):
        step()
    per_step = (time.time() - t0) / steps

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    result = {"step_seconds": per_step, "steps_timed": steps,
              "workload": "256px param edit step: chain + ten-crop 448 ResNet-50 "
                          "+ CLIP ViT-B/32, fwd+bwd+Adam (torch CPU)",
              "host": f"{os.cpu_count()} cpu cores"}
    with open(os.path.join(out_dir, "torch_baseline.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
