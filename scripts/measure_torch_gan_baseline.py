#!/usr/bin/env python
"""PyTorch-CPU anchor for the MUNIT style-edit step (the reference's
`optimize_image_imaginaire.py` per-step workload: decode -> clamp -> resize-480
ten-crop-448 ResNet-50 VA loss -> re-encode L1 content recon, fwd+bwd+Adam on
the 8-dim style). The reference itself cannot run here (imaginaire/kornia not
installed); this reproduces the exact math in plain torch, like
measure_torch_baseline.py does for the parametric edit.

Writes artifacts/torch_gan_baseline.json. Default 256px (a 1024px step on one
CPU core takes ~16x longer; scale accordingly).
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn.functional as TF

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import torch_twin as TT

    torch.manual_seed(0)
    # Full imagenet2imagenet.yaml generator shapes (MunitGenConfig defaults).
    ae = TT.TorchMunitAutoEncoder(nf=64, max_nf=256, nf_mlp=256, latent=8,
                                  res=4, d_style=4, d_content=3, mlp_blocks=2)
    va = TT.TorchResNet50(num_classes=4)
    for p in list(ae.parameters()) + list(va.parameters()):
        p.requires_grad_(False)
    ae.eval(); va.eval()

    image = torch.rand(1, 3, args.size, args.size) * 2 - 1

    def va_predict(im):
        im480 = TF.interpolate(im, size=(480, 480), mode="bilinear",
                               antialias=True)
        crops = []
        for _ in range(10):
            t, l = np.random.randint(0, 33), np.random.randint(0, 33)
            crops.append(im480[:, :, t:t + 448, l:l + 448])
        return torch.sigmoid(va(torch.cat(crops, 0))).mean(0, keepdim=True)[:, :2]

    with torch.no_grad():
        content, style0 = ae.encode(image)
        target = torch.clamp(va_predict(image) + 0.1, 0, 1)

    style = style0[0].detach().clone().requires_grad_(True)
    opt = torch.optim.Adam([style], lr=0.05)

    def step():
        img = torch.clamp(ae.decode(content, style[None]), -1, 1)
        err = target - va_predict(img)
        loss = 0.2 * torch.mean((err * err).sum(-1))
        content_new, _ = ae.encode(img)
        loss = loss + 1.0 * (content_new - content).abs().mean()
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.time()
    for _ in range(args.steps):
        step()
    per_step = (time.time() - t0) / args.steps

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    result = {"step_seconds": per_step, "steps_timed": args.steps,
              "size": args.size,
              "workload": f"{args.size}px MUNIT style-edit step: decode + "
                          "ten-crop 448 ResNet-50 + re-encode L1, fwd+bwd+Adam "
                          "(torch CPU)",
              "host": f"{os.cpu_count()} cpu cores"}
    with open(os.path.join(out_dir, "torch_gan_baseline.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
