"""PyTorch checkpoint -> Flax parameter conversion.

The reference's model artifacts all live outside its repo (SURVEY.md App. A):
`va_pred_all` (torchvision ResNet-50 VA regressor), the midu CNNs, OpenAI
CLIP ViT-B/32, and the imaginaire MUNIT generator (`.pt` with spectral weight
norm). This module converts their torch ``state_dict``s (loaded as numpy via
torch-cpu) into the parameter trees of our Flax modules.

Conventions: torch conv OIHW -> flax HWIO; torch linear (out, in) -> flax
(in, out); BatchNorm running stats -> flax batch_stats; spectral norm is
*realized* (W / sigma from the stored power-iteration vector u) so the TPU
forward graph is plain convs.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor (or array) -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_kernel(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def dense_kernel(t) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return _np(t).T


def realize_spectral_norm(weight_orig, u, v=None) -> np.ndarray:
    """Fold torch spectral_norm into the kernel: W / sigma, sigma = u^T W v.

    At eval torch uses the STORED power-iteration vectors u and v
    (torch.nn.utils.spectral_norm keeps both in the state dict); pass v when
    available, else recompute v = normalize(W^T u) (one extra half-iteration,
    ~1e-3 relative drift). Reference MUNIT config uses weight_norm_type
    'spectral' (yaml:66)."""
    w = _np(weight_orig)
    u = _np(u).reshape(-1)
    w_mat = w.reshape(w.shape[0], -1)
    if v is not None:
        v = _np(v).reshape(-1)
    else:
        v = w_mat.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
    sigma = float(u @ (w_mat @ v))
    return w / sigma


# ---------------------------------------------------------------------------
# ResNet-50 (torchvision naming -> rgie_tpu.models.resnet tree)
# ---------------------------------------------------------------------------


def convert_resnet50(state_dict: Mapping[str, Any],
                     stage_sizes=(3, 4, 6, 3)) -> Dict[str, Any]:
    """torchvision resnet50 state_dict -> {'params': ..., 'batch_stats': ...}.

    Accepts both bare backbone dicts and dicts with an ``fc`` head of any
    width (the VA regressor replaces fc with 4 outputs,
    EmotionPredictionModel.py:25-26).
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst_p, dst_s, prefix):
        dst_p["scale"] = _np(sd[f"{prefix}.weight"])
        dst_p["bias"] = _np(sd[f"{prefix}.bias"])
        dst_s["mean"] = _np(sd[f"{prefix}.running_mean"])
        dst_s["var"] = _np(sd[f"{prefix}.running_var"])

    params["conv1"] = {"kernel": conv_kernel(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = {}, {}
    bn(params["bn1"], stats["bn1"], "bn1")

    for i, blocks in enumerate(stage_sizes):
        for j in range(blocks):
            src = f"layer{i + 1}.{j}"
            dst = f"layer{i + 1}_{j}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for k in (1, 2, 3):
                p[f"conv{k}"] = {"kernel": conv_kernel(sd[f"{src}.conv{k}.weight"])}
                p[f"bn{k}"], s[f"bn{k}"] = {}, {}
                bn(p[f"bn{k}"], s[f"bn{k}"], f"{src}.bn{k}")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample_conv"] = {"kernel": conv_kernel(sd[f"{src}.downsample.0.weight"])}
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                bn(p["downsample_bn"], s["downsample_bn"], f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s

    if "fc.weight" in sd:
        params["fc"] = {"kernel": dense_kernel(sd["fc.weight"]),
                        "bias": _np(sd["fc.bias"])}
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# OpenAI CLIP visual tower (clip ViT-B/32 naming -> rgie_tpu.models.clip)
# ---------------------------------------------------------------------------


def convert_clip_visual(state_dict: Mapping[str, Any], layers: int = 12,
                        heads: int = 12, width: int = 768) -> Dict[str, Any]:
    """OpenAI CLIP ``visual.*`` weights -> VisionTransformer params."""
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in state_dict.items()}
    p: Dict[str, Any] = {
        "conv1_kernel": conv_kernel(sd["conv1.weight"]),
        "class_embedding": _np(sd["class_embedding"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_pre": {"scale": _np(sd["ln_pre.weight"]), "bias": _np(sd["ln_pre.bias"])},
        "ln_post": {"scale": _np(sd["ln_post.weight"]), "bias": _np(sd["ln_post.bias"])},
        "proj": _np(sd["proj"]),
    }
    head_dim = width // heads
    for i in range(layers):
        src = f"transformer.resblocks.{i}"
        in_w = _np(sd[f"{src}.attn.in_proj_weight"])   # (3*width, width)
        in_b = _np(sd[f"{src}.attn.in_proj_bias"])
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)

        def heads_kernel(w):
            # torch (width_out, width_in) -> flax MHA (in, heads, head_dim)
            return w.T.reshape(width, heads, head_dim)

        out_w = _np(sd[f"{src}.attn.out_proj.weight"])  # (width, width)
        p[f"resblock_{i}"] = {
            "ln_1": {"scale": _np(sd[f"{src}.ln_1.weight"]), "bias": _np(sd[f"{src}.ln_1.bias"])},
            "ln_2": {"scale": _np(sd[f"{src}.ln_2.weight"]), "bias": _np(sd[f"{src}.ln_2.bias"])},
            "attn": {
                "query": {"kernel": heads_kernel(qw), "bias": qb.reshape(heads, head_dim)},
                "key": {"kernel": heads_kernel(kw), "bias": kb.reshape(heads, head_dim)},
                "value": {"kernel": heads_kernel(vw), "bias": vb.reshape(heads, head_dim)},
                "out": {"kernel": out_w.T.reshape(heads, head_dim, width),
                        "bias": _np(sd[f"{src}.attn.out_proj.bias"])},
            },
            "mlp": {
                "c_fc": {"kernel": dense_kernel(sd[f"{src}.mlp.c_fc.weight"]),
                         "bias": _np(sd[f"{src}.mlp.c_fc.bias"])},
                "c_proj": {"kernel": dense_kernel(sd[f"{src}.mlp.c_proj.weight"]),
                           "bias": _np(sd[f"{src}.mlp.c_proj.bias"])},
            },
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# MUNIT autoencoder (imaginaire naming -> rgie_tpu.models.munit tree)
# ---------------------------------------------------------------------------


def _imag_conv(sd, prefix) -> Dict[str, Any]:
    """One imaginaire conv layer (possibly spectral-normed) -> flax conv dict."""
    if f"{prefix}.weight_orig" in sd:
        w = realize_spectral_norm(sd[f"{prefix}.weight_orig"], sd[f"{prefix}.weight_u"],
                                  sd.get(f"{prefix}.weight_v"))
    else:
        w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0) if w.ndim == 4 else w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _imag_linear(sd, prefix) -> Dict[str, Any]:
    if f"{prefix}.weight_orig" in sd:
        w = realize_spectral_norm(sd[f"{prefix}.weight_orig"], sd[f"{prefix}.weight_u"],
                                  sd.get(f"{prefix}.weight_v"))
    else:
        w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _imag_instance_norm(sd, prefix) -> Dict[str, Any]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_munit_autoencoder(state_dict: Mapping[str, Any], domain: str = "a",
                              num_downsamples_content: int = 3,
                              num_downsamples_style: int = 4,
                              num_res_blocks: int = 4,
                              num_mlp_blocks: int = 2) -> Dict[str, Any]:
    """imaginaire `net_G` state_dict (one domain) -> AutoEncoder params.

    imaginaire module paths (munit.py:215-252 + layers/*):
      autoencoder_a.style_encoder.model.{k}.layers.conv.*        (Conv2dBlock)
      autoencoder_a.style_encoder.model.{last}.*                 (plain 1x1 conv)
      autoencoder_a.content_encoder.model.{k}.layers.{conv,norm}.*
      autoencoder_a.content_encoder.model.{k}.conv_block_{0,1}.layers.*   (ResBlock)
      autoencoder_a.decoder.decoder.{k}...                       (ModuleList)
      autoencoder_a.mlp.model.{k}.layers.conv.*                  (LinearBlock)
    AdaIN projections live at ...layers.norm.fc.layers.conv.* (AdaptiveNorm ->
    LinearBlock named 'fc', activation_norm.py:85-88).
    """
    ae = f"autoencoder_{domain}"
    sd = {k[len(ae) + 1:]: v for k, v in state_dict.items() if k.startswith(ae + ".")}
    p: Dict[str, Any] = {}

    # --- style encoder: Conv2dBlocks 0..(num_downsamples_style), then
    # AdaptiveAvgPool (no params) at index n+1, then plain Conv2d at n+2.
    se: Dict[str, Any] = {}
    n_style_convs = 1 + num_downsamples_style
    for i in range(n_style_convs):
        se[f"layer_{i}"] = {"conv": _imag_conv(sd, f"style_encoder.model.{i}.layers.conv")}
    last = n_style_convs + 1
    fc = _imag_conv(sd, f"style_encoder.model.{last}")
    se["fc"] = {"kernel": fc["kernel"][0, 0], "bias": fc.get("bias")}  # 1x1 conv -> dense
    p["style_encoder"] = se

    # --- content encoder
    ce: Dict[str, Any] = {}
    n_ce_convs = 1 + num_downsamples_content
    for i in range(n_ce_convs):
        block = {"conv": _imag_conv(sd, f"content_encoder.model.{i}.layers.conv")}
        if f"content_encoder.model.{i}.layers.norm.weight" in sd:
            block["norm"] = _imag_instance_norm(sd, f"content_encoder.model.{i}.layers.norm")
        ce[f"layer_{i}"] = block
    for r in range(num_res_blocks):
        idx = n_ce_convs + r
        res: Dict[str, Any] = {}
        for b in (0, 1):
            cb = {"conv": _imag_conv(sd, f"content_encoder.model.{idx}.conv_block_{b}.layers.conv")}
            np_prefix = f"content_encoder.model.{idx}.conv_block_{b}.layers.norm"
            if f"{np_prefix}.weight" in sd:
                cb["norm"] = _imag_instance_norm(sd, np_prefix)
            res[f"conv_block_{b}"] = cb
        ce[f"res_{r}"] = res
    p["content_encoder"] = ce

    # --- decoder: ModuleList = res blocks, then (Upsample, Conv2dBlock) pairs,
    # then the output Conv2dBlock. Upsample has no params, so param indices:
    # res 0..R-1; up conv k at index R + 2k + 1; out at R + 2*num_up + 1.
    de: Dict[str, Any] = {}

    def adain(prefix) -> Dict[str, Any]:
        return {"fc": _imag_linear(sd, f"{prefix}.fc.layers.conv")}

    for r in range(num_res_blocks):
        res = {}
        for b in (0, 1):
            base = f"decoder.decoder.{r}.conv_block_{b}.layers"
            res[f"conv_block_{b}"] = {
                "conv": _imag_conv(sd, f"{base}.conv"),
                "norm": adain(f"{base}.norm"),
            }
        de[f"res_{r}"] = res
    for k in range(num_downsamples_content):
        idx = num_res_blocks + 2 * k + 1
        base = f"decoder.decoder.{idx}.layers"
        de[f"up_{k}"] = {"conv": _imag_conv(sd, f"{base}.conv"),
                         "norm": adain(f"{base}.norm")}
    out_idx = num_res_blocks + 2 * num_downsamples_content + 1
    de["out"] = {"conv": _imag_conv(sd, f"decoder.decoder.{out_idx}.layers.conv")}
    p["decoder"] = de

    # --- MLP: LinearBlocks at model.{0..num_mlp_blocks}
    mlp: Dict[str, Any] = {}
    for i in range(num_mlp_blocks):
        mlp[f"linear_{i}"] = _imag_linear(sd, f"mlp.model.{i}.layers.conv")
    p["mlp"] = mlp

    return {"params": p}


def filter_imaginaire_states(state_dict: Mapping[str, Any],
                             use_averaged_model: bool = False) -> Dict[str, Any]:
    """Strip 'module.' prefixes and (non-)averaged-model keys
    (reference: get_relevant_states, optimize_image_imaginaire.py:148-159)."""
    if use_averaged_model:
        out = {k.replace("module.", ""): v for k, v in state_dict.items()
               if "averaged_model" in k}
        out = {k.replace("averaged_model.", ""): v for k, v in out.items()}
    else:
        out = {k.replace("module.", ""): v for k, v in state_dict.items()
               if "averaged_model" not in k}
    out.pop("num_updates_tracked", None)
    return out


# ---------------------------------------------------------------------------
# Midu guidance CNNs (nn.Sequential naming -> rgie_tpu.models.midu)
# ---------------------------------------------------------------------------


def convert_midu(state_dict: Mapping[str, Any], is_sdxl: bool = False) -> Dict[str, Any]:
    """Sequential index naming (MiduClassifier.py:122-161) -> flax midu params.
    SDXL: convs at 0,3,6,9, linears at 13,15. SD: convs at 0,3, linears at 7,9.

    The first dense follows torch's Flatten of an NCHW map (channel-major);
    our NHWC flatten is (H, W, C)-major, so its input dim is permuted
    CHW -> HWC (C=128/64, H=W=2 in both variants)."""
    conv_ixs = (0, 3, 6, 9) if is_sdxl else (0, 3)
    lin_ixs = (13, 15) if is_sdxl else (7, 9)
    flat_c = 64 if is_sdxl else 128
    p: Dict[str, Any] = {}
    for n, i in enumerate(conv_ixs):
        p[f"conv_{n}"] = {"kernel": conv_kernel(state_dict[f"{i}.weight"]),
                          "bias": _np(state_dict[f"{i}.bias"])}
    for n, i in enumerate(lin_ixs):
        w = _np(state_dict[f"{i}.weight"])  # (out, in)
        if n == 0:
            out_dim = w.shape[0]
            w = w.reshape(out_dim, flat_c, 2, 2).transpose(0, 2, 3, 1).reshape(out_dim, -1)
        p[f"dense_{n}"] = {"kernel": w.T,
                           "bias": _np(state_dict[f"{i}.bias"])}
    return {"params": p}


# ---------------------------------------------------------------------------
# Discriminators (pixel-space multi-scale + imaginaire multires patch)
# ---------------------------------------------------------------------------


def convert_pixel_discriminator(state_dict: Mapping[str, Any],
                                size_w: int = 480, size_h: int = 480,
                                n_scale: int = 3) -> Dict[str, Any]:
    """Pixel discriminator checkpoint (`imagenet_w0_high_lookhere_dis`) ->
    rgie_tpu.models.discriminators.PixelDiscriminator params.

    torch naming (reference: src/baselines/models/Discriminator.py:38-68):
    convs at ``modules_features.{s}.{i}.1`` (each layer is
    Sequential(ReflectionPad, Conv2d, LeakyReLU)); the per-scale MLP at
    ``modules_logs.{s}.{1,3}`` (Flatten, Linear, LeakyReLU, Linear). The first
    Linear consumes torch's channel-major flatten of the final NCHW conv map;
    our NHWC flatten is (H, W, C)-major, so its input rows are permuted."""
    if (size_w in (620, 480)) and size_h == 480:
        n_dis = 6
    elif (size_w in (160, 120)) and size_h == 120:
        n_dis = 4
    else:
        raise ValueError("image input dimension not supported")

    def final_dim(dim_len: int, scale: int) -> int:
        # compute_final_conv_layer_dim (Discriminator.py:92-104).
        return int((dim_len / 2) / (2 ** (n_dis - 1 + scale)))

    p: Dict[str, Any] = {}
    for s in range(n_scale):
        for i in range(n_dis):
            p[f"s{s}_conv{i}"] = {
                "kernel": conv_kernel(state_dict[f"modules_features.{s}.{i}.1.weight"]),
                "bias": _np(state_dict[f"modules_features.{s}.{i}.1.bias"]),
            }
        w0 = _np(state_dict[f"modules_logs.{s}.1.weight"])  # (128, C*H*W)
        c = p[f"s{s}_conv{n_dis - 1}"]["kernel"].shape[-1]
        h, w = final_dim(size_h, s), final_dim(size_w, s)
        assert c * h * w == w0.shape[1], (c, h, w, w0.shape)
        w0 = w0.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(w0.shape[0], -1)
        p[f"s{s}_fc0"] = {"kernel": w0.T,
                          "bias": _np(state_dict[f"modules_logs.{s}.1.bias"])}
        p[f"s{s}_fc1"] = {"kernel": _np(state_dict[f"modules_logs.{s}.3.weight"]).T,
                          "bias": _np(state_dict[f"modules_logs.{s}.3.bias"])}
    return {"params": p}


def convert_multires_patch_discriminator(state_dict: Mapping[str, Any],
                                         domain: str = "a",
                                         num_layers: int = 5) -> Dict[str, Any]:
    """imaginaire `net_D` state_dict -> MultiResPatchDiscriminator params.

    torch naming (reference: discriminators/munit.py:27-31 +
    multires_patch.py:286-292): ``discriminator_{a,b}.discriminators.{i}.
    layer{n}.0.layers.conv.*`` — Conv2dBlocks with spectral weight norm
    (yaml:68-75), realized into plain kernels at conversion time like the
    generator's."""
    pref = f"discriminator_{domain}."
    sd = {k[len(pref):]: v for k, v in state_dict.items() if k.startswith(pref)}
    n_dis = len({k.split(".")[1] for k in sd if k.startswith("discriminators.")})
    p: Dict[str, Any] = {}
    for i in range(n_dis):
        d: Dict[str, Any] = {}
        for n in range(num_layers + 2):
            d[f"layer{n}"] = _imag_conv(sd, f"discriminators.{i}.layer{n}.0.layers.conv")
        p[f"dis_{i}"] = d
    return {"params": p}


def convert_inception_v3(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision/pytorch-fid inception_v3 state_dict ->
    rgie_tpu.models.inception.InceptionV3 variables.

    Both checkpoint families share the torchvision module naming
    (``Mixed_5b.branch1x1.conv.weight`` ...); the fc head may be 1000
    (torchvision) or 1008 (pt_inception-2015-12-05) wide — converted as-is.
    AuxLogits and num_batches_tracked are dropped (eval-only graph)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def nest(root, path):
        d = root
        for part in path:
            d = d.setdefault(part, {})
        return d

    for key, val in state_dict.items():
        if key.startswith("AuxLogits") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                nest(params, ["fc"])["kernel"] = dense_kernel(val)
            else:
                nest(params, ["fc"])["bias"] = _np(val)
            continue
        mod, leaf = parts[:-1], parts[-1]
        if mod[-1] == "conv":
            nest(params, mod)["kernel"] = conv_kernel(val)
        elif mod[-1] == "bn":
            if leaf == "weight":
                nest(params, mod)["scale"] = _np(val)
            elif leaf == "bias":
                nest(params, mod)["bias"] = _np(val)
            elif leaf == "running_mean":
                nest(stats, mod)["mean"] = _np(val)
            elif leaf == "running_var":
                nest(stats, mod)["var"] = _np(val)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Diffusers-format diffusion stack (UNet / VAE / CLIP text towers)
#
# The reference's flagship loads `from_pretrained` SD/SDXL checkpoints
# (`/root/reference/src/pipelines/InversionResamplingStableDiffusionPipeline.py:17-21`,
# `...XLPipeline.py:15-20`). These converters map the diffusers/HF state-dict
# naming onto rgie_tpu.diffusion.{unet,vae,text_encoder}'s Flax trees so real
# pretrained weights drive the TPU pipeline.
# ---------------------------------------------------------------------------


class _TrackedStateDict:
    """Mapping wrapper that records every key actually READ, so the diffusers
    converters can assert full consumption (VERDICT r3 #4: a real checkpoint
    with extra/renamed keys must fail loudly, never convert silently-wrong).

    ``in`` checks do not consume; only ``[]``/``get`` hits do."""

    def __init__(self, sd: Mapping[str, Any]):
        self._sd = dict(sd)
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return self._sd[k]

    def get(self, k, default=None):
        if k in self._sd:
            self.consumed.add(k)
            return self._sd[k]
        return default

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def keys(self):
        return self._sd.keys()

    def items(self):
        return self._sd.items()

    def __len__(self):
        return len(self._sd)

    def unconsumed(self, ignore=()) -> list:
        import re

        left = set(self._sd) - self.consumed
        return sorted(k for k in left
                      if not any(re.search(pat, k) for pat in ignore))


# Keys a real checkpoint may legitimately carry that no Flax parameter maps
# to: HF position-id buffers (old transformers versions persist them), EMA
# shadow copies, and BN bookkeeping counters.
IGNORED_CHECKPOINT_KEYS = (
    r"(^|\.)position_ids$",
    r"num_batches_tracked$",
    r"(^|\.)model_ema\.",
    r"(^|\.)logit_scale$",
)


def _check_consumed(sd: "_TrackedStateDict", what: str,
                    ignore=IGNORED_CHECKPOINT_KEYS) -> None:
    left = sd.unconsumed(ignore)
    if left:
        shown = ", ".join(left[:12]) + (" ..." if len(left) > 12 else "")
        raise ValueError(
            f"{what} conversion left {len(left)} state-dict key(s) "
            f"unconsumed — checkpoint layout does not match the target "
            f"config (refusing to convert silently-wrong): {shown}")


def _conv_entry(sd, prefix) -> Dict[str, Any]:
    out = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _lin_entry(sd, prefix) -> Dict[str, Any]:
    out = {"kernel": dense_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _norm_entry(sd, prefix) -> Dict[str, Any]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _gn32_entry(sd, prefix) -> Dict[str, Any]:
    """diffusers GroupNorm -> our GroupNorm32 wrapper (nested 'norm')."""
    return {"norm": _norm_entry(sd, prefix)}


def _diffusers_resnet(sd, prefix, has_temb: bool = True) -> Dict[str, Any]:
    p = {
        "norm1": _gn32_entry(sd, f"{prefix}.norm1"),
        "conv1": _conv_entry(sd, f"{prefix}.conv1"),
        "norm2": _gn32_entry(sd, f"{prefix}.norm2"),
        "conv2": _conv_entry(sd, f"{prefix}.conv2"),
    }
    if has_temb and f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin_entry(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv_entry(sd, f"{prefix}.conv_shortcut")
    return p


def _diffusers_attention(sd, prefix) -> Dict[str, Any]:
    """diffusers Attention (to_q/to_k/to_v Linear no-bias, to_out.0) ->
    our CrossAttention Dense tree."""
    return {
        "to_q": {"kernel": dense_kernel(sd[f"{prefix}.to_q.weight"])},
        "to_k": {"kernel": dense_kernel(sd[f"{prefix}.to_k.weight"])},
        "to_v": {"kernel": dense_kernel(sd[f"{prefix}.to_v.weight"])},
        "to_out": _lin_entry(sd, f"{prefix}.to_out.0"),
    }


def _diffusers_transformer2d(sd, prefix, depth: int) -> Dict[str, Any]:
    """diffusers Transformer2DModel (use_linear_projection=True, the SD2.x/
    SDXL configuration) -> our Transformer2D tree."""
    p: Dict[str, Any] = {
        "norm": _gn32_entry(sd, f"{prefix}.norm"),
        "proj_in": _lin_entry(sd, f"{prefix}.proj_in"),
        "proj_out": _lin_entry(sd, f"{prefix}.proj_out"),
    }
    for k in range(depth):
        b = f"{prefix}.transformer_blocks.{k}"
        p[f"block_{k}"] = {
            "norm1": _norm_entry(sd, f"{b}.norm1"),
            "attn1": _diffusers_attention(sd, f"{b}.attn1"),
            "norm2": _norm_entry(sd, f"{b}.norm2"),
            "attn2": _diffusers_attention(sd, f"{b}.attn2"),
            "norm3": _norm_entry(sd, f"{b}.norm3"),
            "ff": {"proj_in": _lin_entry(sd, f"{b}.ff.net.0.proj"),
                   "proj_out": _lin_entry(sd, f"{b}.ff.net.2")},
        }
    return p


def convert_unet_diffusers(state_dict: Mapping[str, Any], cfg,
                           strict: bool = True) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state_dict -> UNet2DCondition params.

    ``cfg`` is the matching `rgie_tpu.diffusion.unet.UNetConfig`
    (`UNetConfig.sd21()` for SD2.1/sd-turbo, `UNetConfig.sdxl()` for SDXL;
    tiny configs drive the parity tests). Covers both block inventories —
    the converter walks cfg.down_block_types/up_block_types exactly like the
    Flax module, so any diffusers-shaped checkpoint with linear transformer
    projections converts. With ``strict`` (default), every source key must be
    consumed (modulo IGNORED_CHECKPOINT_KEYS) or conversion raises."""
    sd = _TrackedStateDict(state_dict)
    p: Dict[str, Any] = {
        "conv_in": _conv_entry(sd, "conv_in"),
        "time_embed_0": _lin_entry(sd, "time_embedding.linear_1"),
        "time_embed_2": _lin_entry(sd, "time_embedding.linear_2"),
        "norm_out": _gn32_entry(sd, "conv_norm_out"),
        "conv_out": _conv_entry(sd, "conv_out"),
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embed_0"] = _lin_entry(sd, "add_embedding.linear_1")
        p["add_embed_2"] = _lin_entry(sd, "add_embedding.linear_2")

    n_blocks = len(cfg.block_out_channels)
    for bi, btype in enumerate(cfg.down_block_types):
        for li in range(cfg.layers_per_block):
            p[f"down_{bi}_res_{li}"] = _diffusers_resnet(
                sd, f"down_blocks.{bi}.resnets.{li}")
            if btype == "CrossAttnDownBlock2D":
                p[f"down_{bi}_attn_{li}"] = _diffusers_transformer2d(
                    sd, f"down_blocks.{bi}.attentions.{li}",
                    cfg.transformer_layers_per_block[bi])
        if bi < n_blocks - 1:
            p[f"down_{bi}_downsample"] = {
                "conv": _conv_entry(sd, f"down_blocks.{bi}.downsamplers.0.conv")}

    p["mid_res_0"] = _diffusers_resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _diffusers_transformer2d(
        sd, "mid_block.attentions.0", cfg.transformer_layers_per_block[-1])
    p["mid_res_1"] = _diffusers_resnet(sd, "mid_block.resnets.1")

    rev_tf = tuple(reversed(cfg.transformer_layers_per_block))
    for bi, btype in enumerate(cfg.up_block_types):
        for li in range(cfg.layers_per_block + 1):
            p[f"up_{bi}_res_{li}"] = _diffusers_resnet(
                sd, f"up_blocks.{bi}.resnets.{li}")
            if btype == "CrossAttnUpBlock2D":
                p[f"up_{bi}_attn_{li}"] = _diffusers_transformer2d(
                    sd, f"up_blocks.{bi}.attentions.{li}", rev_tf[bi])
        if bi < n_blocks - 1:
            p[f"up_{bi}_upsample"] = {
                "conv": _conv_entry(sd, f"up_blocks.{bi}.upsamplers.0.conv")}
    if strict:
        _check_consumed(sd, "UNet2DConditionModel")
    return {"params": p}


def _vae_mid_attention(sd, prefix) -> Dict[str, Any]:
    """diffusers VAE mid attention -> our VaeAttention tree. Handles both the
    modern Attention naming (group_norm/to_q/to_k/to_v/to_out.0) and the
    legacy AttentionBlock naming (query/key/value/proj_attn, 1x1-conv or
    linear weights)."""
    if f"{prefix}.to_q.weight" in sd:
        names = {"norm": "group_norm", "to_q": "to_q", "to_k": "to_k",
                 "to_v": "to_v", "to_out": "to_out.0"}
    else:
        names = {"norm": "group_norm", "to_q": "query", "to_k": "key",
                 "to_v": "value", "to_out": "proj_attn"}
    p: Dict[str, Any] = {"norm": _gn32_entry(sd, f"{prefix}.{names['norm']}")}
    for dst in ("to_q", "to_k", "to_v", "to_out"):
        w = _np(sd[f"{prefix}.{names[dst]}.weight"])
        if w.ndim == 4:  # legacy 1x1 conv weights
            w = w[:, :, 0, 0]
        p[dst] = {"kernel": w.T, "bias": _np(sd[f"{prefix}.{names[dst]}.bias"])}
    return p


def convert_vae_diffusers(state_dict: Mapping[str, Any], cfg,
                          strict: bool = True) -> Dict[str, Any]:
    """diffusers AutoencoderKL state_dict -> our AutoencoderKL params.

    ``cfg`` is the matching `rgie_tpu.diffusion.vae.VaeConfig`. The top-level
    quant_conv/post_quant_conv fold into our Encoder/Decoder submodules.
    With ``strict`` (default) every source key must be consumed or
    conversion raises (VERDICT r3 #4)."""
    sd = _TrackedStateDict(state_dict)
    enc: Dict[str, Any] = {
        "conv_in": _conv_entry(sd, "encoder.conv_in"),
        "norm_out": _gn32_entry(sd, "encoder.conv_norm_out"),
        "conv_out": _conv_entry(sd, "encoder.conv_out"),
        "quant_conv": _conv_entry(sd, "quant_conv"),
        "mid_res_0": _diffusers_resnet(sd, "encoder.mid_block.resnets.0", False),
        "mid_attn": _vae_mid_attention(sd, "encoder.mid_block.attentions.0"),
        "mid_res_1": _diffusers_resnet(sd, "encoder.mid_block.resnets.1", False),
    }
    n_blocks = len(cfg.block_out_channels)
    for bi in range(n_blocks):
        for li in range(cfg.layers_per_block):
            enc[f"down_{bi}_res_{li}"] = _diffusers_resnet(
                sd, f"encoder.down_blocks.{bi}.resnets.{li}", False)
        if bi < n_blocks - 1:
            enc[f"down_{bi}_downsample"] = _conv_entry(
                sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv")

    dec: Dict[str, Any] = {
        "post_quant_conv": _conv_entry(sd, "post_quant_conv"),
        "conv_in": _conv_entry(sd, "decoder.conv_in"),
        "norm_out": _gn32_entry(sd, "decoder.conv_norm_out"),
        "conv_out": _conv_entry(sd, "decoder.conv_out"),
        "mid_res_0": _diffusers_resnet(sd, "decoder.mid_block.resnets.0", False),
        "mid_attn": _vae_mid_attention(sd, "decoder.mid_block.attentions.0"),
        "mid_res_1": _diffusers_resnet(sd, "decoder.mid_block.resnets.1", False),
    }
    for bi in range(n_blocks):
        for li in range(cfg.layers_per_block + 1):
            dec[f"up_{bi}_res_{li}"] = _diffusers_resnet(
                sd, f"decoder.up_blocks.{bi}.resnets.{li}", False)
        if bi < n_blocks - 1:
            dec[f"up_{bi}_upsample"] = _conv_entry(
                sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv")
    if strict:
        _check_consumed(sd, "AutoencoderKL")
    return {"params": {"encoder": enc, "decoder": dec}}


def convert_clip_text_hf(state_dict: Mapping[str, Any],
                         heads: int = 0, strict: bool = True) -> Dict[str, Any]:
    """HF transformers CLIPTextModel(WithProjection) state_dict ->
    `rgie_tpu.diffusion.text_encoder.TextEncoderHidden` params.

    Layer count and width are inferred from the keys; ``heads`` defaults to
    width // 64 (every SD-family tower uses 64-dim heads). A
    ``text_projection.weight`` (CLIPTextModelWithProjection — SDXL
    text_encoder_2) converts when present. With ``strict`` (default) every
    source key must be consumed or conversion raises (VERDICT r3 #4)."""
    sd = _TrackedStateDict(
        {k[len("text_model."):] if k.startswith("text_model.") else k: v
         for k, v in state_dict.items()})
    width = _np(sd["embeddings.token_embedding.weight"]).shape[1]
    heads = heads or max(width // 64, 1)
    head_dim = width // heads
    layers = 1 + max(int(k.split(".")[2]) for k in sd
                     if k.startswith("encoder.layers."))

    p: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(sd["embeddings.token_embedding.weight"])},
        "positional_embedding": _np(sd["embeddings.position_embedding.weight"]),
        "ln_final": _norm_entry(sd, "final_layer_norm"),
    }
    for i in range(layers):
        src = f"encoder.layers.{i}"

        def heads_kernel(name):
            w = _np(sd[f"{src}.self_attn.{name}.weight"])  # (width, width)
            return w.T.reshape(width, heads, head_dim)

        def heads_bias(name):
            return _np(sd[f"{src}.self_attn.{name}.bias"]).reshape(heads, head_dim)

        out_w = _np(sd[f"{src}.self_attn.out_proj.weight"])
        p[f"resblock_{i}"] = {
            "ln_1": _norm_entry(sd, f"{src}.layer_norm1"),
            "ln_2": _norm_entry(sd, f"{src}.layer_norm2"),
            "attn": {
                "query": {"kernel": heads_kernel("q_proj"), "bias": heads_bias("q_proj")},
                "key": {"kernel": heads_kernel("k_proj"), "bias": heads_bias("k_proj")},
                "value": {"kernel": heads_kernel("v_proj"), "bias": heads_bias("v_proj")},
                "out": {"kernel": out_w.T.reshape(heads, head_dim, width),
                        "bias": _np(sd[f"{src}.self_attn.out_proj.bias"])},
            },
            "mlp": {"c_fc": _lin_entry(sd, f"{src}.mlp.fc1"),
                    "c_proj": _lin_entry(sd, f"{src}.mlp.fc2")},
        }
    if "text_projection.weight" in sd:
        p["text_projection"] = dense_kernel(sd["text_projection.weight"])
    if strict:
        _check_consumed(sd, "CLIPTextModel")
    return {"params": p}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file into a flat numpy state dict (torch-cpu)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "shape")}
