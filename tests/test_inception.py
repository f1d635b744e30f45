"""Inception-v3 feature extractor: torch-twin parity + calibrated metrics.

Reference: `/root/reference/src/analysis/process_result_images.py:78-87` uses
torch_fidelity's Inception-v3 for FID/KID/ISC. The converter
(torch_convert.convert_inception_v3) must move a torchvision-named state_dict
onto rgie_tpu.models.inception bit-for-bit (up to conv reassociation noise).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rgie_tpu.models.inception import (InceptionV3, create_inception,
                                       make_feature_extractor, preprocess)
from rgie_tpu.utils.torch_convert import convert_inception_v3
from tests.torch_twin import TorchInceptionV3


def _randomized_twin(fid_variant=True, num_classes=1008, seed=0):
    torch.manual_seed(seed)
    twin = TorchInceptionV3(num_classes=num_classes, fid_variant=fid_variant)
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.normal_(0, 0.05)
    twin.eval()
    return twin


@pytest.mark.slow
@pytest.mark.parametrize("fid_variant", [True, False])
def test_inception_torch_parity(fid_variant):
    twin = _randomized_twin(fid_variant=fid_variant)
    variables = jax.tree.map(jnp.asarray,
                             convert_inception_v3(twin.state_dict()))
    model = InceptionV3(num_classes=1008, fid_variant=fid_variant)

    rng = np.random.default_rng(0)
    # 149px keeps every valid-pool stage legal and is 4x cheaper than 299.
    x = rng.uniform(-1, 1, (2, 149, 149, 3)).astype(np.float32)
    with torch.no_grad():
        t_feats, t_logits = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_feats, j_logits = model.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_feats), t_feats.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_inception_shapes_and_preprocess(key):
    model, variables = create_inception(key)
    x = jnp.zeros((1, 299, 299, 3))
    feats, logits = model.apply(variables, x)
    assert feats.shape == (1, 2048) and logits.shape == (1, 1008)

    imgs = jnp.full((2, 64, 64, 3), 0.5)
    pre = preprocess(imgs)
    assert pre.shape == (2, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(pre), 0.0, atol=1e-6)


@pytest.mark.slow
def test_calculate_metrics_with_inception(key):
    """FID/KID/ISC in one sweep via the tuple-returning extractor."""
    from rgie_tpu.analysis.fid import calculate_metrics

    model, variables = create_inception(key)
    extractor = make_feature_extractor(model, variables, batch_size=4)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    out = calculate_metrics(a, b, extractor, kid_subset_size=4)
    assert np.isfinite(out["frechet_inception_distance"])
    assert np.isfinite(out["kernel_inception_distance_mean"])
    assert out["inception_score_mean"] > 0
    # identical sets -> FID ~ 0
    same = calculate_metrics(a, a, extractor, kid_subset_size=4)
    assert abs(same["frechet_inception_distance"]) < 1e-2
