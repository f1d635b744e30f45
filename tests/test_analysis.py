"""Analysis-suite tests: low-level metrics oracles, stats tests, FID/KID/IS
math, native preprocessing parity, checkpoint utils."""

import numpy as np
import pandas as pd
import pytest

from rgie_tpu.analysis import fid as FID
from rgie_tpu.analysis import low_level_metrics as LL
from rgie_tpu.analysis import stats_tests as ST


def _img(rng, h=32, w=32):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_brightness_and_contrast(rng):
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    np.testing.assert_allclose(LL.compute_mean_brightness(img), 128.0, atol=0.5)
    np.testing.assert_allclose(LL.compute_rms_contrast(img), 0.0, atol=1e-6)
    img2 = _img(rng)
    assert LL.compute_rms_contrast(img2) > 10


def test_saturation_gray_is_zero():
    gray = np.full((8, 8, 3), 100, dtype=np.uint8)
    np.testing.assert_allclose(LL.compute_mean_saturation(gray), 0.0, atol=1e-6)
    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[..., 0] = 255
    np.testing.assert_allclose(LL.compute_mean_saturation(red), 255.0, atol=1e-4)


def test_colorfulness_orders():
    gray = np.full((16, 16, 3), 128, dtype=np.uint8)
    rng = np.random.default_rng(1)
    colorful = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    assert LL.calculate_colorfulness(colorful) > LL.calculate_colorfulness(gray)


def test_blur_effect_detects_blur(rng):
    sharp = _img(rng, 64, 64)
    # numpy box blur (cv2 deadlocks XLA threads when imported into a jax process)
    f = sharp.astype(np.float64)
    for _ in range(6):
        f = (np.roll(f, 1, 0) + np.roll(f, -1, 0) + np.roll(f, 1, 1) + np.roll(f, -1, 1) + f) / 5
    blurred = f.astype(np.uint8)
    b_sharp = LL.compute_blur_effect(sharp)
    b_blur = LL.compute_blur_effect(blurred)
    assert 0 <= b_sharp <= 1 and 0 <= b_blur <= 1
    assert b_blur > b_sharp


def test_one_way_stats_routes(rng):
    # normal data -> anova; one group clearly shifted -> significant posthoc
    a = rng.normal(0, 1, 40)
    b = rng.normal(3, 1, 40)
    df = pd.DataFrame({"m": ["a"] * 40 + ["b"] * 40, "v": np.concatenate([a, b])})
    res = ST.one_way_stats_test(df, "m", "v", verbose=False)
    assert res["p_value"] < 0.01
    assert "posthoc" in res


def test_kruskal_and_conover(rng):
    a = rng.exponential(1, 50)
    b = rng.exponential(1, 50) + 2
    c = rng.exponential(1, 50)
    df = pd.DataFrame({"m": ["a"] * 50 + ["b"] * 50 + ["c"] * 50,
                       "v": np.concatenate([a, b, c])})
    res = ST.kruskal_wallis_test(df, "m", "v", verbose=False)
    assert res["p_value"] < 0.01
    ph = res["posthoc"]
    assert ph[("a", "b")] < 0.05
    assert ph[("a", "c")] > 0.05


def test_holm_bonferroni():
    p = [0.01, 0.04, 0.03]
    bon = ST.adjust_pvalues(p, "bonferroni")
    np.testing.assert_allclose(bon, [0.03, 0.12, 0.09])
    holm = ST.adjust_pvalues(p, "holm")
    np.testing.assert_allclose(holm, [0.03, 0.06, 0.06])


def test_fid_zero_for_identical(rng):
    f = rng.normal(size=(200, 16))
    assert abs(FID.fid_from_features(f, f.copy())) < 1e-6
    g = rng.normal(3, 1, size=(200, 16))
    assert FID.fid_from_features(f, g) > 1.0


def test_kid_unbiased_near_zero_same_dist(rng):
    f1 = rng.normal(size=(300, 8))
    f2 = rng.normal(size=(300, 8))
    mean, _ = FID.kid_from_features(f1, f2, subset_size=100, num_subsets=20)
    assert abs(mean) < 0.05
    f3 = rng.normal(2, 1, size=(300, 8))
    mean2, _ = FID.kid_from_features(f1, f3, subset_size=100, num_subsets=20)
    assert mean2 > mean + 0.1


def test_inception_score_bounds(rng):
    # uniform probs -> IS ~ 1; confident diverse probs -> IS ~ num classes
    uniform = np.full((100, 10), 0.1)
    is_u, _ = FID.inception_score(uniform, splits=2)
    np.testing.assert_allclose(is_u, 1.0, atol=1e-5)
    onehot = np.eye(10)[rng.integers(0, 10, 100)] * 0.999 + 1e-4
    is_o, _ = FID.inception_score(onehot, splits=2)
    assert is_o > 5


def test_native_preprocess_matches_pil(rng):
    from rgie_tpu.data.dataset import preprocess_image
    from rgie_tpu.data.native_preprocess import native_available, preprocess_batch

    imgs = [_img(rng, 100, 140), _img(rng, 70, 60)]
    out = preprocess_batch(imgs, 64, 56)
    ref = np.concatenate([preprocess_image(i.astype(np.float32) / 255, 64, 56)
                          for i in imgs])
    assert out.shape == (2, 56, 56, 3)
    tol = 0.02 if native_available() else 1e-6
    assert np.abs(out - ref).max() < tol


def test_edit_manifest(tmp_path):
    from rgie_tpu.utils.checkpoint import EditManifest

    m = EditManifest(str(tmp_path / "manifest.jsonl"))
    assert not m.is_done("img1", "pos_01")
    m.mark("img1", "pos_01", rec_error=0.1)
    assert m.is_done("img1", "pos_01")
    m.close()
    m2 = EditManifest(str(tmp_path / "manifest.jsonl"))
    assert m2.is_done("img1", "pos_01")
    assert not m2.is_done("img2", "pos_01")
    m2.close()


def test_compound_and_stats_utils():
    from rgie_tpu.utils.stats import check_init_stats_adapt, cohen_d, record_edit

    stats = {}
    check_init_stats_adapt(stats, "pos_01")
    record_edit(stats["pos_01"], np.array([[0.5, 0.4]]), np.array([[0.6, 0.3]]), 0.05)
    assert stats["pos_01"]["delta_valence"][0] == pytest.approx(0.1)
    assert stats["pos_01"]["delta_arousal"][0] == pytest.approx(-0.1)
    d = cohen_d([1, 2, 3, 4], [3, 4, 5, 6])
    assert d == pytest.approx(-1.549, abs=0.01)


def test_augmentor_full_surface():
    """The imaginaire Augmentor key set (reference data.py:93-176) end to end:
    every supported key transforms a float image without leaving [0,1] or
    breaking shape expectations."""
    import numpy as np

    from rgie_tpu.data.augmentor import Augmentor

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)

    aug = Augmentor({
        "resize_smallest_side": 48,
        "random_resize_h_w_aspect": "44,44(0.9,1.1)",
        "rotate": 10,
        "random_rotate_90": True,
        "random_scale_limit": 0.2,
        "random_crop_h_w": "32,32",
        "horizontal_flip": True,
        "contrast": {"brightness_limit": 0.2, "contrast_limit": 0.2, "p": 1.0},
        "blur": {"blur_limit": 5, "p": 1.0},
        "motion_blur": {"blur_limit": 5, "p": 1.0},
        "compression": {"quality_lower": 60, "p": 1.0},
        "gamma": {"gamma_limit_lb": 80, "gamma_limit_ub": 120, "p": 1.0},
    })
    out = aug(img, rng)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0

    # deterministic keys only
    out2 = Augmentor({"resize_h_w": "24,20", "center_crop_h_w": "16,16"})(img, rng)
    assert out2.shape == (16, 16, 3)
    # rotate-90 determinism under a fixed generator
    a = Augmentor({"random_rotate_90": True})
    r1 = a(img, np.random.default_rng(7))
    r2 = a(img, np.random.default_rng(7))
    assert np.array_equal(r1, r2)
    # unknown key raises like the reference
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Augmentor({"nope": 1})(img, rng)
