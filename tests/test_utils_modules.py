"""Tests for utility modules: yaml config, misc helpers, metrics logger,
prediction stats, diffusion utils, prefetch, clf wrapper."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_yaml_config_parses_shipped_munit(tmp_path):
    from rgie_tpu.utils.yaml_config import (AttrDict, load_yaml,
                                            munit_dis_config_from_yaml,
                                            munit_gen_config_from_yaml,
                                            recursive_update)

    yaml_text = """
gen:
    type: imaginaire.generators.munit
    latent_dim: 8
    num_filters: 64
    num_filters_mlp: 256
    num_res_blocks: 4
    num_mlp_blocks: 2
    num_downsamples_style: 4
    num_downsamples_content: 3
    content_norm_type: instance
    style_norm_type: none
    decoder_norm_type: instance
    weight_norm_type: spectral
    pre_act: True
dis:
    patch_wise: True
    num_filters: 48
    max_num_filters: 1024
    num_layers: 5
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    gen = munit_gen_config_from_yaml(str(p))
    assert gen.latent_dim == 8
    assert gen.num_downsamples_content == 3
    assert gen.pre_act is True
    dis = munit_dis_config_from_yaml(str(p))
    assert dis.num_filters == 48 and dis.num_layers == 5

    cfg = load_yaml(str(p))
    assert cfg.gen.latent_dim == 8  # attribute access
    base = {"a": {"b": 1, "c": 2}}
    recursive_update(base, {"a": {"b": 5}})
    assert base == {"a": {"b": 5, "c": 2}}


def test_interweave_and_splits():
    from rgie_tpu.utils.misc import (create_dataset_splits,
                                     interweave_batch_tensors,
                                     perform_val_train_split)

    a = np.array([[1], [2]])
    b = np.array([[10], [20]])
    out = interweave_batch_tensors(a, b)
    np.testing.assert_array_equal(out, [[1], [10], [2], [20]])

    tr, va = create_dataset_splits(10, 0.2, seed=1)
    assert len(tr) == 8 and len(va) == 2
    assert set(tr) | set(va) == set(range(10))
    t2, v2 = perform_val_train_split(list("abcdefghij"), 0.2, seed=1)
    assert len(t2) == 8 and len(v2) == 2


def test_metrics_logger_jsonl(tmp_path):
    from rgie_tpu.utils.logging import MetricsLogger

    log = MetricsLogger(str(tmp_path), "run1", config={"lr": 0.1})
    log.log({"loss": 1.5}, step=1)
    log.log({"loss": 1.2}, step=2)
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "run1.jsonl")]
    assert lines[0]["event"] == "config"
    assert lines[1]["loss"] == 1.5 and lines[1]["step"] == 1


def test_prediction_stats(tmp_path):
    from rgie_tpu.training.prediction_stats import (plot_prediction_stats,
                                                    prediction_stats_by_timestep)

    rng = np.random.default_rng(0)
    t = rng.integers(0, 1000, 200)
    pred = rng.uniform(0, 1, (200, 2))
    labels = rng.uniform(0, 1, (200, 2))
    stats = prediction_stats_by_timestep(t, pred, labels, num_bins=5)
    assert stats["mean"].shape == (5, 2)
    assert stats["count"].sum() == 200
    out = plot_prediction_stats(stats, str(tmp_path / "stats.png"))
    assert os.path.exists(out)


def test_diffusion_utils(tmp_path):
    from PIL import Image

    from rgie_tpu.diffusion.utils import (exponential_func, fit_time_distance,
                                          image_grid, load_json)

    imgs = [Image.new("RGB", (8, 8), (i * 40, 0, 0)) for i in range(4)]
    grid = image_grid(imgs, 2, 2)
    assert grid.size == (16, 16)

    t = np.linspace(0, 5, 30)
    y = exponential_func(t, 2.0, 0.5, 1.0) + np.random.default_rng(0).normal(0, 0.01, 30)
    params, fitted = fit_time_distance(t, y, do_plot=True,
                                       plot_path=str(tmp_path / "fit.png"))
    assert params is not None
    np.testing.assert_allclose(params[0], 2.0, atol=0.3)
    assert os.path.exists(tmp_path / "fit.png")

    p = tmp_path / "d.json"
    p.write_text('{"x": 1}')
    assert load_json(str(p)) == {"x": 1}


def test_prefetch_iterator(tmp_path, rng):
    from rgie_tpu.data.prefetch import PrefetchIterator, prefetch_batches

    items = [(np.ones((2, 4, 4, 3)) * i, [f"m{i}"]) for i in range(5)]
    out = list(PrefetchIterator(iter(items), depth=2))
    assert len(out) == 5
    np.testing.assert_allclose(out[3][0], 3.0)

    # error propagation
    def bad():
        yield items[0]
        raise ValueError("boom")

    it = PrefetchIterator(bad(), depth=1)
    next(it)
    with pytest.raises(ValueError):
        next(it)


def test_prefetch_batches_with_dataset(tmp_path, rng):
    from rgie_tpu.data.prefetch import prefetch_batches

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return rng.uniform(0, 1, (20, 30, 3)).astype(np.float32), (f"n{i}", f"p{i}", "c")

    batches = list(prefetch_batches(DS(), 2, 16, 12))
    assert sum(b[0].shape[0] for b in batches) == 5
    assert batches[0][0].shape == (2, 12, 12, 3)


def test_clf_wrapper(key, rng):
    from rgie_tpu.training.clf_wrapper import ClfWrapper, create_teacher

    teacher = create_teacher(key, input_size=40, crop_size=32)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    labels = teacher.get_label(imgs)
    assert labels.shape == (2, 2)
    assert teacher.num_outputs == 2


def test_plot_imgs_tensor(tmp_path, rng):
    from rgie_tpu.utils.misc import plot_imgs_tensor

    out = plot_imgs_tensor(rng.uniform(0, 1, (2, 8, 8, 3)),
                           ["a", "b"], save_path=str(tmp_path / "g.png"))
    assert os.path.exists(out)


def test_image_comparison_headless(tmp_path, rng):
    from PIL import Image

    from rgie_tpu.analysis.image_comparison import (scale_single_image,
                                                    show_images_in_subplot)

    p1 = str(tmp_path / "a.jpg")
    Image.fromarray((rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)).save(p1)
    out = show_images_in_subplot([p1], ["orig"], [(0.5, 0.4)],
                                 save_path=str(tmp_path / "cmp.png"))
    assert os.path.exists(out)
    out2 = scale_single_image(p1, str(tmp_path / "scaled.jpg"), size=32,
                              annotation="test")
    img = Image.open(out2)
    assert min(img.size) == 32


def test_orbax_checkpoint_round_trip(tmp_path, key):
    import jax.numpy as jnp

    from rgie_tpu.utils.checkpoint import (BestCheckpointer, load_checkpoint,
                                           save_checkpoint)

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    path = save_checkpoint(str(tmp_path / "ck"), tree)
    restored = load_checkpoint(path, tree)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(tree["w"]))

    bc = BestCheckpointer(str(tmp_path / "best"))
    assert bc.maybe_save(1.0, tree, step=1)
    assert not bc.maybe_save(2.0, tree, step=2)
    assert bc.maybe_save(0.5, tree, step=3)
    assert bc.best_loss == 0.5


def test_host_scoped_cache_dir_distinct_per_cpu(tmp_path):
    """VERDICT r4 #7: persistent-cache entries AOT-compiled for one machine
    type must never be loaded on another — different host CPU feature
    strings map to disjoint cache dirs."""
    from rgie_tpu.utils.jaxcache import (host_cpu_features,
                                         host_scoped_cache_dir)

    a = host_scoped_cache_dir(tmp_path, features="x86_64|Xeon|aes avx512f")
    b = host_scoped_cache_dir(tmp_path, features="x86_64|Xeon|aes")
    assert a != b
    assert a.parent == b.parent == tmp_path
    assert a.name.startswith("host-") and b.name.startswith("host-")
    # same features -> same dir (the scoping is deterministic)
    assert a == host_scoped_cache_dir(tmp_path, features="x86_64|Xeon|aes avx512f")
    # the real feature string is non-degenerate on this host
    feats = host_cpu_features()
    assert "|" in feats and len(feats) > 8
