"""Result-image post-processing: per-method VA + low-level metrics + stats +
distributional quality.

Reference: `/root/reference/src/analysis/process_result_images.py:17-89` —
folder of `{name}_{method}.jpg` outputs -> pandas frame of VA + 6 low-level
metrics, Kruskal/ANOVA per metric, FID/KID/ISC per method vs originals.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd

from rgie_tpu.analysis import low_level_metrics as llim
from rgie_tpu.analysis.predict_va import get_classifier_score_of_images
from rgie_tpu.analysis.stats_tests import one_way_stats_test

METRIC_COLUMNS = ("valence", "arousal", "saturation", "bright", "colorful",
                  "light", "contrast", "blur")


def collect_scores(folder_path: str, model_path: Optional[str] = None) -> pd.DataFrame:
    """Scan `{name}_{method}.jpg` files (single-char method == 'original',
    process_result_images.py:30-35) into the metrics frame."""
    rows: Dict[str, list] = {k: [] for k in ("method", *METRIC_COLUMNS, "image_path")}
    for filename in sorted(os.listdir(folder_path)):
        if not (filename.endswith(".jpg") and "_" in filename):
            continue
        try:
            _, flag_ext = filename.rsplit("_", 1)
            flag = flag_ext.split(".")[0]
            if len(flag) == 1:
                flag = "original"
            path = os.path.join(folder_path, filename)
            score = get_classifier_score_of_images([path], "va", model_path)
            rows["method"].append(flag)
            rows["valence"].append(float(score[0, 0]))
            rows["arousal"].append(float(score[0, 1]))
            rows["saturation"].append(llim.compute_mean_saturation(path))
            rows["bright"].append(llim.compute_mean_brightness(path))
            rows["colorful"].append(llim.calculate_colorfulness(path))
            rows["light"].append(llim.compute_lighting_diversity(path))
            rows["contrast"].append(llim.compute_rms_contrast(path))
            rows["blur"].append(llim.compute_blur_effect(path))
            rows["image_path"].append(path)
        except Exception as e:  # per-image fault isolation (reference :57-58)
            print(f"Error processing {filename}: {e}")
    return pd.DataFrame(rows)


def load_image_set(paths: List[str], size: int = 299) -> np.ndarray:
    from rgie_tpu.data.dataset import load_image_rgb, preprocess_image

    return np.concatenate([preprocess_image(load_image_rgb(p), size, size)
                           for p in paths])


def process_result_images(folder_path: str, model_path: Optional[str] = None,
                          feature_extractor: Optional[Callable] = None,
                          kid_subset_size: int = 20) -> pd.DataFrame:
    """Full analysis pass (process_result_images.py:17-89)."""
    df = collect_scores(folder_path, model_path)
    if df.empty:
        print("no result images found")
        return df

    for metric in METRIC_COLUMNS:
        if df["method"].nunique() > 1:
            one_way_stats_test(df, "method", metric)

    grouped = df.groupby("method")["image_path"].apply(list).to_dict()
    if "original" in grouped and feature_extractor is not None:
        from rgie_tpu.analysis.fid import calculate_metrics

        originals = load_image_set(grouped["original"])
        for method, paths in grouped.items():
            if method == "original":
                continue
            edited = load_image_set(paths)
            quality = calculate_metrics(originals, edited, feature_extractor,
                                        kid_subset_size=kid_subset_size)
            print(method)
            print(quality)
    return df
