"""Data layer: caption-feed + COCO datasets, host preprocessing, prefetch."""

from rgie_tpu.data.augmentor import Augmentor
from rgie_tpu.data.dataset import (
    CaptionFeedDataset,
    ImageDirectoryDataset,
    CocoCaptionsDataset,
    first_caption,
    iterate_batches,
    ShardedView,
    load_image_rgb,
    preprocess_image,
)
from rgie_tpu.data.stores import (
    FolderStore,
    LmdbStore,
    load_from_folder,
    load_from_lmdb,
)
