"""Background prefetch pipeline: overlap host decode/preprocess with device
compute.

The reference's DataLoader runs with num_workers=0 (decode ON the training
thread, adapt_images.py:68). Here a producer thread decodes + preprocesses
(via the native C++ feeder when built) and stages device transfers one batch
ahead, so the TPU never waits on PIL.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


class PrefetchIterator:
    """Wrap a host batch iterator with an N-deep background queue."""

    _SENTINEL = object()

    def __init__(self, iterator, depth: int = 2, device_put=None):
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._device_put = device_put
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, args=(iterator,),
                                        daemon=True)
        self._thread.start()

    def _worker(self, iterator):
        try:
            for item in iterator:
                if self._device_put is not None:
                    images, meta = item
                    item = (self._device_put(images), meta)
                self._queue.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch_batches(dataset, batch_size: int, input_size: int, crop_size: int,
                     normalize: bool = False, limit: Optional[int] = None,
                     depth: int = 2, device_put=None,
                     use_native: bool = True) -> Iterator[Tuple[np.ndarray, list]]:
    """Batched, prefetched dataset iterator. With use_native, the resize/crop/
    normalize runs in the C++ thread pool (rgie_tpu.data.native_preprocess)."""

    def gen():
        from rgie_tpu.data.dataset import preprocess_image
        from rgie_tpu.data.native_preprocess import native_available, preprocess_batch

        native = use_native and native_available()
        n = len(dataset) if limit is None else min(limit, len(dataset))
        raw_imgs, metas = [], []
        for i in range(n):
            img, meta = dataset[i]
            raw_imgs.append(img)
            metas.append(meta)
            if len(raw_imgs) == batch_size or i == n - 1:
                if native:
                    batch = preprocess_batch(raw_imgs, input_size, crop_size, normalize)
                else:
                    batch = np.concatenate([
                        preprocess_image(im, input_size, crop_size, normalize)
                        for im in raw_imgs])
                yield batch, metas
                raw_imgs, metas = [], []

    return PrefetchIterator(gen(), depth=depth, device_put=device_put)
