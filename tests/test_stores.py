"""Folder/LMDB keyed stores (imaginaire data-utils loader surface,
reference `/root/reference/src/external/imaginaire/utils/data.py:438-482`).
VERDICT r4 #9: the data-utils component's loader sub-surface."""
import numpy as np
import pytest
from PIL import Image

from rgie_tpu.data import FolderStore, LmdbStore, load_from_folder
from rgie_tpu.data.stores import load_from_lmdb


@pytest.fixture()
def folder_root(tmp_path):
    (tmp_path / "images" / "seg").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("images/a.png", "images/seg/b.jpg"):
        arr = rng.integers(0, 255, size=(8, 10, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
    (tmp_path / "images" / "meta.txt").write_bytes(b"hello")
    return tmp_path / "images"


def test_folder_store_decodes_images_and_raw(folder_root):
    store = FolderStore(str(folder_root))
    assert store.keys() == ["a.png", "meta.txt", "seg/b.jpg"]
    img = store.getitem_by_path(b"a.png", "images")
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8
    # nested key, str accepted like bytes
    img2 = store.getitem_by_path("seg/b.jpg", "images")
    assert img2.shape == (8, 10, 3)
    # non-image data types come back as raw bytes
    assert store.getitem_by_path(b"meta.txt", "meta") == b"hello"


def test_load_from_folder_dict_of_lists(folder_root):
    """Reference semantics: keys dict of data_type -> path(s); scalars are
    promoted to single-element lists; values are lists of decoded items."""
    handles = {"images": FolderStore(str(folder_root)),
               "meta": FolderStore(str(folder_root))}
    out = load_from_folder(
        {"images": ["a.png", "seg/b.jpg"], "meta": "meta.txt"}, handles)
    assert [i.shape for i in out["images"]] == [(8, 10, 3), (8, 10, 3)]
    assert out["meta"] == [b"hello"]


def test_folder_store_missing_root(tmp_path):
    with pytest.raises(FileNotFoundError):
        FolderStore(str(tmp_path / "nope"))


def test_lmdb_store_gated_or_roundtrip(tmp_path, folder_root):
    """lmdb is optional (not baked into this image): without it the store
    must fail loudly at construction; with it, reads must round-trip."""
    try:
        import lmdb  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="lmdb"):
            LmdbStore(str(tmp_path))
        return
    env = lmdb.open(str(tmp_path / "db"))  # pragma: no cover - no lmdb here
    with env.begin(write=True) as txn:
        txn.put(b"meta.txt", b"hello")
        txn.put(b"a.png", (folder_root / "a.png").read_bytes())
    env.close()
    store = LmdbStore(str(tmp_path / "db"))
    out = load_from_lmdb({"images": "a.png", "meta": ["meta.txt"]},
                         {"images": store, "meta": store})
    assert out["images"][0].shape == (8, 10, 3)
    assert out["meta"] == [b"hello"]
