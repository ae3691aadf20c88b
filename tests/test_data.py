"""Data-layer tests over a synthetic on-disk dataset."""

import os

import numpy as np
import pytest

from prompt_diffusion_tpu.data.edit_dataset import BatchLoader, EditDataset
from prompt_diffusion_tpu.data.laion_meta import ControlDataModule, LaionMetaDataset, make_split_indices
from prompt_diffusion_tpu.data.tokenizer import load_tokenizer

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    """<root>/laion_nonhuman/<dir>/NNN.jpg + .txt + <dir>/<task>/NNN.jpg"""
    root = tmp_path_factory.mktemp("laion")
    rng = np.random.default_rng(0)
    base = root / "laion_nonhuman"
    for d in ("d0", "d1"):
        os.makedirs(base / d / "canny", exist_ok=True)
        os.makedirs(base / d / "hed", exist_ok=True)
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(base / d / f"{i:03d}.jpg")
            (base / d / f"{i:03d}.txt").write_text(f"prompt {d} {i}")
            for task in ("canny", "hed"):
                carr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                Image.fromarray(carr).save(base / d / task / f"{i:03d}.jpg")
    return str(root)


def test_edit_dataset_semantics(fake_root):
    ds = EditDataset(fake_root, task_list=("canny", "hed"), resolution=32, splits=(1.0, 0.0))
    assert len(ds) == 8
    rng = np.random.default_rng(1)
    s = ds.sample(rng, 3)
    assert s["image"].shape == (32, 32, 3) and s["query"].shape == (32, 32, 3)
    assert s["example_pair"].shape == (32, 32, 6)  # channel concat, not width
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert 0.0 <= s["query"].min() and s["query"].max() <= 1.0
    assert s["prompt"].startswith("prompt ")
    # support image is NOT the query image (reference bug fixed):
    # pair[..., 3:] is the support image in [-1,1]; compare to the target
    support_img_01 = (s["example_pair"][..., 3:] + 1) / 2
    target_01 = (s["image"] + 1) / 2
    assert not np.allclose(support_img_01, target_01, atol=1 / 255)


def test_edit_dataset_split(fake_root):
    tr = EditDataset(fake_root, task_list=("canny",), resolution=32, splits=(0.75, 0.25))
    va = EditDataset(fake_root, task_list=("canny",), resolution=32, splits=(0.75, 0.25), split="val")
    assert len(tr.file_mapping["canny"]) == 6
    assert len(va.file_mapping["canny"]) == 2
    tr_paths = {r.gt_path for r in tr.file_mapping["canny"]}
    va_paths = {r.gt_path for r in va.file_mapping["canny"]}
    assert not tr_paths & va_paths


def test_batch_loader(fake_root):
    ds = EditDataset(fake_root, task_list=("canny", "hed"), resolution=32, splits=(1.0, 0.0))
    loader = BatchLoader(ds, batch_size=4, seed=0, tokenizer=load_tokenizer(None))
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["example_pair"].shape == (4, 32, 32, 6)
    assert batch["token_ids"].shape == (4, 77)
    assert batch["null_ids"].shape == (1, 77)
    assert len(batch["prompt"]) == 4


def test_batch_loader_sharding(fake_root):
    ds = EditDataset(fake_root, task_list=("canny",), resolution=32, splits=(1.0, 0.0))
    b0 = next(iter(BatchLoader(ds, batch_size=2, seed=0, shard_id=0, num_shards=2)))
    b1 = next(iter(BatchLoader(ds, batch_size=2, seed=0, shard_id=1, num_shards=2)))
    assert not np.array_equal(b0["image"], b1["image"])


def test_batch_loader_shards_are_disjoint_and_cover(fake_root):
    """DistributedSampler contract: the per-epoch shard index sets must
    partition the (shared) permutation — no sample on two shards, and
    together the shards cover the dataset. (A shard-dependent permutation
    seed silently duplicates ~half the samples across hosts.)"""
    from prompt_diffusion_tpu.data.edit_dataset import shard_order

    ds = EditDataset(fake_root, task_list=("canny",), resolution=32, splits=(1.0, 0.0))
    n = len(ds)
    for epoch in (0, 1):
        shards = [set(shard_order(n, 0, epoch, sid, 2).tolist()) for sid in (0, 1)]
        assert shards[0] & shards[1] == set(), "shards overlap"
        assert shards[0] | shards[1] == set(range(n)), "shards must cover the dataset"
    # different epochs reshuffle
    assert list(shard_order(n, 0, 0, 0, 2)) != list(shard_order(n, 0, 1, 0, 2))


def test_laion_meta_dataset(fake_root):
    path = os.path.join(fake_root, "laion_nonhuman")
    ds = LaionMetaDataset(path, tasks=("canny", "hed"), tasks_per_batch=2, res=32, shots=1)
    assert len(ds) == 8
    s = ds.sample(np.random.default_rng(0), 2)
    assert s["images"].shape == (2, 32, 32, 3)  # 2*shots
    assert s["conditions"].shape == (2, 2, 32, 32, 3)  # (T, 2*shots, ...)
    assert s["task_indices"].shape == (2,)
    assert len(s["prompts"]) == 2
    assert s["images"].min() >= -1 and s["conditions"].min() >= 0


def test_split_indices_deterministic():
    a_tr, a_va = make_split_indices(100, 0.1)
    b_tr, b_va = make_split_indices(100, 0.1)
    np.testing.assert_array_equal(a_tr, b_tr)
    assert len(a_va) == 10 and len(set(a_tr) & set(a_va)) == 0


def test_control_datamodule(fake_root):
    dm = ControlDataModule(fake_root, nonhuman_tasks=("canny", "hed"),
                           res=32, shots=1, val_fraction=0.25)
    assert "nonhuman" in dm.datasets and "human" not in dm.datasets
    batch = next(iter(dm.loader("train", batch_size=2, seed=0)))
    assert batch["images"].shape == (2, 2, 32, 32, 3)
    assert batch["conditions"].shape[0] == 2
