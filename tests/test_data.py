import numpy as np
import pytest

from tests.utils_fixtures import make_fake_coco, make_tokenizer
from virtex_tpu.data.datasets.captioning import CaptioningDataset, pad_stack
from virtex_tpu.data.datasets.classification import (
    MultiLabelClassificationDataset,
    TokenClassificationDataset,
)
from virtex_tpu.data.datasets.masked_lm import MaskedLmDataset
from virtex_tpu.data.loader import DataLoader, ShardedSampler
from virtex_tpu.data import transforms as T


@pytest.fixture(scope="module")
def coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return str(make_fake_coco(root))


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    return make_tokenizer(tmp_path_factory.mktemp("tok"))


def _train_transform(size=64):
    return T.Compose([
        T.RandomResizedSquareCrop(size),
        T.HorizontalFlip(),
        T.ColorJitter(),
        T.Normalize(),
    ])


def test_captioning_dataset_item(coco, tokenizer):
    ds = CaptioningDataset(coco, "train", tokenizer, _train_transform(), 30)
    item = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert item["image"].shape == (64, 64, 3)
    assert item["image"].dtype == np.float32
    toks = item["caption_tokens"]
    assert toks[0] == ds.sos_id and toks[-1] == ds.eos_id
    # noitpac is the exact reverse.
    assert (item["noitpac_tokens"] == toks[::-1]).all()
    assert item["caption_lengths"] == len(toks)


def test_captioning_collate_static_shape(coco, tokenizer):
    ds = CaptioningDataset(coco, "train", tokenizer, _train_transform(), 30)
    rng = np.random.RandomState(0)
    batch = ds.collate_fn([ds.__getitem__(i, rng=rng) for i in range(4)])
    assert batch["caption_tokens"].shape == (4, 30)
    assert batch["noitpac_tokens"].shape == (4, 30)
    assert batch["image"].shape == (4, 64, 64, 3)
    # Padding is the padding index.
    for i in range(4):
        n = batch["caption_lengths"][i]
        assert (batch["caption_tokens"][i, n:] == ds.padding_idx).all()


def test_masked_lm_dataset(coco, tokenizer):
    ds = MaskedLmDataset(coco, "train", tokenizer, _train_transform(), 30)
    item = ds.__getitem__(0, rng=np.random.RandomState(1))
    toks, labels = item["caption_tokens"], item["masked_labels"]
    assert toks.shape == labels.shape
    # Wherever labels != pad, token was replaced by [MASK].
    masked_pos = np.nonzero(labels != ds.padding_idx)[0]
    assert len(masked_pos) >= 1
    assert (toks[masked_pos] == ds.mask_id).all()
    # Boundary tokens never masked.
    assert toks[0] == ds.sos_id and toks[item["caption_lengths"] - 1] == ds.eos_id


def test_token_classification_dataset(coco, tokenizer):
    ds = TokenClassificationDataset(coco, "train", tokenizer, _train_transform(), 30)
    batch = ds.collate_fn([ds.__getitem__(i, rng=np.random.RandomState(i)) for i in range(2)])
    assert batch["labels"].shape == (2, 30)


def test_multilabel_dataset(coco):
    ds = MultiLabelClassificationDataset(coco, "train", _train_transform())
    assert len(ds) > 0
    item = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert item["labels"].min() >= 1  # 0 reserved for background
    assert item["labels"].max() <= 80
    batch = ds.collate_fn([item])
    assert batch["labels"].shape == (1, ds.MAX_LABELS)


def test_horizontal_flip_swaps_left_right():
    t = T.HorizontalFlip(p=1.0)
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    out, cap = t(img, "the dog on the left looks right", np.random.RandomState(0))
    assert cap == "the dog on the right looks left"
    assert (out == img[:, ::-1]).all()


def test_horizontal_flip_substring_swap_matches_reference():
    # The reference swaps SUBSTRINGS (transforms.py:33-36), hitting
    # "left"/"right" inside words — that quirk is part of the published
    # training recipe, so it is reproduced exactly.
    swap = T.HorizontalFlip.swap_words
    assert swap("left-hand turn") == "right-hand turn"
    assert swap("a bright kite") == "a bleft kite"  # yes, really
    assert swap("upright and leftover") == "upleft and rightover"


def test_normalize_range():
    img = np.full((4, 4, 3), 255, dtype=np.uint8)
    out, _ = T.Normalize()(img)
    expected = (1.0 - np.array(T.IMAGENET_COLOR_MEAN)) / np.array(T.IMAGENET_COLOR_STD)
    assert np.allclose(out[0, 0], expected, atol=1e-5)


def test_smallest_resize_aspect():
    img = np.zeros((100, 200, 3), dtype=np.uint8)
    out, _ = T.SmallestMaxSizeResize(50)(img)
    assert out.shape == (50, 100, 3)


def test_random_resized_crop_shape(rng):
    img = np.zeros((100, 200, 3), dtype=np.uint8)
    out, _ = T.RandomResizedSquareCrop(64)(img, None, rng)
    assert out.shape == (64, 64, 3)


def test_sharded_sampler_partition():
    s0 = ShardedSampler(10, shuffle=True, seed=1, num_shards=2, shard_index=0)
    s1 = ShardedSampler(10, shuffle=True, seed=1, num_shards=2, shard_index=1)
    it0, it1 = iter(s0), iter(s1)
    e0 = [next(it0)[1] for _ in range(5)]
    e1 = [next(it1)[1] for _ in range(5)]
    assert set(e0).isdisjoint(e1)
    assert len(set(e0 + e1)) == 10


def test_sampler_reshuffles_across_epochs():
    s = ShardedSampler(16, shuffle=True, seed=3)
    it = iter(s)
    p0 = [next(it) for _ in range(16)]
    p1 = [next(it) for _ in range(16)]
    e0, e1 = [i for _, i in p0], [i for _, i in p1]
    assert sorted(e0) == sorted(e1) == list(range(16))
    assert e0 != e1
    assert {e for e, _ in p0} == {0} and {e for e, _ in p1} == {1}


def test_sampler_resumes_mid_epoch():
    s = ShardedSampler(16, shuffle=True, seed=3)
    full = [pair for pair, _ in zip(s.iterate(0), range(40))]
    resumed = [pair for pair, _ in zip(s.iterate(25), range(15))]
    assert resumed == full[25:]


class _RecordingDataset:
    """Records the augmentation RNG draw, so stream equality covers both
    index order AND per-item augmentation reproducibility."""

    def __len__(self):
        return 13

    def __getitem__(self, idx, rng=None):
        return {"idx": np.asarray(idx, np.int64),
                "draw": np.asarray(rng.randint(0, 1 << 30), np.int64)}

    def collate_fn(self, items):
        return {k: np.stack([d[k] for d in items]) for k in items[0]}


@pytest.mark.parametrize("workers", [0, 2])
def test_loader_resume_replays_identical_batches(workers):
    from virtex_tpu.data.loader import DataLoader as DL

    def make():
        return DL(_RecordingDataset(), batch_size=3, shuffle=True,
                  num_workers=workers, seed=11, infinite=True)

    straight = make()
    it = iter(straight)
    reference_batches = [next(it) for _ in range(10)]

    # interrupted run: 4 batches, snapshot, resume in a NEW loader
    first = make()
    it1 = iter(first)
    for _ in range(4):
        next(it1)
    snap = first.state_dict()
    assert snap == {"items_consumed": 12}

    resumed = make()
    resumed.load_state_dict(snap)
    it2 = iter(resumed)
    for want in reference_batches[4:]:
        got = next(it2)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])


def test_loader_prefetched_but_unconsumed_batches_replay():
    """The producer thread prefetches ahead; position must track CONSUMED
    batches only, so nothing is skipped on resume."""
    from virtex_tpu.data.loader import DataLoader as DL

    ld = DL(_RecordingDataset(), batch_size=3, shuffle=True, num_workers=2,
            prefetch=4, seed=5, infinite=True)
    it = iter(ld)
    got = [next(it) for _ in range(2)]
    import time
    time.sleep(0.3)  # let the producer fill the prefetch queue
    assert ld.state_dict() == {"items_consumed": 6}

    ld2 = DL(_RecordingDataset(), batch_size=3, shuffle=True, num_workers=0,
             seed=5, infinite=True)
    ld2.load_state_dict(ld.state_dict())
    nxt = next(iter(ld2))
    # equals the 3rd batch of a straight stream
    straight = DL(_RecordingDataset(), batch_size=3, shuffle=True,
                  num_workers=0, seed=5, infinite=True)
    its = iter(straight)
    for _ in range(2):
        next(its)
    want = next(its)
    for k in want:
        np.testing.assert_array_equal(nxt[k], want[k])


def test_dataloader_infinite(coco, tokenizer):
    ds = CaptioningDataset(coco, "train", tokenizer, _train_transform(), 30)
    loader = DataLoader(ds, batch_size=4, num_workers=2, infinite=True, seed=0)
    it = iter(loader)
    batches = [next(it) for _ in range(5)]  # > one epoch (8 images / 4)
    assert all(b["image"].shape == (4, 64, 64, 3) for b in batches)


def test_dataloader_finite_epoch(coco, tokenizer):
    ds = CaptioningDataset(coco, "val", tokenizer, _train_transform(), 30)
    loader = DataLoader(ds, batch_size=4, num_workers=0, infinite=False,
                        shuffle=False)
    batches = list(loader)
    assert len(batches) == 2


def test_pad_stack_truncates():
    out = pad_stack([np.arange(40)], 30, 0)
    assert out.shape == (1, 30)
    assert (out[0] == np.arange(30)).all()


def test_center_crop_upscales_small_images():
    """Documented divergence: images smaller than the crop are upscaled to
    the static size (albumentations would error; XLA needs fixed shapes)."""
    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    out, _ = T.CenterSquareCrop(64)(img, None)
    assert out.shape == (64, 64, 3)


def test_loader_pad_final_keeps_static_shapes():
    from virtex_tpu.data.loader import DataLoader as DL

    ld = DL(_RecordingDataset(), batch_size=5, shuffle=False, num_workers=0,
            infinite=False, drop_last=False, pad_final=True)
    batches = list(iter(ld))
    # 13 items, batch 5 → 2 full + padded tail (3 real + 2 repeats)
    assert [b["idx"].shape[0] for b in batches] == [5, 5, 5]
    tail = batches[-1]["idx"]
    np.testing.assert_array_equal(tail, [10, 11, 12, 10, 11])
    # padded duplicates are exact copies (same rng draw)
    draws = batches[-1]["draw"]
    assert draws[0] == draws[3] and draws[1] == draws[4]


def test_sharded_loader_resume_replays_identically():
    """Resume correctness holds per shard: each host's loader replays its
    own stream from the restored position."""
    from virtex_tpu.data.loader import DataLoader as DL

    def make(shard):
        return DL(_RecordingDataset(), batch_size=2, shuffle=True, seed=4,
                  num_workers=0, infinite=True, num_shards=2,
                  shard_index=shard)

    for shard in (0, 1):
        ref_it = iter(make(shard))
        ref = [next(ref_it) for _ in range(8)]
        first = make(shard)
        it = iter(first)
        for _ in range(3):
            next(it)
        resumed = make(shard)
        resumed.load_state_dict(first.state_dict())
        it2 = iter(resumed)
        for want in ref[3:]:
            got = next(it2)
            for k in want:
                np.testing.assert_array_equal(got[k], want[k])
