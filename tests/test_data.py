"""Data subsystem tests: index, decode, samplers, threaded loader."""

import os

import numpy as np
import pytest

from video_filler_tpu.config import Opt
from video_filler_tpu.data import synthetic
from video_filler_tpu.data.decode import (
    decode_image,
    short_side_resize,
)
from video_filler_tpu.data.index import FolderIndex, PairedIndex, VideoCorpus
from video_filler_tpu.data.pipeline import (
    DataLoader,
    center_sampler,
    load_mask,
    logo_sampler,
    make_sampler,
    video_sampler,
    wholeim_sampler,
)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("imgs"))
    return synthetic.make_image_folder(root, n=6)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vids"))
    synthetic.make_video_corpus(root, n_videos=2, frames=10)
    synthetic.make_mask_png(os.path.join(root, "mask.png"))
    return root


def test_folder_index_and_sampling(image_root):
    idx = FolderIndex(image_root, use_cache=False)
    assert idx.size() == 6
    rs = np.random.RandomState(0)
    paths = idx.sample(rs, 4)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    seq = idx.get(0, 3)
    assert len(seq) == 3


def test_folder_index_split(image_root):
    idx = FolderIndex(image_root, split=50, use_cache=False)
    assert idx.size("train") == 3 and idx.size("test") == 3
    assert not (set(idx.train_files["images"]) & set(idx.test_files["images"]))


def test_decode_and_short_side_resize(image_root):
    idx = FolderIndex(image_root, use_cache=False)
    p = idx.get(0, 1)[0]
    img = decode_image(p)
    assert img.dtype == np.uint8 and img.shape == (160, 200, 3)
    r = short_side_resize(img, 120)
    assert min(r.shape[:2]) == 120
    assert abs(r.shape[1] / r.shape[0] - 200 / 160) < 0.02  # aspect preserved
    assert short_side_resize(img, 0).shape == img.shape
    rnd = short_side_resize(img, -1, np.random.RandomState(0))
    assert 0.45 <= rnd.shape[0] / 160 <= 1.55


def test_center_sampler(image_root):
    opt = Opt(batchSize=3, loadSize=140, fineSize=128)
    idx = FolderIndex(image_root, use_cache=False)
    batch = center_sampler(opt, idx)(np.random.RandomState(0))
    assert batch["raw"].shape == (3, 128, 128, 3)
    assert batch["raw"].dtype == np.uint8


def test_video_corpus_discovery_and_clip(video_root):
    corpus = VideoCorpus(video_root)
    assert len(corpus.suffixes) == 2
    assert corpus.counts == [10, 10]
    rs = np.random.RandomState(0)
    clip = corpus.sample_clip(rs, 4)
    assert len(clip) == 4 and all(os.path.exists(p) for p in clip)
    # consecutive frames of the same video/variant
    names = [os.path.basename(p) for p in clip]
    nums = [int(n.split("_")[0]) for n in names]
    assert nums == list(range(nums[0], nums[0] + 4))
    assert len({n.split("_")[1] for n in names}) == 1


def test_video_sampler(video_root):
    opt = Opt(batchSize=2, loadSize=150, fineSize=128, predLen=3)
    corpus = VideoCorpus(video_root)
    mask = load_mask(os.path.join(video_root, "mask.png"))
    batch = video_sampler(opt, corpus, mask)(np.random.RandomState(1))
    assert batch["raw"].shape == (2, 128, 128, 9)
    assert batch["mask"].shape == (2, 128, 128, 1)
    assert set(np.unique(batch["mask"])) <= {0, 1}


def test_logo_sampler(tmp_path):
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path), n=4)
    opt = Opt(batchSize=2, loadSize=140, fineSize=128)
    paired = PairedIndex(masked_root, gt_root)
    batch = logo_sampler(opt, paired)(np.random.RandomState(0))
    assert batch["raw_masked"].shape == (2, 128, 128, 3)
    assert batch["raw_gt"].shape == (2, 128, 128, 3)
    # pairs got the same crop: non-masked pixels must match
    diff = batch["raw_masked"].astype(int) - batch["raw_gt"].astype(int)
    assert (np.abs(diff) > 0).mean() < 0.5


def test_paired_index_split_disjoint(tmp_path):
    """PairedIndex split: held-out tail pairs never appear in train draws
    and vice versa (the upgrade over dataset_logo.lua's split-blind
    getTwoImages); split=100 reproduces the reference's behavior."""
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path), n=10)
    paired = PairedIndex(masked_root, gt_root, split=80)
    assert paired.size("train") == 8 and paired.size("test") == 2
    rs = np.random.RandomState(0)
    train_draws = {p for p, _ in paired.sample(rs, 200, split="train")}
    test_draws = {p for p, _ in paired.sample(rs, 200, split="test")}
    assert not train_draws & test_draws
    assert len(train_draws | test_draws) == 10  # both portions covered
    # pairing stays aligned across the split boundary
    for pm, pg in paired.sample(rs, 50, split="test"):
        assert os.path.basename(pm) == os.path.basename(pg)
    # split=100: test portion is empty and draws from it fail loudly
    full = PairedIndex(masked_root, gt_root)
    assert full.size("test") == 0
    with pytest.raises(ValueError, match="empty"):
        full.sample(rs, 1, split="test")


def test_make_sampler_logo_split(tmp_path):
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path), n=10)
    opt = Opt(batchSize=2, loadSize=140, fineSize=128, split=80,
              DATA_ROOT=masked_root, DATA_ROOT_GT=gt_root)
    s, size = make_sampler(opt, "logo", split="test")
    assert size == 2
    assert s(np.random.RandomState(0))["raw_masked"].shape == (2, 128, 128, 3)
    # held-out eval needs a reserved tail: split=100 must refuse
    opt_full = Opt(batchSize=2, loadSize=140, DATA_ROOT=masked_root,
                   DATA_ROOT_GT=gt_root)
    with pytest.raises(ValueError, match="split < 100"):
        make_sampler(opt_full, "logo", split="test")


def test_wholeim_sampler(video_root):
    opt = Opt(batchSize=2, loadSize=360, fineSize=128,
              maskName=os.path.join(video_root, "mask.png"))
    corpus = VideoCorpus(video_root)
    mask = load_mask(opt.maskName)
    batch = wholeim_sampler(opt, corpus, mask)(np.random.RandomState(2))
    assert batch["raw_masked"].shape == (2, 128, 128, 27)
    assert batch["raw_real"].shape == (2, 128, 128, 12)
    assert batch["mask"].shape == (2, 128, 128, 12)


def test_make_sampler_dispatch(image_root, video_root):
    opt = Opt(batchSize=2, loadSize=140, DATA_ROOT=image_root)
    s, size = make_sampler(opt, "center")
    assert size == 6
    optv = Opt(batchSize=1, loadSize=150, predLen=2, DATA_ROOT=video_root,
               maskName=os.path.join(video_root, "mask.png"))
    s, size = make_sampler(optv, "video")
    assert size == 20
    assert s(np.random.RandomState(0))["raw"].shape == (1, 128, 128, 6)


def test_dataloader_threads_and_sync(image_root):
    opt = Opt(batchSize=2, loadSize=140)
    idx = FolderIndex(image_root, use_cache=False)
    sampler = center_sampler(opt, idx)
    with DataLoader(sampler, n_threads=2, seed=7) as dl:
        shapes = {dl.get_batch()["raw"].shape for _ in range(5)}
    assert shapes == {(2, 128, 128, 3)}
    sync = DataLoader(sampler, n_threads=0, seed=7)
    assert sync.get_batch()["raw"].shape == (2, 128, 128, 3)


def test_index_cache_roundtrip(image_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    idx1 = FolderIndex(image_root, use_cache=True)
    # cache is co-located with the data, NOT CWD-relative (the reference's
    # cache/ convention littered whatever directory the CLI ran from)
    assert not os.path.exists("cache")
    assert os.path.isdir(os.path.join(image_root, ".index_cache"))
    idx2 = FolderIndex(image_root, use_cache=True)  # from cache
    assert idx2.class_files == idx1.class_files
    # the hidden cache dir must not register as a class or invalidate the
    # signature: a third construction still round-trips identically
    idx3 = FolderIndex(image_root, use_cache=True)
    assert idx3.classes == idx1.classes


def test_index_cache_dir_override(tmp_path):
    root = synthetic.make_image_folder(str(tmp_path / "imgs"), n=3)
    cache_dir = str(tmp_path / "idxcache")
    FolderIndex(root, use_cache=True, cache_dir=cache_dir)
    assert os.listdir(cache_dir)
    assert not os.path.isdir(os.path.join(root, ".index_cache"))


def test_index_cache_readonly_root(tmp_path, monkeypatch):
    """An unwritable dataset root degrades to scan-only (no cache write) —
    the cache is an optimization, not a requirement.  Simulated via a
    failing makedirs (chmod can't block root, which pytest runs as here)."""
    root = synthetic.make_image_folder(str(tmp_path / "ro_imgs"), n=3)
    real_makedirs = os.makedirs

    def deny(path, *a, **kw):
        if ".index_cache" in str(path):
            raise PermissionError(13, "read-only corpus", str(path))
        return real_makedirs(path, *a, **kw)

    monkeypatch.setattr(os, "makedirs", deny)
    idx = FolderIndex(root, use_cache=True)
    assert idx.size() == 3
    assert not os.path.isdir(os.path.join(root, ".index_cache"))


def test_native_loader_parity(image_root):
    """Native C++ decode path vs Python path: same shapes, close pixels."""
    from video_filler_tpu.data import native

    if not native.available():
        pytest.skip("native lib unavailable")
    idx = FolderIndex(image_root, use_cache=False)
    paths = idx.get(0, 3)
    h, w = native.image_size(paths[0])
    assert (h, w) == (160, 200)
    seeds = np.arange(1, 4, dtype=np.uint64)
    batch, offs, fails = native.load_clips([[p] for p in paths], 140, 128,
                                           seeds)
    assert fails == 0 and batch.shape == (3, 128, 128, 3)
    assert (offs[:, 2] == 140).all() and (offs[:, 3] == 175).all()
    for i, p in enumerate(paths):
        ref = short_side_resize(decode_image(p), 140)
        y, x = offs[i, 0], offs[i, 1]
        sub = ref[y:y + 128, x:x + 128].astype(int)
        assert np.abs(sub - batch[i].astype(int)).mean() < 2.0


def test_native_video_sampler_mask_alignment(video_root):
    """Native video path: mask crop must use the same offsets as the frames."""
    from video_filler_tpu.data import native

    if not native.available():
        pytest.skip("native lib unavailable")
    opt = Opt(batchSize=4, loadSize=150, fineSize=128, predLen=2)
    corpus = VideoCorpus(video_root)
    mask = load_mask(os.path.join(video_root, "mask.png"))
    batch = video_sampler(opt, corpus, mask)(np.random.RandomState(3))
    assert batch["raw"].shape == (4, 128, 128, 6)
    assert batch["mask"].shape == (4, 128, 128, 1)
    # deterministic given the RandomState: same seed → same batch
    batch2 = video_sampler(opt, corpus, mask)(np.random.RandomState(3))
    np.testing.assert_array_equal(batch["raw"], batch2["raw"])
    np.testing.assert_array_equal(batch["mask"], batch2["mask"])


def test_native_frames_loader_parity(image_root):
    """vf_load_frames (the wholeim/logo decode path): full frames decode +
    short-side-resize into padded slots matching the Python decoder."""
    from video_filler_tpu.data import native

    if not native.available():
        pytest.skip("native lib unavailable")
    idx = FolderIndex(image_root, use_cache=False)
    paths = idx.get(0, 3)
    buf, hw, fails = native.load_frames(paths, 140, 3 * 140, 3 * 140)
    assert fails == 0
    for i, p in enumerate(paths):
        h, w = hw[i]
        assert (h, w) == (140, 175)
        ref = short_side_resize(decode_image(p), 140).astype(int)
        assert np.abs(ref - buf[i, :h, :w].astype(int)).mean() < 2.0
    # a frame exceeding the slot reports failure, not a silent truncation
    buf2, hw2, fails2 = native.load_frames(paths[:1], 140, 100, 100)
    assert fails2 == 1 and tuple(hw2[0]) == (0, 0)


def test_native_wholeim_and_logo_samplers_engage(video_root, tmp_path,
                                                 monkeypatch):
    """The wholeim/logo samplers route their decode through the native pool
    when available (the heaviest per-sample host work of any regime) and
    still produce valid batches."""
    from video_filler_tpu.data import native
    from video_filler_tpu.data import pipeline as pl

    if not native.available():
        pytest.skip("native lib unavailable")
    calls = []
    real_lf = native.load_frames
    monkeypatch.setattr(pl.native, "load_frames",
                        lambda *a, **k: calls.append(1) or real_lf(*a, **k))

    opt = Opt(batchSize=2, loadSize=360, fineSize=128,
              maskName=os.path.join(video_root, "mask.png"))
    corpus = VideoCorpus(video_root)
    mask = load_mask(opt.maskName)
    batch = wholeim_sampler(opt, corpus, mask)(np.random.RandomState(2))
    assert batch["raw_masked"].shape == (2, 128, 128, 27)
    assert calls, "wholeim sampler did not use the native decode pool"

    calls.clear()
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path), n=4)
    optl = Opt(batchSize=2, loadSize=140, fineSize=128)
    paired = PairedIndex(masked_root, gt_root)
    lb = logo_sampler(optl, paired)(np.random.RandomState(0))
    assert lb["raw_masked"].shape == (2, 128, 128, 3)
    assert calls, "logo sampler did not use the native decode pool"
    # pairs still share the crop through the native path
    diff = lb["raw_masked"].astype(int) - lb["raw_gt"].astype(int)
    assert (np.abs(diff) > 0).mean() < 0.5


def test_short_side_resize_rounds_half_up(tmp_path):
    """The Python size rule matches native short_side_dims (half-up): a
    *.5 target rounds UP in both decoders, so a Python-fallback frame lands
    on the same size as its natively-decoded neighbors.  281x280 @ 140:
    140 * 281/280 = 140.5 -> 141 (banker's round() gave 140)."""
    from video_filler_tpu.data import native

    img = np.zeros((281, 280, 3), np.uint8)
    assert short_side_resize(img, 140).shape == (141, 140, 3)
    p = str(tmp_path / "halfup.png")
    from PIL import Image
    Image.fromarray(img).save(p)
    if native.available():
        _, hw, fails = native.load_frames([p], 140, 300, 300)
        assert fails == 0 and tuple(hw[0]) == (141, 140)


def test_logo_pair_survives_partial_native_fallback(tmp_path, monkeypatch):
    """If ONE image of a logo pair is rejected by the native decoder, the
    sampler re-decodes BOTH in Python — the pair's size-equality check and
    shared crop must always compare like with like."""
    from video_filler_tpu.data import native
    from video_filler_tpu.data import pipeline as pl

    if not native.available():
        pytest.skip("native lib unavailable")
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path), n=4)
    real_lf = native.load_frames

    def one_of_pair_fails(paths, *a, **k):
        buf, hw, fails = real_lf(paths, *a, **k)
        hw[1] = 0  # simulate: the gt of pair 0 failed native decode
        return buf, hw, fails + 1

    monkeypatch.setattr(pl.native, "load_frames", one_of_pair_fails)
    opt = Opt(batchSize=2, loadSize=140, fineSize=128)
    batch = logo_sampler(opt, PairedIndex(masked_root, gt_root))(
        np.random.RandomState(0))
    assert batch["raw_masked"].shape == (2, 128, 128, 3)
    assert batch["raw_gt"].shape == (2, 128, 128, 3)


def test_corrupt_wholeim_corpus_fails_loudly(tmp_path):
    """wholeim native path keeps the video path's failure semantics: a
    corrupt frame falls back to Python decode, which raises naming the
    file — never a silent zero-frame."""
    from video_filler_tpu.data.synthetic import make_mask_png, make_video_corpus

    root = tmp_path / "c"
    make_video_corpus(str(root), n_videos=1, frames=4, h=180, w=240)
    make_mask_png(str(root / "mask.png"), h=180, w=240)
    for variant in ("gt", "gt1"):
        if not (root / variant).is_dir():
            continue
        for p in sorted(os.listdir(root / variant)):
            (root / variant / p).write_bytes(b"garbage")

    opt = Opt(batchSize=2, loadSize=150, fineSize=128,
              maskName=str(root / "mask.png"))
    corpus = VideoCorpus(str(root))
    mask = load_mask(opt.maskName)
    with pytest.raises(OSError, match="decode"):
        wholeim_sampler(opt, corpus, mask)(np.random.RandomState(0))


def test_video_corpus_per_video_start_offsets(tmp_path):
    """Videos whose frame numbering starts at different values must sample
    existing paths (a single global start would point video B at frames
    that only exist for video A)."""
    from video_filler_tpu.data.synthetic import _texture
    from video_filler_tpu.utils.io import save_png

    d = tmp_path / "gt"
    d.mkdir()
    rs = np.random.RandomState(0)
    img = _texture(rs, 40, 40)
    for i in range(1, 7):                  # video A: frames 1..6
        save_png(str(d / f"{i:07d}_a.png"), img)
    for i in range(100, 106):              # video B: frames 100..105
        save_png(str(d / f"{i:07d}_b.png"), img)

    corpus = VideoCorpus(str(tmp_path), variants=(("gt", 1.0),))
    assert corpus.starts == [1, 100] and corpus.counts == [6, 6]
    for seed in range(20):
        clip = corpus.sample_clip(np.random.RandomState(seed), 3)
        assert all(os.path.exists(p) for p in clip), clip


def test_video_sampler_upscales_small_frames(tmp_path):
    """loadSize=0 with frames smaller than fineSize must upscale (matching
    the image donkey) instead of crashing — on BOTH decode paths: the native
    loader rejects undersized clips and the sampler falls back to the Python
    path per clip, so native availability never changes which configs work."""
    from video_filler_tpu.data.synthetic import make_video_corpus

    make_video_corpus(str(tmp_path / "c"), n_videos=1, frames=6, h=50, w=60)
    opt = Opt(batchSize=2, loadSize=0, fineSize=128, predLen=2, nThreads=0)
    corpus = VideoCorpus(str(tmp_path / "c"))
    batch = video_sampler(opt, corpus, None)(np.random.RandomState(0))
    assert batch["raw"].shape == (2, 128, 128, 6)
    assert batch["raw"].any()  # fallback filled real pixels, not zeros


def test_corrupt_corpus_fails_loudly(tmp_path):
    """A genuinely corrupt frame must stop the run with an error naming the
    file (native path falls back per clip to Python decode, which raises) —
    never a hang, never a silent zero-clip in the batch."""
    import pytest

    from video_filler_tpu.data.pipeline import load_mask
    from video_filler_tpu.data.synthetic import make_mask_png, make_video_corpus

    root = tmp_path / "c"
    make_video_corpus(str(root), n_videos=1, frames=4, h=180, w=240)
    make_mask_png(str(root / "mask.png"), h=180, w=240)
    for variant in ("gt", "gt1"):  # BOTH variant dirs, else a lucky gt1
        if not (root / variant).is_dir():  # draw could dodge the corruption
            continue
        for p in sorted(os.listdir(root / variant)):
            (root / variant / p).write_bytes(b"garbage")

    opt = Opt(DATA_ROOT=str(root), loadSize=150, predLen=2, batchSize=2,
              nThreads=0)
    corpus = VideoCorpus(str(root))
    mask = load_mask(str(root / "mask.png"))
    with pytest.raises(OSError, match="decode"):
        video_sampler(opt, corpus, mask)(np.random.RandomState(0))


def test_eval_split_wiring(image_root):
    """make_sampler split= draws from the held-out portion: sizes reflect
    the split and an empty test split errors clearly (the logo regime's
    split wiring is covered by test_make_sampler_logo_split)."""
    opt = Opt(batchSize=2, loadSize=140, DATA_ROOT=image_root, split=50)
    s_tr, n_tr = make_sampler(opt, "center", split="train")
    s_te, n_te = make_sampler(opt, "center", split="test")
    assert n_tr == 3 and n_te == 3
    assert s_te(np.random.RandomState(0))["raw"].shape == (2, 128, 128, 3)

    opt100 = Opt(batchSize=2, loadSize=140, DATA_ROOT=image_root)
    s_bad, n_bad = make_sampler(opt100, "center", split="test")
    assert n_bad == 0
    with pytest.raises(ValueError, match="split is empty"):
        s_bad(np.random.RandomState(0))


def test_video_corpus_split_disjoint(video_root):
    """VideoCorpus split: train clips come only from each video's head
    range, test clips only from the held-out tail, and the two never share
    a frame (the honest-metrics requirement — adjacent-frame leakage across
    the boundary is bounded to the single boundary clip by construction)."""
    corpus = VideoCorpus(video_root, split=60)
    # 10 frames/video -> 6 train, 4 test
    assert corpus.train_counts == [6, 6]
    assert corpus.size("train") == 12 and corpus.size("test") == 8

    def frames(split, length, n=200):
        rs = np.random.RandomState(1)
        out = set()
        for _ in range(n):
            for p in corpus.sample_clip(rs, length, split):
                base = os.path.basename(p)
                out.add((base.split("_")[1], int(base.split("_")[0])))
        return out

    tr, te = frames("train", 3), frames("test", 3)
    assert tr and te and not (tr & te)
    assert all(num <= 6 for _, num in tr)       # head range only
    assert all(num >= 7 for _, num in te)       # tail range only
    # every sampled path exists on disk
    rs = np.random.RandomState(2)
    clip = corpus.sample_clip(rs, 4, "test")
    assert all(os.path.exists(p) for p in clip)


def test_video_corpus_split_too_short_errors(video_root):
    """A test portion smaller than the clip length must error clearly, not
    build paths to frames outside the corpus."""
    corpus = VideoCorpus(video_root, split=90)  # 1 test frame per video
    with pytest.raises(ValueError, match="portion"):
        corpus.sample_clip(np.random.RandomState(0), 3, "test")
    # length-1 clips still fit
    clip = corpus.sample_clip(np.random.RandomState(0), 1, "test")
    assert os.path.exists(clip[0])


def test_make_sampler_video_eval_split(video_root):
    """evalSplit=test works for the video regimes given split<100, and the
    held-out sampler emits valid batches disjoint from the train range."""
    opt = Opt(batchSize=2, loadSize=150, predLen=2, DATA_ROOT=video_root,
              maskName=os.path.join(video_root, "mask.png"), split=60)
    s_te, n_te = make_sampler(opt, "video", split="test")
    assert n_te == 8
    batch = s_te(np.random.RandomState(0))
    assert batch["raw"].shape == (2, 128, 128, 6)

    opt100 = opt.replace(split=100)
    with pytest.raises(ValueError, match="split < 100"):
        make_sampler(opt100, "video", split="test")


def test_threaded_loader_propagates_worker_errors(tmp_path):
    """A corrupt corpus under the THREADED loader must raise on get_batch
    (the worker delivers its exception through the queue) — a silently-dead
    worker pool would make get_batch hang forever."""
    from video_filler_tpu.data.pipeline import load_mask
    from video_filler_tpu.data.synthetic import make_mask_png, make_video_corpus

    root = tmp_path / "c"
    make_video_corpus(str(root), n_videos=1, frames=4, h=180, w=240)
    make_mask_png(str(root / "mask.png"), h=180, w=240)
    for variant in ("gt", "gt1"):
        if (root / variant).is_dir():
            for p in sorted(os.listdir(root / variant)):
                (root / variant / p).write_bytes(b"garbage")

    opt = Opt(DATA_ROOT=str(root), loadSize=150, predLen=2, batchSize=2,
              nThreads=2)
    corpus = VideoCorpus(str(root))
    mask = load_mask(str(root / "mask.png"))
    with DataLoader(video_sampler(opt, corpus, mask), 2, seed=3) as dl:
        with pytest.raises(OSError, match="decode"):
            for _ in range(4):  # the error surfaces within a few pops
                dl.get_batch()


def test_logo_sampler_upscales_small_frames(tmp_path):
    """loadSize < fineSize must upscale (same guard as center/video) instead
    of crashing with a broadcast error inside a worker."""
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path), n=4,
                                                         h=90, w=100)
    opt = Opt(batchSize=2, loadSize=64, fineSize=128)
    batch = logo_sampler(opt, PairedIndex(masked_root, gt_root))(
        np.random.RandomState(0))
    assert batch["raw_masked"].shape == (2, 128, 128, 3)
    assert batch["raw_gt"].shape == (2, 128, 128, 3)


def test_wholeim_sampler_upscales_small_frames(video_root):
    """Undersized frames previously made steph/stepw negative (silent
    mis-slice); the sampler must upscale first."""
    opt = Opt(batchSize=1, loadSize=100, fineSize=128,
              maskName=os.path.join(video_root, "mask.png"))
    corpus = VideoCorpus(video_root)
    mask = load_mask(opt.maskName)
    batch = wholeim_sampler(opt, corpus, mask)(np.random.RandomState(2))
    assert batch["raw_masked"].shape == (1, 128, 128, 27)
    assert batch["raw_real"].shape == (1, 128, 128, 12)


def test_index_cache_detects_subdir_changes(tmp_path, monkeypatch):
    """Adding an image INSIDE a class subdir must invalidate the JSON cache:
    only direct children touch the root's mtime, so the validity check keys
    on the whole directory tree's mtimes."""
    import shutil

    root = synthetic.make_image_folder(str(tmp_path / "data"), n=4)
    monkeypatch.chdir(tmp_path)
    idx1 = FolderIndex(root, use_cache=True)
    n1 = idx1.size()
    src = next(iter(idx1.class_files.values()))[0]
    shutil.copy(src, os.path.join(os.path.dirname(src), "zz_new.png"))
    idx2 = FolderIndex(root, use_cache=True)
    assert idx2.size() == n1 + 1


def test_native_survives_decompression_bomb(tmp_path):
    """A malicious/corrupt image whose header claims a huge size must be
    counted as a per-item failure, not std::terminate the host process
    (native worker threads contain exceptions)."""
    import struct
    import zlib

    from video_filler_tpu.data import native

    if not native.available():
        pytest.skip("native .so unavailable")

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    # PNG signature + IHDR claiming 40000x40000 RGB, then no image data:
    # libpng reads the header fine; the multi-GB buffer alloc (or the
    # missing IDAT) must fail the item cleanly either way.
    ihdr = struct.pack(">IIBBBBB", 40000, 40000, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IEND", b""))
    p = tmp_path / "bomb.png"
    p.write_bytes(bomb)

    buf, hw, fails = native.load_frames([str(p)], 240, 480, 480)
    assert fails == 1 and tuple(hw[0]) == (0, 0)
    out, offs, fails = native.load_clips([[str(p)]], 240, 128,
                                         np.ones(1, np.uint64))
    assert fails == 1 and offs[0, 2] == 0
