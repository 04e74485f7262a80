"""Data pipeline tests: clip-list parsing, train/eval sampling, sliding
windows with edge padding, Vimeo index tables, loader batching, metrics,
and .flo IO."""

import os
import pickle

import numpy as np
import pytest

from superslomo_tpu.config import default_config
from superslomo_tpu.data.augmentations import EvalPad, Normalize, eval_padding_for
from superslomo_tpu.data.pipeline import Loader
from superslomo_tpu.data.readers import (
    AdobeReader,
    Reader,
    VimeoReader,
    build_reader,
    read_clip_list_file,
)
from superslomo_tpu.utils import flo
from superslomo_tpu.utils.metrics import interpolation_error, psnr, ssim


def write_png_clip(dirpath, n, h=64, w=96, seed=0):
    import cv2

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = os.path.join(dirpath, f"frame_{i:05d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


@pytest.fixture
def adobe_cfg(tmp_path):
    cfg = default_config()
    clip_paths = write_png_clip(tmp_path / "clip_00000", 60)
    # length-prefixed train list (adobe format)
    txt = tmp_path / "train_clips.txt"
    with open(txt, "w") as f:
        f.write(f"{len(clip_paths)}\n")
        f.writelines(p + "\n" for p in clip_paths)
    # eval pickle of clip dir names
    pkl = tmp_path / "val_clips.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"clip_00000"}, f)
    cfg.set("DATA", "DATASET", "ADOBE")
    cfg.set("DATA", "WINDOW_LENGTH", 60)
    cfg.set("ADOBE_DATA", "ROOTDIR", str(tmp_path))
    cfg.set("ADOBE_DATA", "TRAINPATHS", str(txt))
    cfg.set("ADOBE_DATA", "VALPATHS", str(txt))
    cfg.set("ADOBE_DATA", "TRAIN_CLIPS", str(pkl))
    cfg.set("ADOBE_DATA", "VAL_CLIPS", str(pkl))
    cfg.set("TRAIN", "CROP_IMH", 32)
    cfg.set("TRAIN", "CROP_IMW", 32)
    cfg.set("TRAIN", "BATCH_SIZE", 2)
    cfg.set("VAL", "BATCH_SIZE", 2)
    cfg.set("DATALOADER", "N_WORKERS", 2)
    return cfg


class TestClipList:
    def test_parse(self, tmp_path):
        f = tmp_path / "list.txt"
        f.write_text("3\n/a/1.png\n/a/2.png\n/a/3.png\n2\n/b/1.png\n/b/2.png\n")
        clips = read_clip_list_file(str(f))
        assert clips == [["/a/1.png", "/a/2.png", "/a/3.png"], ["/b/1.png", "/b/2.png"]]


class TestAdobeTrain:
    def test_item_shapes(self, adobe_cfg):
        r = AdobeReader(adobe_cfg, "TRAIN", eval_mode=False,
                        rng=np.random.default_rng(0))
        inp, tgt, t = r[0]
        assert inp.shape == (2, 32, 32, 3)
        assert tgt.shape == (1, 32, 32, 3)
        assert t.shape == (1,)
        assert 0 < t[0] < 1
        assert inp.dtype == np.float32

    def test_n_frames_4(self, adobe_cfg):
        adobe_cfg.set("TRAIN", "N_FRAMES", 4)
        r = AdobeReader(adobe_cfg, "TRAIN", eval_mode=False,
                        rng=np.random.default_rng(0))
        inp, tgt, t = r[0]
        assert inp.shape == (4, 32, 32, 3)
        assert tgt.shape == (3, 32, 32, 3)
        # shared random t across windows (default_reader.py:167)
        assert np.all(t == t[0])

    def test_middle_sampling(self, adobe_cfg):
        adobe_cfg.set("DATALOADER", "T_SAMPLE", "MIDDLE")
        r = AdobeReader(adobe_cfg, "TRAIN", eval_mode=False,
                        rng=np.random.default_rng(0))
        _, _, t = r[0]
        assert t[0] == 0.5


class TestAdobeEval:
    def test_eval_items(self, adobe_cfg):
        adobe_cfg.set("EVAL", "EVAL_MODE", "TRUE")
        adobe_cfg.set("DATALOADER", "T_SAMPLE", "NIL")
        r = AdobeReader(adobe_cfg, "VAL", eval_mode=True)
        # 60 frames, interp 8, n_frames 2: windows cover frames 0..59
        inp, tgt, n_avail = r[0]
        assert inp.shape == (2, 64 + 16, 96, 3)  # EvalPad (0,0,8,8)
        assert tgt.shape == (7, 64 + 16, 96, 3)
        assert n_avail == 7
        # last window has the remainder: (60-1) % 8 = 3
        _, _, n_last = r[len(r) - 1]
        assert n_last == 3

    def test_window_count(self, adobe_cfg):
        adobe_cfg.set("EVAL", "EVAL_MODE", "TRUE")
        adobe_cfg.set("DATALOADER", "T_SAMPLE", "NIL")
        r = AdobeReader(adobe_cfg, "VAL", eval_mode=True)
        # ceil(59 / 8) = 8 windows
        assert len(r) == 8


class TestSlidingWindows:
    def test_pad_clip_edges_full_last(self, adobe_cfg):
        r = AdobeReader(adobe_cfg, "TRAIN", eval_mode=False)
        idx, n_last = r.pad_clip_edges(list(range(17)))  # last=16, 16%8==0
        assert n_last == 7
        assert idx[0] == 0

    def test_pad_clip_edges_partial(self, adobe_cfg):
        r = AdobeReader(adobe_cfg, "TRAIN", eval_mode=False)
        idx, n_last = r.pad_clip_edges(list(range(20)))  # last=19, 19%8=3
        assert n_last == 3
        # right padding replicates the last valid input frame (16)
        assert idx[-1] == 16


class TestVimeo:
    @pytest.fixture
    def vimeo_cfg(self, tmp_path):
        cfg = default_config()
        seq_dir = tmp_path / "sequences" / "00001" / "0001"
        os.makedirs(seq_dir)
        import cv2

        rng = np.random.default_rng(0)
        for i in range(1, 8):
            cv2.imwrite(str(seq_dir / f"im{i}.png"),
                        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
        lst = tmp_path / "trainlist.txt"
        lst.write_text("00001/0001\n")
        cfg.set("DATA", "DATASET", "VIMEO")
        cfg.set("VIMEO_DATA", "ROOTDIR", str(tmp_path))
        cfg.set("VIMEO_DATA", "TRAINPATHS", str(lst))
        cfg.set("VIMEO_DATA", "VALPATHS", str(lst))
        cfg.set("TRAIN", "CROP_IMH", 32)
        cfg.set("TRAIN", "CROP_IMW", 32)
        return cfg

    def test_train_item(self, vimeo_cfg):
        r = VimeoReader(vimeo_cfg, "TRAIN", eval_mode=False,
                        rng=np.random.default_rng(0))
        inp, tgt, t = r[0]
        assert inp.shape == (2, 32, 32, 3)
        assert tgt.shape == (1, 32, 32, 3)
        assert t[0] == 0.5  # fixed mid-frame

    def test_eval_items_three_per_septuplet(self, vimeo_cfg):
        r = VimeoReader(vimeo_cfg, "VAL", eval_mode=True)
        assert len(r) == 3
        inp, tgt, n = r[0]
        assert inp.shape == (2, 64, 96, 3)  # no EvalPad for vimeo
        assert tgt.shape == (1, 64, 96, 3)
        assert n == 1

    def test_train_n4_index_tables(self, vimeo_cfg):
        vimeo_cfg.set("TRAIN", "N_FRAMES", 4)
        r = VimeoReader(vimeo_cfg, "TRAIN", eval_mode=False,
                        rng=np.random.default_rng(1))
        for _ in range(5):
            inp, tgt, t = r[0]
            assert inp.shape == (4, 32, 32, 3)
            assert tgt.shape == (3, 32, 32, 3)
            assert np.all(t == 0.5)


class TestLoader:
    def test_batching(self, adobe_cfg):
        loader = Loader(
            AdobeReader(adobe_cfg, "TRAIN", eval_mode=False,
                        rng=np.random.default_rng(0)),
            batch_size=1, shuffle=True, drop_last=True, num_threads=2,
        )
        batches = list(loader)
        assert len(batches) == 1
        inp, tgt, t = batches[0]
        assert inp.shape == (1, 2, 32, 32, 3)
        assert t.shape == (1, 1)

    def test_get_dataset_dispatch(self, adobe_cfg):
        loader = build_reader(adobe_cfg, "TRAIN")
        assert isinstance(loader, AdobeReader)

    def test_thread_count_determinism(self):
        """Per-item (seed, epoch, idx) child rngs: identical batches for any
        num_threads, across epochs, across fresh loader instances."""

        class RngReader:
            def __len__(self):
                return 16

            def __getitem__(self, idx, rng=None):
                rng = rng if rng is not None else np.random.default_rng()
                x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
                t = rng.integers(1, 8, size=(1,)).astype(np.float32) / 8.0
                return x + idx, t

        def run(num_threads, epochs=2):
            loader = Loader(RngReader(), batch_size=4, shuffle=True,
                            drop_last=True, num_threads=num_threads, seed=7)
            return [batch for _ in range(epochs) for batch in loader]

        a, b, c = run(1), run(4), run(4)
        for ba, bb, bc in zip(a, b, c):
            for xa, xb, xc in zip(ba, bb, bc):
                np.testing.assert_array_equal(xa, xb)
                np.testing.assert_array_equal(xa, xc)
        # epochs must differ (different shuffle + item rngs)
        assert not np.array_equal(a[0][0], a[len(a) // 2][0])

    def test_real_reader_thread_determinism(self, adobe_cfg):
        def batches():
            r = AdobeReader(adobe_cfg, "TRAIN", eval_mode=False)
            return list(Loader(r, batch_size=1, shuffle=True, drop_last=True,
                               num_threads=4, seed=3))

        for xa, xb in zip(*(b[0] for b in (batches(), batches()))):
            np.testing.assert_array_equal(xa, xb)


class TestAugment:
    def test_eval_padding_for(self):
        assert eval_padding_for(720, 1280) == (0, 0, 8, 8)
        assert eval_padding_for(436, 1024) == (0, 0, 6, 6)
        assert eval_padding_for(1024, 1280) == (0, 0, 0, 0)

    def test_normalize_roundtrip(self):
        n = Normalize((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
        x = np.random.default_rng(0).integers(0, 255, (2, 8, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(n.inverse(n(x)), x, rtol=1e-4, atol=1e-3)

    def test_eval_pad_target_dims(self):
        p = EvalPad(target_dims=(16, 20))
        out = p(np.ones((1, 10, 14, 3), np.float32))
        assert out.shape == (1, 16, 20, 3)
        assert out[0, 0, 0, 0] == 0  # padded region


class TestMetrics:
    def test_psnr_identity(self):
        x = np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
        assert psnr(x, x) == float("inf")

    def test_ssim_identity_and_monotonic(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        assert ssim(x, x) == pytest.approx(1.0, abs=1e-7)
        small = np.clip(x + rng.normal(0, 5, x.shape), 0, 255).astype(np.uint8)
        big = np.clip(x + rng.normal(0, 50, x.shape), 0, 255).astype(np.uint8)
        assert 1 > ssim(x, small) > ssim(x, big)

    def test_ie(self):
        a = np.zeros((4, 4, 3), np.uint8)
        b = np.full((4, 4, 3), 3, np.uint8)
        assert interpolation_error(a, b) == pytest.approx(np.sqrt(27))


class TestFlo:
    def test_roundtrip(self, tmp_path):
        flow = np.random.default_rng(0).standard_normal((8, 10, 2)).astype(np.float32)
        p = str(tmp_path / "x.flo")
        flo.write_flo(flow, p)
        np.testing.assert_array_equal(flo.read_flo(p), flow)

    def test_epe(self):
        gt = np.zeros((4, 4, 2), np.float32)
        pred = np.ones((4, 4, 2), np.float32) * np.array([3.0, 4.0])
        assert flo.flow_epe(gt, pred) == pytest.approx(5.0)
        assert flo.flow_error_percent(gt, pred) == 100.0

    def test_flow_to_image(self):
        flow = np.random.default_rng(0).standard_normal((8, 8, 2)).astype(np.float32)
        img = flo.flow_to_image(flow)
        assert img.shape == (8, 8, 3)
        assert img.dtype == np.uint8
