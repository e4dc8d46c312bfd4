"""WebVid dataset: real video decode via cv2, stride sampling, CLIP image,
fault-tolerant retry (reference data.py:65-142 behaviors)."""

import csv
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from i2v_adapter_tpu.data.webvid import WebVidDataset, video_length  # noqa: E402


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    page = root / "page0"
    page.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for vid, n_frames in (("aaa", 40), ("bbb", 12)):
        path = str(page / f"{vid}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 48))
        ok = w.isOpened()
        for i in range(n_frames):
            frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            frame[:, :, 0] = i * 5  # frame index signature
            w.write(frame)
        w.release()
        if not ok:
            pytest.skip("cv2 VideoWriter lacks mp4 support here")
        rows.append({"videoid": vid, "name": f"clip {vid}", "page_dir": "page0"})
    # a broken row to exercise the retry path
    rows.append({"videoid": "missing", "name": "broken", "page_dir": "page0"})
    csv_path = str(root / "train.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["videoid", "name", "page_dir"])
        writer.writeheader()
        writer.writerows(rows)
    return str(root), csv_path


def test_video_length(video_dir):
    root, _ = video_dir
    assert video_length(os.path.join(root, "page0", "aaa.mp4")) == 40


def test_indexed_decode_matches_sequential(video_dir):
    """Seek-based sparse reads return exactly the frames a full sequential
    decode would (VERDICT r1 #6; decord-style indexed reads,
    reference data.py:100-106)."""
    from i2v_adapter_tpu.data import webvid

    root, _ = video_dir
    path = os.path.join(root, "page0", "aaa.mp4")
    # full sequential decode as ground truth
    cap = cv2.VideoCapture(path)
    all_frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        all_frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()

    old_gap = webvid._SEEK_GAP
    webvid._SEEK_GAP = 2  # force the seek path on small gaps
    try:
        for indices in ([0, 5, 10, 35], [20, 25, 30], [3, 3, 9], [39]):
            got = webvid._read_video_frames(path, np.asarray(indices))
            want = np.stack([all_frames[i] for i in indices])
            np.testing.assert_array_equal(got, want)
    finally:
        webvid._SEEK_GAP = old_gap


def test_clip_sampling_shapes(video_dir):
    root, csv_path = video_dir
    ds = WebVidDataset(csv_path, root, sample_size=32, sample_stride=2,
                       sample_n_frames=8, clip_image_size=28, seed=0)
    assert len(ds) == 3
    item = ds[0]
    assert item["pixel_values"].shape == (8, 32, 32, 3)
    assert item["clip_image"].shape == (28, 28, 3)
    assert item["text"] == "clip aaa"
    assert -1.01 <= item["pixel_values"].min() <= item["pixel_values"].max() <= 1.01


def test_short_video_clamps_clip_length(video_dir):
    root, csv_path = video_dir
    ds = WebVidDataset(csv_path, root, sample_size=32, sample_stride=4,
                       sample_n_frames=8, seed=0)
    item = ds[1]  # 12-frame video, clip span (8-1)*4+1=29 > 12 -> clamped
    assert item["pixel_values"].shape == (8, 32, 32, 3)


def test_retry_on_broken_video(video_dir):
    root, csv_path = video_dir
    ds = WebVidDataset(csv_path, root, sample_size=32, sample_n_frames=4, seed=0)
    item = ds[2]  # missing file -> resamples a good index
    assert item["pixel_values"].shape == (4, 32, 32, 3)
    assert item["text"].startswith("clip ")


def test_image_mode(video_dir):
    root, csv_path = video_dir
    ds = WebVidDataset(csv_path, root, sample_size=32, is_image=True, seed=0)
    item = ds[0]
    assert item["pixel_values"].shape == (32, 32, 3)


def test_sharding(video_dir):
    root, csv_path = video_dir
    ds0 = WebVidDataset(csv_path, root, shard=0, num_shards=2)
    ds1 = WebVidDataset(csv_path, root, shard=1, num_shards=2)
    assert len(ds0) + len(ds1) == 3
