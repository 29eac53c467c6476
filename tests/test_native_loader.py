"""Native threaded image loader (native/dataloader.cpp via ctypes):
JPEG decode + Lanczos4 resize + ImageNet normalize outside the GIL —
the torch-DataLoader-worker equivalent of the reference's data pipeline."""

import os
import tempfile

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vlaser_tpu.data import native_loader as nl  # noqa: E402
from vlaser_tpu.image import native as img_native  # noqa: E402


@pytest.fixture(scope="module")
def jpegs():
    if not nl.available():
        pytest.skip("native dataloader unavailable (no g++/libjpeg)")
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    paths, raws = [], []
    for i in range(6):
        img = rng.integers(0, 255, (97 + i, 123, 3), np.uint8)
        p = os.path.join(tmp, f"im{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        raws.append(np.asarray(Image.open(p).convert("RGB"), np.uint8))
    return tmp, paths, raws


def test_batch_matches_python_chain(jpegs):
    """C++ decode+resize == PIL decode + native Lanczos4 resize (same
    resampler; decoders are both libjpeg baseline)."""
    _, paths, raws = jpegs
    got = nl.load_image_batch(paths, (64, 80), normalize=True)
    assert got.shape == (6, 64, 80, 3)
    for i, raw in enumerate(raws):
        want = img_native.resize_batch(
            raw[None], (64, 80), mode="lanczos", normalize=True
        )[0]
        # decoder IDCT differences bound: ±2/255 raw -> ~0.04 normalized
        assert float(np.abs(got[i] - want).max()) < 0.05, i


def test_async_pipeline_ids_and_backpressure(jpegs):
    """More jobs than pipeline capacity must not deadlock (Python-side
    pending buffer flushes as results drain); every id completes."""
    _, paths, _ = jpegs
    loader = nl.NativeImageLoader(num_threads=2, capacity=2)
    try:
        for i in range(12):
            loader.submit(i, paths[i % len(paths)], (32, 32))
        got = {}
        for _ in range(12):
            out = loader.get(timeout_ms=30_000)
            assert out is not None
            jid, arr = out
            got[jid] = arr
        assert sorted(got) == list(range(12))
        assert all(a.shape == (32, 32, 3) for a in got.values())
    finally:
        loader.close()


def test_non_jpeg_falls_back_to_pil(jpegs):
    tmp, _, _ = jpegs
    rng = np.random.default_rng(1)
    png = os.path.join(tmp, "x.png")
    Image.fromarray(rng.integers(0, 255, (50, 40, 3), np.uint8)).save(png)
    out = nl.load_image_batch([png], (32, 32))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_dynamic_tiling_native_matches_pil_chain(jpegs):
    """Native probe->grid->resize->crop == PIL dynamic_preprocess chain
    (same grid, same bicubic a=-0.5), within decoder tolerance."""
    _, paths, raws = jpegs
    from vlaser_tpu.image.tiling import load_image_tiles

    for i, p in enumerate(paths[:3]):
        native = nl.load_image_tiles_native(
            p, image_size=32, min_num=1, max_num=6, use_thumbnail=True,
            dynamic=True,
        )
        pil = load_image_tiles(
            Image.open(p).convert("RGB"), 32, 1, 6, use_thumbnail=True,
            dynamic=True,
        )
        assert native is not None
        assert native.shape == pil.shape, (native.shape, pil.shape)
        d = np.abs(native - pil)
        # PIL quantizes to uint8 mid-chain and decoders' IDCTs differ; on
        # worst-case noise images the bound is a few /255 in raw units
        assert float(d.max()) < 0.2 and float(d.mean()) < 0.02, i


def test_dataset_flag_matches_pil_path(jpegs, tmp_path):
    """ChatDatasetConfig(use_native_loader=True) produces the same tiles
    (within decoder tolerance) and identical tokenization as the PIL path."""
    import json

    from vlaser_tpu.data.chat_dataset import (
        ChatDatasetConfig, ConversationDataset,
    )
    from test_data import CharTok

    tmp, paths, _ = jpegs
    jsonl = tmp_path / "d.jsonl"
    rows = [
        {"image": os.path.basename(paths[0]),
         "conversations": [
             {"from": "human", "value": "<image>\nwhat?"},
             {"from": "gpt", "value": "a thing"},
         ]}
    ]
    jsonl.write_text("\n".join(json.dumps(r) for r in rows))
    outs = []
    for flag in (False, True):
        cfg = ChatDatasetConfig(
            jsonl_path=str(jsonl), image_root=tmp, template="internvl2_5",
            num_image_token=4, image_size=32, max_dynamic_patch=4,
            use_native_loader=flag,
        )
        ds = ConversationDataset(cfg, CharTok())
        outs.append(ds[0])
    a, b = outs
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    assert a["pixel_values"].shape == b["pixel_values"].shape
    d = np.abs(a["pixel_values"] - b["pixel_values"])
    assert float(d.max()) < 0.2 and float(d.mean()) < 0.02
