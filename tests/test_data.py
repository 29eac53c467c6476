"""SFT data pipeline tests: chat preprocessing, tiling dataset, packing,
weighted CE — end-to-end through the tiny VLM train step."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlaser_tpu.core.config import tiny_vlm
from vlaser_tpu.data.chat_dataset import (
    IGNORE_TOKEN_ID,
    ChatDatasetConfig,
    ConversationDataset,
    PackedDataset,
    len2weight,
    pad_collate,
    preprocess_internvl2_5,
)
from vlaser_tpu.image.tiling import candidate_ratios, dynamic_preprocess
from vlaser_tpu.models.vlm import InternVLChatModel
from vlaser_tpu.train.losses import make_sft_loss, weighted_ce_loss


class CharTok:
    """Char-level tokenizer; special tokens get single high ids."""

    pad_token_id = 0
    SPECIALS = {"<IMG_CONTEXT>": 500, "<img>": 498, "</img>": 499}

    def __call__(self, text, add_special_tokens=False, **kw):
        ids = []
        i = 0
        while i < len(text):
            matched = False
            for tok, tid in self.SPECIALS.items():
                if text.startswith(tok, i):
                    ids.append(tid)
                    i += len(tok)
                    matched = True
                    break
            if not matched:
                ids.append(ord(text[i]) % 490)
                i += 1
        return {"input_ids": ids}


def test_preprocess_masking():
    tok = CharTok()
    convs = [
        {"from": "human", "value": "<image>\nwhat?"},
        {"from": "gpt", "value": "a cat"},
    ]
    ids, labels = preprocess_internvl2_5(convs, tok, [3])
    assert (ids == 500).sum() == 3  # 3 IMG_CONTEXT tokens
    # assistant content supervised, everything else ignored
    sup = labels != IGNORE_TOKEN_ID
    assert sup.sum() > 0
    text = "a cat<|im_end|>"
    # the supervised ids decode to assistant content + <|im_end|> minus last \n
    sup_ids = ids[sup]
    want = tok(text)["input_ids"]
    np.testing.assert_array_equal(sup_ids, want)


def test_dynamic_tiling_ratios():
    from PIL import Image

    ratios = candidate_ratios(1, 12)
    assert (1, 1) in ratios and (4, 3) in ratios and (12, 1) in ratios
    img = Image.new("RGB", (800, 400), (120, 50, 30))
    tiles = dynamic_preprocess(img, 1, 12, image_size=448, use_thumbnail=True)
    # 2:1 aspect -> 2x1 grid + thumbnail
    assert len(tiles) == 3
    assert all(t.size == (448, 448) for t in tiles)
    sq = Image.new("RGB", (300, 300))
    assert len(dynamic_preprocess(sq, 1, 12, 448, use_thumbnail=True)) == 1


@pytest.fixture(scope="module")
def jsonl_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("data")
    img_path = root / "img.png"
    Image.new("RGB", (56, 28), (200, 30, 40)).save(img_path)
    items = [
        {
            "image": "img.png",
            "conversations": [
                {"from": "human", "value": "<image>\ndescribe"},
                {"from": "gpt", "value": "red"},
            ],
        },
        {
            "conversations": [
                {"from": "human", "value": "hi"},
                {"from": "gpt", "value": "hello!"},
            ]
        },
    ]
    p = root / "train.jsonl"
    with open(p, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    cfg = ChatDatasetConfig(
        jsonl_path=str(p), image_root=str(root), num_image_token=1,
        image_size=28, max_dynamic_patch=4, loss_reduction="sample",
    )
    return ConversationDataset(cfg, CharTok())


def test_dataset_items(jsonl_dataset):
    s0 = jsonl_dataset[0]
    assert s0["pixel_values"].shape[1:] == (28, 28, 3)
    assert s0["image_flags"].all()
    n_img_ctx = (s0["input_ids"] == 500).sum()
    assert n_img_ctx == len(s0["pixel_values"])  # 1 token per tile (tiny cfg)
    s1 = jsonl_dataset[1]
    assert s1["image_flags"].sum() == 0  # blank padding tile
    n_t = (s1["labels"] != IGNORE_TOKEN_ID).sum()
    w = s1["loss_weight"][s1["labels"] != IGNORE_TOKEN_ID]
    np.testing.assert_allclose(w, len2weight(n_t, "sample"))


def test_collate_and_sft_step(jsonl_dataset):
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    batch = pad_collate([jsonl_dataset[0], jsonl_dataset[1]], pad_token_id=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["pixel_values"],
        batch["image_flags"],
    )
    loss_fn = make_sft_loss(model)
    loss = loss_fn(params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0)))(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(grads))


def test_packed_matches_padded_loss(jsonl_dataset):
    """Packing with segment ids must give the same loss as padded batching."""
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32, attn_impl="reference")
    packed = PackedDataset(jsonl_dataset, max_packed_tokens=512, pad_token_id=0,
                           shuffle_seed=None)
    pb = next(iter(packed))
    assert pb["seg_ids"].max() == 2  # both samples in one pack
    pb = {k: jnp.asarray(v) for k, v in pb.items()}
    params = model.init(
        jax.random.PRNGKey(0), pb["input_ids"], pb["pixel_values"], pb["image_flags"]
    )
    loss_fn = make_sft_loss(model)
    packed_loss = float(loss_fn(params, pb, jax.random.PRNGKey(0)))

    batch = pad_collate([jsonl_dataset[0], jsonl_dataset[1]], pad_token_id=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    padded_loss = float(loss_fn(params, batch, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(packed_loss, padded_loss, rtol=1e-5)

    # resume state
    packed2 = PackedDataset(jsonl_dataset, max_packed_tokens=512, shuffle_seed=None)
    packed2.load_state_dict(packed.state_dict())
    assert packed2.cursor == packed.cursor


def test_video_item(tmp_path):
    from PIL import Image

    root = tmp_path
    vdir = root / "vid1"
    vdir.mkdir()
    for i in range(5):
        Image.new("RGB", (28, 28), (i * 40, 10, 10)).save(vdir / f"f{i:03d}.jpg")
    item = {
        "video": "vid1",
        "conversations": [
            {"from": "human", "value": "<video>\nwhat happens?"},
            {"from": "gpt", "value": "it moves"},
        ],
    }
    p = root / "v.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps(item) + "\n")
    cfg = ChatDatasetConfig(
        jsonl_path=str(p), image_root=str(root), num_image_token=1,
        image_size=28, max_dynamic_patch=4,
    )
    ds = ConversationDataset(cfg, CharTok())
    s = ds[0]
    assert len(s["pixel_values"]) == 5  # one tile per sampled frame
    assert (s["input_ids"] == 500).sum() == 5
    assert s["image_flags"].sum() == 5
