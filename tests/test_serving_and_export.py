"""Deploy server, RoboTwin QA folder dataset, flax->HF export roundtrip."""

import json
import os

import numpy as np
import pytest


def test_deploy_server_act_roundtrip():
    from vlaser_tpu.serve.deploy_server import (
        PolicyHTTPServer, act_request, decode_value, encode_array,
    )

    calls = {}

    def policy(image, instruction, qpos):
        calls["image"] = image
        calls["instruction"] = instruction
        calls["qpos"] = qpos
        return np.tile(np.arange(14, dtype=np.float32), (8, 1))

    srv = PolicyHTTPServer(policy, host="127.0.0.1", port=0)
    srv.start_background()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        qpos = np.linspace(-1, 1, 14).astype(np.float32)
        action = act_request(url, img, "pick up the bell", qpos)
        assert action.shape == (8, 14)
        np.testing.assert_array_equal(calls["image"], img)
        assert calls["instruction"] == "pick up the bell"
        np.testing.assert_allclose(calls["qpos"], qpos)

        # probe: missing image -> 400 with a clear error
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url + "/act", json.dumps({"instruction": "x"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400

        # health endpoint
        with urllib.request.urlopen(url + "/health", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True
    finally:
        srv.shutdown()

    # encoding roundtrip incl. non-contiguous input
    a = np.arange(24, dtype=np.float32).reshape(4, 6)[:, ::2]
    np.testing.assert_array_equal(decode_value(encode_array(a)), a)


def test_robotwin_qa_folder_dataset(tmp_path):
    from PIL import Image

    from vlaser_tpu.data.robotwin_qa_dataset import (
        RoboTwinEpisodeFolderDataset, RoboTwinQAFolderConfig, parse_triplet,
    )

    root = tmp_path / "images"
    inst = tmp_path / "instructions"
    for task in ("click_bell", "handover_mic"):
        for domain in ("Aloha-AgileX", "SomeOtherDomain"):
            for ep in ("episode0", "episode1"):
                d = root / task / domain / "frames" / ep
                d.mkdir(parents=True)
                for i in range(2):
                    Image.new("RGB", (64, 48), (i * 50, 80, 20)).save(
                        d / f"{i:03d}.jpg"
                    )
        (inst / task).mkdir(parents=True)
        json.dump(
            {"seen": [f"{task} seen A", f"{task} seen B"], "unseen": ["u"]},
            open(inst / task / "episode0.json", "w"),
        )

    cfg = RoboTwinQAFolderConfig(
        images_root=str(root), instructions_root=str(inst),
        resize_to=(32, 32),
    )
    ds = RoboTwinEpisodeFolderDataset(cfg)
    # only the whitelisted domain: 2 tasks x 1 domain x 2 eps x 2 frames
    assert len(ds) == 8
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["task"] == "click_bell" and s["domain"] == "Aloha-AgileX"
    assert s["instruction"].startswith("click_bell seen")
    # stable sampling: same episode always picks the same instruction
    assert ds[0]["instruction"] == ds[1]["instruction"]
    # episode1 has no json -> default template
    eps1 = [ds[i] for i in range(len(ds)) if ds[i]["episode"] == "episode1"]
    assert all("Describe the scene" in e["instruction"] for e in eps1)

    assert parse_triplet("/x/t/d/frames/episode7/img.jpg") == ("t", "d", "episode7")

    # probe: task filter
    ds2 = RoboTwinEpisodeFolderDataset(
        RoboTwinQAFolderConfig(images_root=str(root),
                               include_tasks=["handover_mic"],
                               resize_to=None)
    )
    assert len(ds2) == 4 and all(
        ds2[i]["task"] == "handover_mic" for i in range(4)
    )


def test_export_roundtrip():
    """convert_internvl_chat(export_internvl_chat(p)) == p."""
    import jax
    import jax.numpy as jnp

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.utils.hf_convert import (
        convert_internvl_chat, export_internvl_chat,
    )

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 300, (1, 8)).astype(np.int32)
    img = cfg.vision.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        jnp.asarray(rng.standard_normal((1, img, img, 3)).astype(np.float32)),
        jnp.ones((1,), jnp.int32),
    )["params"]
    sd = export_internvl_chat(params)
    back = convert_internvl_chat(sd, cfg.vision.num_layers, cfg.llm.num_layers)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(back)
    )
    n = 0
    for path, leaf in flat_a:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        assert key in flat_b, key
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[key]),
                                   rtol=1e-6, atol=1e-6)
        n += 1
    assert n == len(flat_b)


def test_export_save_safetensors(tmp_path):
    from vlaser_tpu.utils.hf_convert import load_safetensors_dir, save_safetensors

    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_safetensors(sd, str(tmp_path / "model.safetensors"))
    back = load_safetensors_dir(str(tmp_path))
    np.testing.assert_array_equal(back["a.weight"], sd["a.weight"])


def test_hf_checkpoint_dir_disk_roundtrip(tmp_path):
    """round-4 VERDICT #10: a full HF-layout checkpoint DIRECTORY on disk
    (config.json + SHARDED safetensors + index + tokenizer files) loads
    through the exact calls `scripts/eval_vlm.py` makes on a real
    download (AutoTokenizer.from_pretrained on the dir,
    load_safetensors_dir -> convert_internvl_chat -> quantize_for_serving
    -> VlaserChat), and the served greedy response is identical to the
    in-memory model the checkpoint was exported from — making an eventual
    real-weight run a pure data swap. Reference surface:
    modeling_internvl_chat.py:48-110 + tools/internvl_hf2custom.py."""
    import json

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.core.quant import quantize_for_serving
    from vlaser_tpu.inference.chat import VlaserChat
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.utils.hf_convert import (
        convert_internvl_chat, export_internvl_chat, load_safetensors_dir,
        save_hf_checkpoint_dir,
    )

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(9)
    ids = rng.integers(1, 400, (1, 8))
    px = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(ids),
                           jnp.asarray(px), None)
    # randomize (init gives structured values; conversion bugs should not
    # cancel)
    leaves, td = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        td, [(jax.random.normal(k, l.shape) * 0.05).astype(l.dtype)
             for k, l in zip(keys, leaves)])

    ckpt = str(tmp_path / "tiny-vlaser")
    save_hf_checkpoint_dir(
        export_internvl_chat(variables["params"]), ckpt,
        config={"architectures": ["InternVLChatModel"],
                "template": cfg.template,
                "vision_config": {"num_hidden_layers": cfg.vision.num_layers},
                "llm_config": {"num_hidden_layers": cfg.llm.num_layers}},
        num_shards=3,
    )
    # tokenizer files: a minimal slow GPT2 tokenizer (AutoTokenizer loads
    # it from the directory exactly as it would a real checkpoint's)
    vocab = {chr(c): i for i, c in enumerate(range(33, 127))}
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "tiny-vlaser" / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "tiny-vlaser" / "merges.txt").write_text("#version: 0.2\n")
    (tmp_path / "tiny-vlaser" / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "GPT2Tokenizer"}))

    # --- the eval_vlm.py load path, call for call ---
    tok = AutoTokenizer.from_pretrained(ckpt, use_fast=False,
                                        trust_remote_code=True)
    assert tok("abc")["input_ids"]  # tokenizer files load
    sd = load_safetensors_dir(ckpt)
    assert len(sd) > 0
    with open(f"{ckpt}/model.safetensors.index.json") as f:
        index = json.load(f)
    assert len({v for v in index["weight_map"].values()}) == 3  # sharded
    params = {"params": convert_internvl_chat(
        sd, cfg.vision.num_layers, cfg.llm.num_layers)}
    # weight-identity: disk -> convert must reproduce the exported tree
    want_flat = jax.tree_util.tree_leaves(variables["params"])
    got_flat = jax.tree_util.tree_leaves(params["params"])
    assert len(want_flat) == len(got_flat)
    for w, g in zip(want_flat, got_flat):
        np.testing.assert_array_equal(np.asarray(w, np.float32),
                                      np.asarray(g, np.float32))

    # serving-forward identity through the quantized chat entry
    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 + (ord(c) % 89) for c in text[:16]]}

        def convert_tokens_to_ids(self, t):
            return 3

        def decode(self, ids_, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids_)

    def respond(v):
        qv = quantize_for_serving(v, target="vlm", mode="w8a8", min_size=0)
        chat = VlaserChat(model, qv, _Tok(), max_new_tokens=4, bucket=32,
                          cache_dtype=jnp.float32)
        return chat.chat("what is this?", px)

    assert respond(params) == respond(variables)


def test_chat_http_server_openai_roundtrip():
    """OpenAI-compatible chat serving (serve/chat_server.py — the vLLM
    API-server role, RoboTwin-QA/GeneralQA.py:3-8): POST
    /v1/chat/completions with text + a data-URL image over a real socket
    against the tiny model; multi-turn history; error paths."""
    import base64
    import io
    import json as _json
    import urllib.error
    import urllib.request

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.inference.chat import VlaserChat
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.serve.chat_server import (
        ChatHTTPServer, chat_completion_request,
    )

    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 + (ord(c) % 89) for c in text[:48]]}

        def convert_tokens_to_ids(self, t):
            return 3

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    rng = np.random.default_rng(13)
    ids = rng.integers(1, 400, (1, 8))
    px = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px), None)
    chat = VlaserChat(model, params, _Tok(), max_new_tokens=4, bucket=32,
                      cache_dtype=jnp.float32)
    srv = ChatHTTPServer(chat, host="127.0.0.1", port=0,
                         model_name="tiny-vlaser", max_tiles=2)
    assert srv.image_size == cfg.vision.image_size  # follows the model cfg
    srv.start_background()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        # text-only
        out = chat_completion_request(url, [
            {"role": "user", "content": "what do you see?"},
        ])
        assert out["object"] == "chat.completion"
        text1 = out["choices"][0]["message"]["content"]
        assert isinstance(text1, str)

        # image via data URL (OpenAI vision content parts)
        im = Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), np.uint8), "RGB")
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        data_url = ("data:image/png;base64,"
                    + base64.b64encode(buf.getvalue()).decode())
        out2 = chat_completion_request(url, [
            {"role": "user", "content": [
                {"type": "text", "text": "describe the image"},
                {"type": "image_url", "image_url": {"url": data_url}},
            ]},
        ])
        assert isinstance(out2["choices"][0]["message"]["content"], str)

        # multi-turn history passes through
        out3 = chat_completion_request(url, [
            {"role": "user", "content": "what do you see?"},
            {"role": "assistant", "content": text1},
            {"role": "user", "content": "and now?"},
        ])
        assert isinstance(out3["choices"][0]["message"]["content"], str)

        # /v1/models + health
        with urllib.request.urlopen(url + "/v1/models", timeout=10) as r:
            assert _json.loads(r.read())["data"][0]["id"] == "tiny-vlaser"
        with urllib.request.urlopen(url + "/health", timeout=10) as r:
            assert _json.loads(r.read())["ok"] is True

        # bad request: no user message
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            _json.dumps({"messages": [
                {"role": "assistant", "content": "x"}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_chat_http_server_batches_concurrent_requests():
    """Cross-request batching (the vLLM API-server behavior): with an
    EngineChat backend, concurrent /v1/chat/completions requests collect
    into ONE continuous-batching admission (chat_many) inside the batch
    window — and every response equals the request's solo chat()."""
    import threading as _threading

    import jax
    import jax.numpy as jnp

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.serve.chat_server import (
        ChatHTTPServer, chat_completion_request,
    )
    from vlaser_tpu.serve.engine_chat import EngineChat

    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 + (ord(c) % 89) for c in text[:24]]}

        def convert_tokens_to_ids(self, t):
            return 3

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.full((1, 8), 7, jnp.int32), None,
                        jnp.ones((1, 8), jnp.int32))
    served = EngineChat(model, params, _Tok(), max_new_tokens=4,
                        num_slots=4, max_len=64, prefill_buckets=(32,),
                        cache_dtype=jnp.float32)
    qs = ["what is here?", "count the cups", "name one color"]
    # chat_many == per-item chat (engine batch identity at the chat level)
    want = [served.chat(q) for q in qs]
    assert served.chat_many([(q, None, None) for q in qs]) == want

    srv = ChatHTTPServer(served, host="127.0.0.1", port=0,
                         batch_wait_ms=250)
    assert srv._queue is not None  # EngineChat backend -> batching on
    srv.start_background()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        outs = [None] * len(qs)

        def fire(i):
            outs[i] = chat_completion_request(url, [
                {"role": "user", "content": qs[i]}])

        threads = [_threading.Thread(target=fire, args=(i,))
                   for i in range(len(qs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        got = [o["choices"][0]["message"]["content"] for o in outs]
        assert got == want
        # the burst landed in fewer admissions than requests (the 250 ms
        # window collected the three concurrent posts)
        assert srv.batches_served < len(qs)
    finally:
        srv.shutdown()


def test_chat_http_server_stream_shim():
    """"stream": true returns a valid SSE body (one delta + [DONE]) with
    the same content as the non-streaming path — streaming OpenAI clients
    work against the server (token-level streaming is not claimed; the
    engine commits per decode chunk)."""
    import json as _json
    import urllib.request

    import jax
    import jax.numpy as jnp

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.inference.chat import VlaserChat
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.serve.chat_server import (
        ChatHTTPServer, chat_completion_request,
    )

    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 + (ord(c) % 89) for c in text[:24]]}

        def convert_tokens_to_ids(self, t):
            return 3

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.full((1, 8), 7, jnp.int32), None,
                        jnp.ones((1, 8), jnp.int32))
    chat = VlaserChat(model, params, _Tok(), max_new_tokens=4, bucket=32,
                      cache_dtype=jnp.float32)
    srv = ChatHTTPServer(chat, host="127.0.0.1", port=0)
    srv.start_background()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        plain = chat_completion_request(url, [
            {"role": "user", "content": "what is here?"}])
        want = plain["choices"][0]["message"]["content"]
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            _json.dumps({"stream": True, "messages": [
                {"role": "user", "content": "what is here?"}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            lines = [ln for ln in r.read().decode().split("\n\n") if ln]
        assert lines[-1] == "data: [DONE]"
        delta = _json.loads(lines[0][len("data: "):])
        assert delta["object"] == "chat.completion.chunk"
        assert delta["choices"][0]["delta"]["content"] == want
    finally:
        srv.shutdown()


def test_chat_http_server_true_streaming_with_engine():
    """With an EngineChat backend, "stream": true delivers REAL SSE
    deltas fed by the engine's per-commit on_token hook — multiple
    events whose concatenation equals the non-streaming response, then a
    stop chunk and [DONE]."""
    import json as _json
    import urllib.request

    import jax
    import jax.numpy as jnp

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.serve.chat_server import (
        ChatHTTPServer, chat_completion_request,
    )
    from vlaser_tpu.serve.engine_chat import EngineChat

    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 + (ord(c) % 89) for c in text[:24]]}

        def convert_tokens_to_ids(self, t):
            return 3

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.full((1, 8), 7, jnp.int32), None,
                        jnp.ones((1, 8), jnp.int32))
    served = EngineChat(model, params, _Tok(), max_new_tokens=8,
                        num_slots=2, max_len=64, prefill_buckets=(32,),
                        cache_dtype=jnp.float32, chunk_size=2)
    srv = ChatHTTPServer(served, host="127.0.0.1", port=0,
                         batch_wait_ms=20)
    srv.start_background()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        want = chat_completion_request(url, [
            {"role": "user", "content": "what is here?"},
        ])["choices"][0]["message"]["content"]

        req = urllib.request.Request(
            url + "/v1/chat/completions",
            _json.dumps({"stream": True, "messages": [
                {"role": "user", "content": "what is here?"}]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            events = [e for e in r.read().decode().split("\n\n") if e]
        assert events[-1] == "data: [DONE]"
        parsed = [_json.loads(e[len("data: "):]) for e in events[:-1]]
        deltas = [p["choices"][0]["delta"].get("content", "")
                  for p in parsed]
        # multiple content deltas (chunk_size=2, 8 new tokens), and the
        # concatenation reproduces the non-streaming text modulo edge
        # whitespace (the final text is .strip()ed by the chat surface)
        assert sum(1 for d in deltas if d) >= 2
        assert "".join(d for d in deltas if d).strip() == want
        assert parsed[-1]["choices"][0]["finish_reason"] == "stop"
    finally:
        srv.shutdown()


def test_chat_http_server_max_tokens_and_multimage():
    """Round-5 review fixes: (a) per-request max_tokens is honored by the
    engine backend (clamped to the compiled length, reported in usage);
    (b) robust history pairing (leading assistant greeting, consecutive
    user turns); (c) multi-image messages plumb per-image tile counts
    (num_patches_list) instead of collapsing into one <image> block;
    (d) content-parts system messages are extracted, not dropped."""
    import base64
    import io
    import json as _json

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vlaser_tpu.core.config import tiny_vlm
    from vlaser_tpu.models.vlm import InternVLChatModel
    from vlaser_tpu.serve.chat_server import (
        ChatHTTPServer, _parse_messages, chat_completion_request,
    )
    from vlaser_tpu.serve.engine_chat import EngineChat

    class _Tok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [7 + (ord(c) % 89) for c in text[:24]]}

        def convert_tokens_to_ids(self, t):
            return 3

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    # --- _parse_messages unit coverage (b)(c)(d) ---
    rng = np.random.default_rng(23)

    def durl():
        im = Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), np.uint8), "RGB")
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    q, px, hist, system, npl = _parse_messages([
        {"role": "system",
         "content": [{"type": "text", "text": "be brief"}]},
        {"role": "assistant", "content": "hello! how can I help?"},
        {"role": "user", "content": "hi"},
        {"role": "user", "content": "actually, one question"},
        {"role": "assistant", "content": "go ahead"},
        {"role": "user", "content": [
            {"type": "text", "text": "compare these"},
            {"type": "image_url", "image_url": {"url": durl()}},
            {"type": "image_url", "image_url": {"url": durl()}},
        ]},
    ], max_tiles=4, image_size=28)
    assert system == "be brief"  # (d) content-parts system extracted
    # (b): the assistant greeting is ignored; the consecutive-user case
    # pairs the LATEST open user turn with the next assistant turn
    assert hist == [("actually, one question", "go ahead")]
    # (c): two images -> two per-image tile counts and two <image> tags
    assert npl is not None and len(npl) == 2
    assert px.shape[0] == sum(npl)
    assert q.count("<image>") == 2

    # --- (a) max_tokens through the engine backend over a socket ---
    cfg = tiny_vlm()
    model = InternVLChatModel(cfg, compute_dtype=jnp.float32,
                              attn_impl="reference")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.full((1, 8), 7, jnp.int32), None,
                        jnp.ones((1, 8), jnp.int32))
    served = EngineChat(model, params, _Tok(), max_new_tokens=8,
                        num_slots=2, max_len=64, prefill_buckets=(32,),
                        cache_dtype=jnp.float32)
    srv = ChatHTTPServer(served, host="127.0.0.1", port=0,
                         batch_wait_ms=5)
    srv.start_background()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        import urllib.request

        def post(payload):
            req = urllib.request.Request(
                url + "/v1/chat/completions",
                _json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return _json.loads(r.read())

        full = post({"messages": [{"role": "user", "content": "hi?"}]})
        capped = post({"max_tokens": 2,
                       "messages": [{"role": "user", "content": "hi?"}]})
        # the stub detokenizer emits one decimal id per token, so token
        # counts are directly readable from the text
        n_full = len(full["choices"][0]["message"]["content"].split())
        n_capped = len(capped["choices"][0]["message"]["content"].split())
        assert n_capped <= 2 < n_full
        assert capped["usage"]["max_new_tokens"] == 2
        assert capped["usage"]["max_new_tokens_cap"] == 8
        # over-cap requests clamp to the compiled length
        over = post({"max_tokens": 4096,
                     "messages": [{"role": "user", "content": "hi?"}]})
        assert over["usage"]["max_new_tokens"] == 8
    finally:
        srv.shutdown()
