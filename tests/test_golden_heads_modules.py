"""Golden parity for the remaining small modules against the reference's
own torch code:

- RoboTwin L1RegressionActionHead / MLPResNet
  (RoboTwin/policy/internvla_2B_parallel_decoding/internvl/model/
  action_heads.py:58-106) — previously covered only by shape/oracle tests.
- adaLN modules: AdaptiveRMSNorm + AdaptiveLayerscale
  (Simpler/src/model/vla/modules.py:78-119). The full adaLN joint-model
  golden has no well-defined reference target: the reference ties proprio
  to the adaptive action mixture and then calls its prefix pass with
  time_cond=None, which crashes its own AdaptiveRMSNorm — our blend
  (adaptive norms on action tokens, plain on the tied proprio/prefix) is
  the documented working interpretation, so parity is pinned at the
  module level.
"""

import importlib
import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

ROBOTWIN_POLICY = (
    "/root/reference/Vlaser_VLA/RoboTwin/policy/internvla_2B_parallel_decoding"
)
SIMPLER = "/root/reference/Vlaser_VLA/Simpler"


def _to_np(t):
    return t.detach().float().numpy()


def test_l1_action_head_golden():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(ROBOTWIN_POLICY):
        pytest.skip("reference tree not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import install_reference_stubs

    install_reference_stubs()

    # RoboTwin's vendored `internvl` package shadows Vlaser_VLM's — import
    # what we need, then purge both the path entry and the cached modules
    # so the sibling golden tests resolve the right package.
    def _purge_robotwin_internvl():
        while ROBOTWIN_POLICY in sys.path:
            sys.path.remove(ROBOTWIN_POLICY)
        for name in [m for m in sys.modules
                     if m == "internvl" or m.startswith("internvl.")]:
            del sys.modules[name]

    _purge_robotwin_internvl()
    sys.path.insert(0, ROBOTWIN_POLICY)
    try:
        ah = importlib.import_module("internvl.model.action_heads")
        from internvl.vla import constants as ref_const

        chunk = ref_const.NUM_ACTIONS_CHUNK
        HeadCls = ah.L1RegressionActionHead
    except Exception as e:  # pragma: no cover
        _purge_robotwin_internvl()
        pytest.skip(f"reference action_heads import failed: {e}")
    finally:
        _purge_robotwin_internvl()
    H, HID, A = 16, 24, 14
    torch.manual_seed(0)
    ref = HeadCls(input_dim=H, hidden_dim=HID, action_dim=A).eval().float()

    import jax

    from vlaser_tpu.policy.parallel_decoding import L1RegressionActionHead

    ours = L1RegressionActionHead(input_dim=H * A, hidden_dim=HID,
                                  action_dim=A, compute_dtype=jnp.float32)
    sd = ref.state_dict()

    def lin(key):
        return {"kernel": _to_np(sd[f"{key}.weight"]).T,
                "bias": _to_np(sd[f"{key}.bias"])}

    def ln(key):
        return {"weight": _to_np(sd[f"{key}.weight"]),
                "bias": _to_np(sd[f"{key}.bias"])}

    params = {"params": {
        "norm1": ln("model.layer_norm1"),
        "fc1": lin("model.fc1"),
        "block0": {"norm": ln("model.mlp_resnet_blocks.0.ffn.0"),
                   "fc": lin("model.mlp_resnet_blocks.0.ffn.1")},
        "block1": {"norm": ln("model.mlp_resnet_blocks.1.ffn.0"),
                   "fc": lin("model.mlp_resnet_blocks.1.ffn.1")},
        "norm2": ln("model.layer_norm2"),
        "fc2": lin("model.fc2"),
    }}
    rng = np.random.default_rng(0)
    # reference input: [B, chunk * action_dim, hidden], reshaped internally
    # to [B, NUM_ACTIONS_CHUNK, -1]
    hidden = rng.standard_normal((2, chunk * A, H)).astype(np.float32)
    with torch.no_grad():
        want = _to_np(ref.predict_action(torch.from_numpy(hidden)))
    got = np.asarray(ours.apply(
        params, jnp.asarray(hidden.reshape(2, chunk, A * H))
    ))
    assert got.shape == want.shape == (2, chunk, A)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_adaptive_modules_golden():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(SIMPLER):
        pytest.skip("reference tree not available")
    if SIMPLER not in sys.path:
        sys.path.insert(0, SIMPLER)
    try:
        mods = importlib.import_module("src.model.vla.modules")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference modules import failed: {e}")

    from vlaser_tpu.models.layers import AdaptiveLayerscale, AdaptiveRMSNorm

    D, C = 24, 16
    torch.manual_seed(1)
    ref_norm = mods.AdaptiveRMSNorm(D, C).eval().float()
    # randomize the layerscale too (its init is zeros/-2 by design)
    ref_scale = mods.AdaptiveLayerscale(D, C).eval().float()
    with torch.no_grad():
        ref_scale.to_adaln_zero_gamma.weight.normal_(0, 0.2)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, D)).astype(np.float32)
    cond = rng.standard_normal((2, C)).astype(np.float32)

    with torch.no_grad():
        want_n = _to_np(ref_norm(torch.from_numpy(x), torch.from_numpy(cond)))
        want_s = _to_np(ref_scale(torch.from_numpy(x),
                                  torch.from_numpy(cond)))

    sdn = ref_norm.state_dict()
    params_n = {"params": {
        "to_gamma": {"kernel": _to_np(sdn["to_gamma.0.weight"]).T,
                     "bias": _to_np(sdn["to_gamma.0.bias"])},
        "to_beta": {"kernel": _to_np(sdn["to_beta.weight"]).T},
    }}
    got_n = np.asarray(
        AdaptiveRMSNorm(D, compute_dtype=jnp.float32).apply(
            params_n, jnp.asarray(x), jnp.asarray(cond)
        )
    )
    np.testing.assert_allclose(got_n, want_n, atol=1e-5, rtol=1e-5)

    sds = ref_scale.state_dict()
    params_s = {"params": {
        "kernel": _to_np(sds["to_adaln_zero_gamma.weight"]).T,
        "bias": _to_np(sds["to_adaln_zero_gamma.bias"]),
    }}
    got_s = np.asarray(
        AdaptiveLayerscale(D, compute_dtype=jnp.float32).apply(
            params_s, jnp.asarray(x), jnp.asarray(cond)
        )
    )
    np.testing.assert_allclose(got_s, want_s, atol=1e-5, rtol=1e-5)
