"""Test harness: virtual 8-device CPU mesh (SURVEY.md §4 'Implication for the
rebuild') so DP/FSDP/TP and packing tests run hostside without TPU hardware."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config flag too.
jax.config.update("jax_platforms", "cpu")
# CPU XLA defaults to reduced-precision matmul in this JAX version; correctness
# tests need deterministic fp32 (production uses bf16 compute explicitly).
jax.config.update("jax_default_matmul_precision", "highest")



def install_reference_stubs():
    """Stub the reference's heavyweight deps (timm DropPath) so its modeling
    code imports on this box; shared by the golden-parity tests."""
    import importlib.machinery
    import types

    import torch.nn as nn

    if "timm" in sys.modules:
        return

    def mkmod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    timm = mkmod("timm")
    models_mod = mkmod("timm.models")
    layers_mod = mkmod("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers_mod.DropPath = DropPath
    timm.models = models_mod
    models_mod.layers = layers_mod
    sys.modules.update(
        {"timm": timm, "timm.models": models_mod, "timm.models.layers": layers_mod}
    )


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full suite compiles ~300 XLA CPU programs in one process; late in
    the run the CPU client's JIT has segfaulted inside
    backend_compile_and_load (deterministically around the trainer module,
    never when the module runs alone). Dropping the executable caches
    between modules keeps the accumulated JIT state bounded."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
