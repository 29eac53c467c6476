"""Fractal VM/VA protocol grids vs the reference's own config module.

Imports src/agent/variant_aggressive_config.py from /root/reference at test
time (with sapien.core.Pose / transforms3d.euler stubs built on our geometry
helpers) and checks that our declarative grids enumerate the SAME environment
specs: env names x scenes x build-kwargs variants, robot/object init grids,
overlay images, episode caps, and init quaternions.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from vlaser_tpu.envs.geometry import euler2quat, mat2quat, quat2mat
from vlaser_tpu.eval.variant_configs import (
    TASKS,
    enumerate_env_specs,
    robot_init_quats,
    variant_aggregation_families,
    visual_matching_families,
)

REF_DIR = "/root/reference/Vlaser_VLA/Simpler/src/agent"


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference tree unavailable")

    def mkmod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    class Pose:
        def __init__(self, p=None, q=(1, 0, 0, 0)):
            self.q = np.asarray(q, float)

        def __mul__(self, other):
            return Pose(q=mat2quat(quat2mat(self.q) @ quat2mat(other.q)))

    if "sapien" not in sys.modules:
        sapien = mkmod("sapien")
        core = mkmod("sapien.core")
        core.Pose = Pose
        sapien.core = core
        sys.modules.update({"sapien": sapien, "sapien.core": core})
    if "transforms3d" not in sys.modules:
        t3d = mkmod("transforms3d")
        euler = mkmod("transforms3d.euler")
        euler.euler2quat = euler2quat
        t3d.euler = euler
        sys.modules.update({"transforms3d": t3d, "transforms3d.euler": euler})
    if "gymnasium" not in sys.modules:
        gym = mkmod("gymnasium")
        gym.make = lambda *a, **k: None
        sys.modules["gymnasium"] = gym

    spec = importlib.util.spec_from_file_location(
        "ref_variant_config", os.path.join(REF_DIR, "variant_aggressive_config.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_specs(merged):
    """Reference merged dicts -> our spec key set for comparison."""
    out = []
    for m in merged:
        variants = m["additional-env-build-kwargs-variants"] or [None]
        for env in m["env-name"]:
            for scene in m["scene-name"]:
                for kw in variants:
                    out.append({
                        "env_name": env,
                        "scene_name": scene,
                        "build_kwargs": dict(kw) if kw else {},
                        "max_episode_steps": m["max-episode-steps"],
                        "robot_init_xs": list(np.linspace(*m["robot-init-x-range"][:2],
                                                          int(m["robot-init-x-range"][2]))),
                        "robot_init_ys": list(np.linspace(*m["robot-init-y-range"][:2],
                                                          int(m["robot-init-y-range"][2]))),
                        "obj_variation_mode": m["obj-variation-mode"],
                        "rgb_overlay": (os.path.basename(m["rgb-overlay-path"])
                                        if m["rgb-overlay-path"] else None),
                        "quats": [list(q) for q in m["robot-init-quats"]],
                    })
    return out


def _our_specs(families):
    out = []
    for spec, fam in zip(
        enumerate_env_specs(families),
        (f for f in families for _ in range(
            len(f.env_names) * len(f.scene_names) * len(f.build_kwargs_variants))),
    ):
        out.append({
            "env_name": spec["env_name"],
            "scene_name": spec["scene_name"],
            "build_kwargs": spec["build_kwargs"],
            "max_episode_steps": spec["max_episode_steps"],
            "robot_init_xs": spec["robot_init_xs"],
            "robot_init_ys": spec["robot_init_ys"],
            "obj_variation_mode": spec["obj_variation_mode"],
            "rgb_overlay": spec["rgb_overlay"],
            "quats": spec["robot_init_quats"],
        })
    return out


def _norm_kw(kw):
    # the reference passes the literal string "None" for move-near VM urdf
    return {k: (None if v == "None" else v) for k, v in kw.items()}


def _key(s):
    return (
        s["env_name"], s["scene_name"],
        tuple(sorted((k, str(v)) for k, v in _norm_kw(s["build_kwargs"]).items())),
        s["max_episode_steps"],
        tuple(np.round(s["robot_init_xs"], 6)),
        tuple(np.round(s["robot_init_ys"], 6)),
        s["obj_variation_mode"],
        s["rgb_overlay"],
        tuple(np.round(np.asarray(s["quats"], float).ravel(), 6)),
    )


@pytest.mark.parametrize("task", TASKS)
def test_va_grids_match_reference(ref_mod, task):
    ref = _ref_specs(ref_mod.find_suitable_args(task))
    ours = _our_specs(variant_aggregation_families(task))
    assert len(ours) == len(ref)
    assert sorted(map(_key, ours)) == sorted(map(_key, ref))


@pytest.mark.parametrize("task", TASKS)
def test_vm_grids_match_reference(ref_mod, task):
    ref = _ref_specs(ref_mod.find_suitable_args_match(task))
    ours = _our_specs(visual_matching_families(task))
    assert len(ours) == len(ref)
    assert sorted(map(_key, ours)) == sorted(map(_key, ref))
