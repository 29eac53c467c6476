"""EMA / SWA of parameters, functional.

Parity surface: src/agent/model_averaging.py (ModelAveraging with ema_start/
ema_decay/ema_freq, swa_start/swa_freq). Here the average is just another
param pytree updated inside jit — device-resident, shard-preserving, and
trivially resumable (a delta vs the reference's 'not supporting resume').
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AveragingConfig:
    mode: Optional[str] = None  # None | 'ema' | 'swa'
    start: int = 0
    freq: int = 1
    ema_decay: float = 0.99


class ModelAveraging:
    def __init__(self, cfg: AveragingConfig):
        assert cfg.mode in (None, "ema", "swa")
        self.cfg = cfg
        self.avg_params: Any = None
        self.n_averaged: int = 0

    def update(self, step: int, params) -> None:
        cfg = self.cfg
        if cfg.mode is None or step < cfg.start:
            return
        if self.avg_params is None:
            # explicit copy: the train step donates its input buffers, so
            # aliasing params here would leave the average pointing at
            # deleted arrays one step later
            self.avg_params = jax.tree_util.tree_map(jnp.copy, params)
            self.n_averaged = 1
            return
        if (step - cfg.start) % cfg.freq != 0:
            return
        if cfg.mode == "ema":
            d = cfg.ema_decay
            self.avg_params = jax.tree_util.tree_map(
                lambda a, p: a * d + p.astype(a.dtype) * (1.0 - d),
                self.avg_params, params,
            )
        else:  # swa running mean
            n = self.n_averaged
            self.avg_params = jax.tree_util.tree_map(
                lambda a, p: a + (p.astype(a.dtype) - a) / (n + 1),
                self.avg_params, params,
            )
        self.n_averaged += 1

    def params_for_eval(self, params):
        return self.avg_params if self.avg_params is not None else params

    def state_dict(self):
        return {"avg_params": self.avg_params, "n_averaged": self.n_averaged}

    def load_state_dict(self, st):
        self.avg_params = st["avg_params"]
        self.n_averaged = int(st["n_averaged"])
