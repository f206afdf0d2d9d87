"""Chain checkpoint / resume.

The reference has no checkpointing - chains are regenerated from fixed seeds
(SURVEY.md section 5; ``driver_mgmc.cc:448-449``).  For long production sampling
runs on TPU this module adds durable chain state: the sampler state is just
``(x, key, step)`` (plus accumulated statistics), saved as a compressed npz with
integrity metadata and restored exactly - resuming a chain continues the same
Markov chain (the kernel is memoryless given ``(x, key)``).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


@dataclasses.dataclass
class ChainState:
    """Complete MCMC chain state."""

    x: Any  # chain state field(s), (*, *vshape)
    key: Any  # jax PRNG key
    step: int
    stats: Optional[Dict[str, Any]] = None  # e.g. running sums

    def save(self, path) -> None:
        path = Path(path)
        payload = {
            "x": np.asarray(self.x),
            "key": np.asarray(jax.random.key_data(self.key))
            if jax.dtypes.issubdtype(np.asarray(self.key).dtype, jax.dtypes.prng_key)
            else np.asarray(self.key),
            "step": np.asarray(self.step),
        }
        meta = {"version": 1, "stats_keys": []}
        if self.stats:
            for k, v in self.stats.items():
                payload[f"stat_{k}"] = np.asarray(v)
                meta["stats_keys"].append(k)
        payload["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as fh:
            np.savez_compressed(fh, **payload)
        tmp.replace(path)  # atomic on POSIX

    @classmethod
    def load(cls, path) -> "ChainState":
        with np.load(Path(path)) as data:
            meta = json.loads(bytes(data["meta"]).decode())
            key_data = data["key"]
            key = jax.random.wrap_key_data(np.asarray(key_data, dtype=np.uint32))
            stats = {k: data[f"stat_{k}"] for k in meta["stats_keys"]} or None
            return cls(
                x=np.asarray(data["x"]),
                key=key,
                step=int(data["step"]),
                stats=stats,
            )
