"""Checkpoint / resume for transient simulations.

The reference has NO checkpointing — state lives only in memory across the
time loop and a crash means re-running from the ICs (SURVEY.md section 5).
This is a capability upgrade: the full transient state
(u / u_old / u_older / u_raw), the step index, simulation time, and a
parameter hash are serialized per output step; `load_checkpoint` verifies
the parameter hash so a resumed run cannot silently continue with a
different deck.
"""

from __future__ import annotations

import hashlib
import json
from typing import Dict, Optional, Tuple

import numpy as np


def _params_hash(params: Dict) -> str:
    canon = json.dumps(
        {k: (float(v) if isinstance(v, (int, float, np.floating)) else str(v))
         for k, v in sorted(params.items())},
        sort_keys=True,
    )
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def save_checkpoint(path: str, state: Dict, step: int, time_value: float,
                    params: Optional[Dict] = None, **extra_arrays) -> None:
    arrays = {k: np.asarray(v) for k, v in state.items()}
    arrays.update({k: np.asarray(v) for k, v in extra_arrays.items()})
    # explicit manifest: state keys are routed by name at load time, not by
    # a name-prefix heuristic (an extra array named e.g. "uptake" must not
    # be injected into the solver state)
    np.savez_compressed(
        path,
        __step=np.asarray(step),
        __time=np.asarray(time_value),
        __params_hash=np.asarray(_params_hash(params or {})),
        __state_keys=np.asarray(sorted(state.keys())),
        **arrays,
    )


def load_checkpoint(path: str, params: Optional[Dict] = None
                    ) -> Tuple[Dict, int, float, Dict]:
    """Returns (state, step, time, extra_arrays); raises if the parameter
    hash does not match the provided deck parameters."""
    with np.load(path) as z:
        stored_hash = str(z["__params_hash"])
        if params is not None and stored_hash != _params_hash(params):
            raise ValueError(
                f"{path}: checkpoint was written with different parameters "
                f"(hash {stored_hash} != {_params_hash(params)})"
            )
        step = int(z["__step"])
        time_value = float(z["__time"])
        if "__state_keys" in z.files:
            state_keys = {str(k) for k in z["__state_keys"]}
        else:  # pre-manifest checkpoints
            state_keys = {k for k in z.files if k.startswith("u")}
        state = {}
        extra = {}
        for k in z.files:
            if k.startswith("__"):
                continue
            (state if k in state_keys else extra)[k] = z[k]
    return state, step, time_value, extra
