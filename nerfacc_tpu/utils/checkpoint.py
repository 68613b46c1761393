"""Checkpoint / resume for train states (params + opt state + estimator
state + step).

Parity target: the reference's ``torch.save``/``load`` of
``{step, radiance_field, optimizer, scheduler, estimator}``
(``train_mlp_nerf.py:114-122,189-199``), done the TPU way with orbax
(atomic, async-capable, multi-host-aware).  Falls back to pickle when orbax
is unavailable.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: int) -> None:
    """Save a pytree ``state`` at ``step`` to ``path`` (a directory)."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(path, f"step_{step}"),
            jax.tree.map(lambda x: x, state),
            force=True,
        )
        ckptr.wait_until_finished()
        with open(os.path.join(path, "latest"), "w") as f:
            f.write(str(step))
    except ImportError:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"step_{step}.pkl"), "wb") as f:
            pickle.dump(jax.device_get(state), f)
        with open(os.path.join(path, "latest"), "w") as f:
            f.write(str(step))


def latest_step(path: str) -> Optional[int]:
    marker = os.path.join(path, "latest")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def restore_checkpoint(path: str, target: Any) -> tuple[Any, int]:
    """Restore into the structure of ``target``; returns ``(state, step)``.

    Raises FileNotFoundError if no checkpoint exists.
    """
    step = latest_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    pkl = os.path.join(path, f"step_{step}.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            return pickle.load(f), step
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(
        os.path.join(os.path.abspath(path), f"step_{step}"), target
    )
    return state, step
