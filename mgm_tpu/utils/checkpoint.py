"""Checkpoint/resume for long multi-tile scenes.

The reference has no checkpointing (SURVEY.md section 5); for tiled
satellite-scale runs we persist per-tile solver state (aggregated S
slabs, disparities, per-pixel windows) so a preempted job resumes at
the last finished tile instead of re-solving the scene.
"""
from __future__ import annotations

import os

import numpy as np


def save_state(path: str, **arrays) -> None:
    """Atomically persist named arrays (.npz)."""
    tmp = path + ".tmp.npz"  # savez appends .npz unless already present
    np.savez_compressed(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, path)


def load_state(path: str) -> dict | None:
    """Load a checkpoint dict, or None if absent/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None
