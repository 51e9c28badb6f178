"""Checkpoint save/restore — orbax when available, npz always.

The reference checkpoints rich state (seed/hparams/best_acc,
train_mnist.py:147-159) and reloads artifacts across languages.  Here:

- ``save_orbax``/``load_orbax``: idiomatic JAX checkpointing via
  orbax.checkpoint (PyTree of arrays; survives framework upgrades,
  supports async/sharded state in multi-chip training).
- The npz path (train.mnist.save_checkpoint) remains the portable
  artifact format consumed by the quantize/export CLIs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

try:
    import orbax.checkpoint as ocp
    HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked in normally
    ocp = None
    HAS_ORBAX = False


def save_orbax(path: str, tree: Dict[str, Any]) -> None:
    """Save a PyTree (e.g. {'params': ..., 'opt_state': ..., 'meta': ...})."""
    if not HAS_ORBAX:
        raise RuntimeError("orbax.checkpoint not available")
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_orbax(path: str) -> Dict[str, Any]:
    if not HAS_ORBAX:
        raise RuntimeError("orbax.checkpoint not available")
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


class CheckpointManager:
    """Keep the latest-k training checkpoints (resume-after-interrupt).

    Thin wrapper over orbax's CheckpointManager with an npz fallback so
    resume works even without orbax.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        if HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep))
        else:
            self._mgr = None

    def save(self, step: int, tree: Dict[str, Any]) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(tree))
            self._mgr.wait_until_finished()
        else:
            flat = {k: np.asarray(v) for k, v in tree.items()}
            np.savez(os.path.join(self.directory, f"step_{step}.npz"),
                     **flat)

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("step_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None) -> Dict[str, Any]:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self._mgr is not None:
            return self._mgr.restore(step)
        data = np.load(os.path.join(self.directory, f"step_{step}.npz"))
        return {k: data[k] for k in data.files}
