"""Checkpoint / resume with the reference's dual cadence.

Reference (exp-1-debias-gender/1-main-debias.py:2050-2068 + clean_checkpoint
:120-137): `accelerator.save_state` to `checkpoint_tmp-{step}` every 20
steps keeping the newest 2, and to `checkpoint-{step}` every 200 steps kept
forever; resume restores optimizer/scaler/RNG/EMA and recomputes offsets
(:1698-1724). TPU-native equivalent: two orbax CheckpointManagers over the
same state pytree (adapters, optimizer state, EMA, step); RNG state needs no
saving — keys are derived from (seed, step).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from fairdiff.training.debias import DebiasState


class DualCadenceCheckpointer:
    def __init__(
        self,
        directory: str | Path,
        *,
        tmp_every: int = 20,
        perm_every: int = 200,
        tmp_keep: int = 2,
    ):
        directory = Path(directory).absolute()
        self.tmp_every = tmp_every
        self.perm_every = perm_every
        self._tmp = ocp.CheckpointManager(
            directory / "tmp",
            options=ocp.CheckpointManagerOptions(max_to_keep=tmp_keep),
        )
        self._perm = ocp.CheckpointManager(
            directory / "perm",
            options=ocp.CheckpointManagerOptions(max_to_keep=None),
        )
        # orbax managers own non-daemon worker threads; an unclosed manager
        # hangs interpreter exit (seen as a pytest hang after 100%). Close
        # on exit; close() is idempotent via _closed.
        import atexit

        self._closed = False
        atexit.register(self.close)

    def maybe_save(self, state: DebiasState) -> None:
        payload = {
            "adapters": state.adapters,
            "opt_state": state.opt_state,
            "ema": state.ema,
            "step": state.step,
        }
        if self.perm_every and state.step % self.perm_every == 0:
            self._perm.save(state.step, args=ocp.args.StandardSave(payload))
        elif self.tmp_every and state.step % self.tmp_every == 0:
            self._tmp.save(state.step, args=ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        steps = [s for s in (self._tmp.latest_step(), self._perm.latest_step()) if s is not None]
        return max(steps) if steps else None

    def restore(self, template: DebiasState, step: Optional[int] = None) -> DebiasState:
        """Restore into the structure of `template` (a freshly-initialised
        state, so shapes/dtypes are known)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        mgr = (
            self._perm
            if self._perm.latest_step() is not None and step in self._perm.all_steps()
            else self._tmp
        )
        payload = {
            "adapters": template.adapters,
            "opt_state": template.opt_state,
            "ema": template.ema,
            "step": template.step,
        }
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(payload)
        )
        return DebiasState(
            restored["adapters"], restored["opt_state"], restored["ema"],
            int(restored["step"]),
        )

    def wait(self):
        self._tmp.wait_until_finished()
        self._perm.wait_until_finished()

    def close(self):
        if getattr(self, "_closed", False):
            return
        self._closed = True
        self.wait()
        self._tmp.close()
        self._perm.close()
