"""Checkpoint save / restore / resume (C9) via async orbax.

The reference used synchronous `torch.save`/`torch.load` (`[RECALL]`
SURVEY.md section 4.5); here saves are asynchronous so the TPU never stalls
on checkpoint I/O (BASELINE.json:5). Saved payload (SURVEY.md section 6.4):
{params, opt_state, batch_stats, step} plus the data-iterator state (JSON)
so resume continues mid-epoch from the exact sample position.

Restore accepts any mesh/chip count: all state is replicated under pure DP
(SURVEY.md section 6.3 -- elastic restore by construction).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from rgb_proprioceptive_pose_estimator_tpu.engine.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=async_save,
            ),
            # register both items up front: partial restores (e.g.
            # restore_data's JSON-only read) otherwise emit a spurious
            # "Item ... could not be restored" warning per unrequested item
            item_handlers={
                "state": ocp.StandardCheckpointHandler(),
                "data": ocp.JsonCheckpointHandler(),
            },
        )

    def save(self, step: int, state: TrainState,
             data_state: Optional[Dict[str, Any]] = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if data_state is not None:
            args["data"] = ocp.args.JsonSave(data_state)
        self._mngr.save(step, args=ocp.args.Composite(**args))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        """Steps currently on disk (used to avoid duplicate-step saves when
        an explicit-step resume re-walks already-checkpointed steps)."""
        return list(self._mngr.all_steps())

    def delete(self, step: int) -> None:
        self._mngr.delete(step)

    def restore_data(self, step: Optional[int] = None
                     ) -> Optional[Dict[str, Any]]:
        """Restore only the JSON data payload (no array state)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(data=ocp.args.JsonRestore()))
        return restored.get("data")

    def restore(self, state_template: TrainState, step: Optional[int] = None
                ) -> Tuple[TrainState, Optional[Dict[str, Any]], int]:
        """Restore (state, data_state, step). `state_template` provides the
        pytree structure/shardings (an initialized TrainState)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        args = {"state": ocp.args.StandardRestore(abstract)}
        # checkpoints saved via save(step, state) without data_state have no
        # 'data' item; requesting it unconditionally makes restore fail
        want_data = "data" in (self._mngr.item_metadata(step) or {})
        if want_data:
            args["data"] = ocp.args.JsonRestore()
        try:
            restored = self._mngr.restore(step, args=ocp.args.Composite(**args))
            state = restored["state"]
        except Exception as first_err:
            # train.ema_decay toggled between the save and this run: the
            # template's ema_params slot (a params-shaped tree or None)
            # doesn't match the checkpoint's. Retry with the slot flipped,
            # then adapt to the requested template: upgrading (old ckpt,
            # EMA now on) restarts the average AT the restored params
            # (create_state's init semantics, jnp.copy so no two donated
            # leaves alias one buffer); downgrading just drops the tree.
            if state_template.ema_params is None:
                alt = abstract.replace(ema_params=abstract.params)
            else:
                alt = abstract.replace(ema_params=None)
            args["state"] = ocp.args.StandardRestore(alt)
            try:
                restored = self._mngr.restore(
                    step, args=ocp.args.Composite(**args))
            except Exception:
                # the flip didn't fix it, so the failure is NOT an EMA
                # toggle (corrupt files, changed model config, ...):
                # surface the ORIGINAL error, not the retry's
                raise first_err
            state = restored["state"]
            if state_template.ema_params is None:
                state = state.replace(ema_params=None)
            else:
                state = state.replace(
                    ema_params=jax.tree.map(jax.numpy.copy, state.params))
        data_state = restored.get("data") if hasattr(restored, "get") else None
        return state, data_state, step

    def wait(self) -> None:
        """Block until in-flight async saves finish (end of training / tests)."""
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mngr.close()


def restore_variables(directory: str, step: Optional[int] = None
                      ) -> Dict[str, Any]:
    """Template-free restore of a checkpoint's model variables.

    Returns {"params", "batch_stats", "ema_params", "step"} with the SAVED
    tree structure (plain dicts of host arrays). Unlike
    `CheckpointManager.restore`, no TrainState template is required, so the
    caller's optimizer / freeze / EMA configuration does not have to match
    the source run's -- exactly the `train.init_from` warm-start case,
    where a finetune typically changes both. The caller validates the
    params tree against its own model (engine/loop.warm_start_state).
    """
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        # before constructing the manager: orbax would CREATE the missing
        # directory as a side effect of answering "is there a checkpoint?"
        raise FileNotFoundError(f"no checkpoint in {directory}")
    mngr = ocp.CheckpointManager(
        directory,
        item_handlers={"state": ocp.StandardCheckpointHandler(),
                       "data": ocp.JsonCheckpointHandler()})
    try:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
        # orbax warns that template-free StandardRestore trusts the saved
        # topology -- intended here (the warm-start caller validates the
        # tree afterwards), so keep the log signal-only
        import logging

        absl_logger = logging.getLogger("absl")
        prev_level = absl_logger.level
        absl_logger.setLevel(logging.ERROR)
        try:
            restored = mngr.restore(step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore()))
        finally:
            absl_logger.setLevel(prev_level)
        s = restored["state"]
    finally:
        mngr.close()
    return {"params": s["params"],
            "batch_stats": s.get("batch_stats") or {},
            "ema_params": s.get("ema_params"),
            "step": int(s.get("step", step))}
