"""Full train-state snapshots: params + optimizer state + schedule step.

The flagship training runs on this host are killed by axon relay wedges
(CLAUDE.md); round 4's recovery path restored only *params* and
re-initialized the optimizer from step 0 — the exact warm-restart the
transfer-gate failure was attributed to (ADVICE r4, VERDICT r4 weak #8).
A snapshot here carries everything a resume needs to continue the SAME
run: trainable/frozen param trees, the optax state (Adam moments +
schedule counts), the step counter, and caller metadata (phase, epoch,
loss history), so a wedge restarts the *step*, not the schedule.

Orbax (training/checkpoint.py) remains the general checkpoint API; this
module is a deliberately dependency-light npz writer for the training
scripts' crash-resume loop — one file, atomic replace, no directory
protocol, loadable with numpy alone.

Reference role analogue: the reference trains with transformers.Trainer
whose checkpoints also carry optimizer + scheduler state
(models/pointllm/pointllm/train/train.py:118-168 resume_from_checkpoint).

Dtype discipline: arrays are saved in their exact on-device dtypes;
np.savez represents bfloat16 as void-2, so a sidecar dtype map inside
the same npz restores it on load (bit-exact round trip, tested in
tests/test_snapshot.py).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "save_train_snapshot", "load_train_snapshot", "peek_snapshot_meta",
]


def _to_numpy(a) -> np.ndarray:
    return np.asarray(a)


def _pack(arrays: Dict[str, np.ndarray]):
    """(packed arrays dict, dtype map) — exotic 2-byte dtypes (bfloat16)
    pass through savez as void and are restored by view."""
    dtypes = {}
    packed = {}
    for k, v in arrays.items():
        v = _to_numpy(v)
        dtypes[k] = str(v.dtype)
        packed[k] = v
    return packed, dtypes


def _unpack(z, key: str, dtype_str: str) -> np.ndarray:
    v = z[key]
    if str(v.dtype) != dtype_str:
        import ml_dtypes

        v = v.view(np.dtype(getattr(ml_dtypes, dtype_str, dtype_str)))
    return v


def save_train_snapshot(
    path: str,
    state: Any,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically write a TrainState (trainer.py) + meta to ``path``.

    ``state.trainable`` / ``state.frozen`` are flat "/"-keyed dicts;
    ``state.opt_state`` is an arbitrary optax pytree saved leaf-by-index
    (restored against a freshly-inited opt_state's treedef, so the
    optimizer config must match at load time — asserted by leaf count).
    """
    import jax

    arrays: Dict[str, np.ndarray] = {}
    for k, v in state.trainable.items():
        arrays["t/" + k] = _to_numpy(v)
    for k, v in state.frozen.items():
        arrays["f/" + k] = _to_numpy(v)
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    for i, leaf in enumerate(leaves):
        arrays[f"o/{i:05d}"] = _to_numpy(leaf)
    arrays["step"] = _to_numpy(state.step)
    packed, dtypes = _pack(arrays)
    header = json.dumps(
        {"dtypes": dtypes, "n_opt_leaves": len(leaves), "meta": meta or {}}
    )
    packed["__header__"] = np.frombuffer(
        header.encode("utf-8"), dtype=np.uint8
    ).copy()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **packed)
    os.replace(tmp, path)


def peek_snapshot_meta(path: str) -> Dict[str, Any]:
    """Read only the meta dict (phase/epoch/...) without loading arrays —
    resume logic decides which optimizer template to build before paying
    for the multi-GiB load."""
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"]).decode("utf-8"))
    return header["meta"]


def load_train_snapshot(
    path: str,
    template_state: Any,
) -> Tuple[Any, Dict[str, Any]]:
    """Load a snapshot into the structure of ``template_state``.

    ``template_state`` must come from the same model/optimizer config
    (its opt_state treedef and param keys define the target structure).
    Returns (TrainState, meta dict).
    """
    import jax
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"]).decode("utf-8"))
        dtypes = header["dtypes"]
        trainable = {
            k[2:]: jnp.asarray(_unpack(z, k, dtypes[k]))
            for k in z.files if k.startswith("t/")
        }
        frozen = {
            k[2:]: jnp.asarray(_unpack(z, k, dtypes[k]))
            for k in z.files if k.startswith("f/")
        }
        opt_keys = sorted(k for k in z.files if k.startswith("o/"))
        opt_leaves = [
            jnp.asarray(_unpack(z, k, dtypes[k])) for k in opt_keys
        ]
        step = jnp.asarray(_unpack(z, "step", dtypes["step"]))

    treedef = jax.tree_util.tree_structure(template_state.opt_state)
    n_expected = len(jax.tree_util.tree_leaves(template_state.opt_state))
    assert len(opt_leaves) == n_expected, (
        f"snapshot has {len(opt_leaves)} optimizer leaves, current "
        f"optimizer expects {n_expected} — config mismatch"
    )
    assert set(trainable) == set(template_state.trainable), (
        "trainable param keys differ from the current model/freeze config"
    )
    opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    new_state = template_state.replace(
        trainable=trainable, frozen=frozen, opt_state=opt_state, step=step
    )
    return new_state, header["meta"]
