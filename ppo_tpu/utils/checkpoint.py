"""Checkpointing: params + optimizer + env-normalizer state + RNG + iteration.

Replaces the reference's per-iteration `torch::save(agent/optimizer)` with
stale-file cleanup (ppo_continuous_action.cpp:173-180, 545-563) and fixes its
documented gap (ppo...cpp:595-599): normalization-wrapper statistics and RNG
keys are part of the checkpoint, so eval/resume see the exact training state.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import jax
from flax import serialization


_LATEST_RE = re.compile(r"state_latest_(\d{9})\.msgpack$")


def _to_host(state):
    """Full host copy of a (possibly multi-process-sharded) state pytree.

    Single-process: plain device_get. Under jax.distributed, arrays sharded
    over other processes' devices are not locally fetchable, so every process
    allgathers the global value (cheap at this model scale) and process 0
    writes — the rank-0 checkpoint semantics of the reference
    (ac_ppo_continuous_action.cpp:904-926).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(state, tiled=True)
    return jax.device_get(state)


def _is_writer() -> bool:
    return jax.process_index() == 0


def save_state(state, folder: str | os.PathLike, iteration: int, keep_old: bool = False):
    folder = Path(folder)
    host = _to_host(state)  # collective: every process must participate
    path = folder / f"state_latest_{iteration:09d}.msgpack"
    if not _is_writer():
        return path
    data = serialization.to_bytes(host)
    folder.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)
    if not keep_old:
        for f in folder.iterdir():
            m = _LATEST_RE.search(f.name)
            if m and int(m.group(1)) != iteration:
                f.unlink()
    return path


def save_final(state, folder: str | os.PathLike):
    folder = Path(folder)
    host = _to_host(state)  # collective: every process must participate
    path = folder / "state_final.msgpack"
    if _is_writer():
        folder.mkdir(parents=True, exist_ok=True)
        path.write_bytes(serialization.to_bytes(host))
    return path


def save_best(state, folder: str | os.PathLike):
    folder = Path(folder)
    host = _to_host(state)  # collective: every process must participate
    path = folder / "state_best.msgpack"
    if _is_writer():
        folder.mkdir(parents=True, exist_ok=True)
        path.write_bytes(serialization.to_bytes(host))
    return path


def latest_checkpoint(folder: str | os.PathLike):
    """(path, iteration) of the newest state_latest file, or (None, -1)."""
    folder = Path(folder)
    best, best_it = None, -1
    if folder.is_dir():
        for f in folder.iterdir():
            m = _LATEST_RE.search(f.name)
            if m and int(m.group(1)) > best_it:
                best, best_it = f, int(m.group(1))
    return best, best_it


def restore_state(path: str | os.PathLike, target):
    """Restore into a template pytree with the same structure.

    Fields present in the template but absent from the file (e.g. state added
    in a newer engine version) keep their template values, so old checkpoints
    stay loadable.
    """
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    tmpl = serialization.to_state_dict(target)
    missing: list[str] = []

    def merge(t, r, prefix=""):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if isinstance(r, dict) and k in r:
                    out[k] = merge(v, r[k], f"{prefix}/{k}")
                else:
                    missing.append(f"{prefix}/{k}")
                    out[k] = v
            return out
        return r if r is not None else t

    merged = merge(tmpl, raw)
    if missing:
        shown = ", ".join(missing[:8]) + (" ..." if len(missing) > 8 else "")
        print(
            f"[checkpoint] WARNING: {len(missing)} field(s) absent from {path}; "
            f"keeping template values for: {shown}"
        )
    return serialization.from_state_dict(target, merged)


def resolve_checkpoint(path: str | os.PathLike):
    """(path, iteration) from a checkpoint file or a run folder.

    Mirrors the reference's resume entry (ac_ppo_carla.cpp:226-255): a file
    path has its iteration parsed from the `state_latest_%09d` filename
    (0 for state_final/state_best); a folder resolves to its newest
    state_latest file. Returns (None, -1) if nothing is found.
    """
    p = Path(path)
    if p.is_file():
        m = _LATEST_RE.search(p.name)
        return p, int(m.group(1)) if m else 0
    best, best_it = latest_checkpoint(p)
    if best is None:
        # checkpoint_every=0 runs keep only the end-of-training state
        # (model_final.pth analogue, ppo_continuous_action.cpp:587): fall
        # back to state_final, then state_best
        for name in ("state_final.msgpack", "state_best.msgpack"):
            f = p / name
            if f.is_file():
                return f, 0
    return best, best_it
