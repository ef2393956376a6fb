"""Checkpoint saving / loading.

TPU-native re-design of the reference `Saver`
(`/root/reference/vsrd/utils.py:191-198` + scripts/main.py:1109-1121):
pytrees of jax arrays serialized as compressed ``.npz`` with a JSON tree
spec — dependency-free, safe to load (no pickle), and trivially
readable by the pseudo-label tools. Frame-granular idempotency (the
reference's whole fault-tolerance story, main.py:134-136) is
`has_final_checkpoint`.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for key, value in tree.items():
            flat.update(_flatten(value, f"{prefix}{key}/"))
    elif isinstance(tree, (list, tuple)):
        for index, value in enumerate(tree):
            flat.update(_flatten(value, f"{prefix}{index}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _spec_of(tree):
    if isinstance(tree, dict):
        return {k: _spec_of(v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return {"__tuple__": [_spec_of(v) for v in tree]}
    if isinstance(tree, list):
        return {"__list__": [_spec_of(v) for v in tree]}
    return None


def _unflatten(spec, flat, prefix=""):
    if spec is None:
        return flat[prefix[:-1]]
    if "__tuple__" in spec:
        return tuple(
            _unflatten(s, flat, f"{prefix}{i}/")
            for i, s in enumerate(spec["__tuple__"])
        )
    if "__list__" in spec:
        return [
            _unflatten(s, flat, f"{prefix}{i}/")
            for i, s in enumerate(spec["__list__"])
        ]
    return {
        k: _unflatten(s, flat, f"{prefix}{k}/") for k, s in spec.items()
    }


def save_checkpoint(filename: str, tree) -> None:
    """Write a pytree (dicts/lists/tuples of arrays) to ``.npz``.

    Atomic: written to a sibling temp file then ``os.replace``d, so a
    preemption mid-write never leaves a truncated checkpoint behind —
    load-bearing for the driver's mid-frame resume, which reads the
    latest ``step_*.npz`` on restart."""
    tree = jax.device_get(tree)
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    tmp = filename + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(
            fh, __spec__=json.dumps(_spec_of(tree)), **flat
        )
    os.replace(tmp, filename)


def load_checkpoint(filename: str):
    with np.load(filename, allow_pickle=False) as data:
        spec = json.loads(str(data["__spec__"]))
        flat = {k: data[k] for k in data.files if k != "__spec__"}
    return _unflatten(spec, flat)


class Saver:
    """Directory-scoped checkpoint writer (reference utils.py:191-198)."""

    def __init__(self, dirname: str):
        self.dirname = dirname

    def path(self, filename: str) -> str:
        return os.path.join(self.dirname, filename)

    def save(self, filename: str, **entries) -> str:
        path = self.path(filename)
        save_checkpoint(path if path.endswith(".npz") else path + ".npz", entries)
        return path

    def load(self, filename: str):
        path = self.path(filename)
        return load_checkpoint(path if path.endswith(".npz") else path + ".npz")

    def exists(self, filename: str) -> bool:
        path = self.path(filename)
        return os.path.exists(path if path.endswith(".npz") else path + ".npz")


def has_final_checkpoint(ckpt_dirname: str, num_steps: int) -> bool:
    """Frame already optimized? (reference main.py:134-136)."""
    return os.path.exists(
        os.path.join(ckpt_dirname, f"step_{num_steps - 1}.npz")
    )
