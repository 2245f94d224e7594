"""Checkpointing with `latest`/per-epoch tags, tolerant partial restore, and
the iter.txt resume cursor.

Parity: reference models/base_model.py:43-89 (per-net `{tag}_net_X.pth`
state dicts; loader merges only shape-matching keys on architecture drift),
reference train.py:30-40, :200-223 (iter.txt epoch/iter cursor, `latest` +
per-epoch tags, --continue_train / --load_pretrain).

TPU-native: one Orbax checkpoint per tag holding the full TrainState pytree
(params for every net + BOTH optimizer states + step — the reference loses
optimizer state on resume; we keep it, and partial restore still allows
reference-style warm starts across architectures).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def merge_matching(target, saved):
    """Tolerant merge: take the saved leaf wherever the path exists in both
    trees and shapes match (reference models/base_model.py:62-89).

    `saved` comes from a raw Orbax restore (nested dicts; tuples serialized
    either as sequences or as {"0": ...} dicts), while `target` is a live
    pytree that may contain dataclasses (TrainState), (named)tuples (optax
    states) and lists — every container kind must be descended, else the
    merge silently returns the fresh target. That exact bug shipped in
    round 1: the top-level TrainState never matched `isinstance(t, dict)`,
    so --continue_train/--load_pretrain/generate restored NOTHING while the
    roundtrip tests compared zero-initialized bias leaves that are equal in
    any init (regression-tested in tests/test_checkpoint.py)."""

    def _seq(t, items):
        vals = [_merge(a, b) for a, b in zip(t, items)]
        if hasattr(t, "_fields"):              # namedtuple (optax states)
            return type(t)(*vals)
        return type(t)(vals) if isinstance(t, list) else tuple(vals)

    def _merge(t, s):
        if dataclasses.is_dataclass(t) and not isinstance(t, type) \
                and isinstance(s, dict):
            kw = {f.name: _merge(getattr(t, f.name), s[f.name])
                  for f in dataclasses.fields(t) if f.name in s}
            try:
                return t.replace(**kw)         # flax.struct.PyTreeNode
            except AttributeError:
                return dataclasses.replace(t, **kw)
        if isinstance(t, (tuple, list)):
            if isinstance(s, (tuple, list)) and len(s) == len(t):
                return _seq(t, s)
            if isinstance(s, dict):
                if all(str(i) in s for i in range(len(t))):
                    return _seq(t, [s[str(i)] for i in range(len(t))])
                if hasattr(t, "_fields") and all(f in s for f in t._fields):
                    return _seq(t, [s[f] for f in t._fields])
            return t
        if isinstance(t, dict) and isinstance(s, dict):
            return {k: _merge(t[k], s[k]) if k in s else t[k] for k in t}
        t_shape = getattr(t, "shape", None)
        s_shape = getattr(s, "shape", None)
        if t_shape is not None and s_shape is not None and tuple(t_shape) == tuple(s_shape):
            dtype = getattr(t, "dtype", None)
            arr = np.asarray(s)
            return arr.astype(dtype) if dtype is not None else arr
        return t
    return _merge(target, saved)


class CheckpointManager:
    def __init__(self, expr_dir: str):
        self.expr_dir = os.path.abspath(expr_dir)
        os.makedirs(self.expr_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._raw = ocp.PyTreeCheckpointer()

    def _path(self, tag) -> str:
        return os.path.join(self.expr_dir, f"{tag}_state")

    # ------------------------------------------------------------------
    def save(self, state: Any, tag: str = "latest") -> str:
        path = self._path(tag)
        state = jax.device_get(state)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, tag: str = "latest", target: Optional[Any] = None,
                expr_dir: Optional[str] = None) -> Any:
        """Full restore when `target` matches; otherwise tolerant merge of
        every shape-matching leaf into `target`."""
        base = os.path.abspath(expr_dir) if expr_dir else self.expr_dir
        path = os.path.join(base, f"{tag}_state")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        saved = self._raw.restore(path)
        if target is None:
            return saved
        return jax.tree.map(lambda t: t, merge_matching(target, saved))

    def has(self, tag: str = "latest", expr_dir: Optional[str] = None) -> bool:
        base = os.path.abspath(expr_dir) if expr_dir else self.expr_dir
        return os.path.exists(os.path.join(base, f"{tag}_state"))

    # ------------------------------------------------------------------
    def save_iter(self, epoch: int, epoch_iter: int) -> None:
        with open(os.path.join(self.expr_dir, "iter.txt"), "w") as f:
            f.write(f"{epoch},{epoch_iter}\n")

    def load_iter(self) -> Tuple[int, int]:
        try:
            with open(os.path.join(self.expr_dir, "iter.txt")) as f:
                a, b = f.read().strip().split(",")
            return int(a), int(b)
        except Exception:
            return 1, 0
