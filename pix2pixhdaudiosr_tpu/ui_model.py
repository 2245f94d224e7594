"""Interactive label-map editing session (legacy pix2pixHD editor).

Parity: reference models/ui_model.py:11-346 — the upstream image-editing
model kept by the reference but unused for audio (the factory only reaches it
when --model != pix2pixHD, reference models/models.py:10-12). Capabilities
reproduced: load label/instance maps, region relabeling (change_labels),
stroke painting (add_strokes), object stamping (add_objects), undo/reset
with state backup, and generator forwards on the edited maps. Feature-cluster
styling hooks mirror sample/encode_features on the system model.

Host-side numpy editing + jitted generator forward (editing is interactive
and tiny; only the forward belongs on the TPU).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .system import Pix2PixHDSystem


class UIModel:
    def name(self) -> str:
        return "UIModel"

    def initialize(self, cfg: Config, params_g=None):
        self.cfg = cfg
        self.system = Pix2PixHDSystem(cfg.replace(is_train=False))
        self.params_g = params_g
        self._undo_stack: List[Tuple[np.ndarray, np.ndarray]] = []
        self.label_map: Optional[np.ndarray] = None
        self.inst_map: Optional[np.ndarray] = None
        self._fwd = jax.jit(lambda p, x: self.system.netG.apply(
            p, x.astype(self.system.dtype)).astype(jnp.float32))

    # ------------------------------------------------------------------
    def load_maps(self, label_map: np.ndarray, inst_map: Optional[np.ndarray] = None):
        """reference models/ui_model.py:41-89 (file IO left to the caller)."""
        self.label_map = np.asarray(label_map).copy()
        self.inst_map = (np.asarray(inst_map).copy() if inst_map is not None
                         else np.zeros_like(self.label_map))
        self._original = (self.label_map.copy(), self.inst_map.copy())
        self._undo_stack = []

    def reset(self):
        """reference models/ui_model.py:91-97."""
        self.label_map, self.inst_map = (a.copy() for a in self._original)
        self._undo_stack = []

    def backup_current_state(self):
        """reference models/ui_model.py:286-291."""
        self._undo_stack.append((self.label_map.copy(), self.inst_map.copy()))

    def undo(self):
        """reference models/ui_model.py:99-106."""
        if self._undo_stack:
            self.label_map, self.inst_map = self._undo_stack.pop()

    # ------------------------------------------------------------------
    def change_labels(self, click_src: Tuple[int, int], click_tgt: Tuple[int, int]):
        """Relabel the clicked instance region to the target pixel's label
        (reference models/ui_model.py:117-150)."""
        self.backup_current_state()
        src_inst = self.inst_map[click_src]
        tgt_label = self.label_map[click_tgt]
        tgt_inst = self.inst_map[click_tgt]
        mask = self.inst_map == src_inst
        self.label_map[mask] = tgt_label
        self.inst_map[mask] = tgt_inst

    def add_strokes(self, click_src: Tuple[int, int], label_tgt: int, bw: int,
                    save: bool = True):
        """Paint a (2bw+1)^2 square stroke (reference models/ui_model.py:152-188)."""
        if save:
            self.backup_current_state()
        y, x = click_src
        h, w = self.label_map.shape[-2:]
        ys, ye = max(0, y - bw), min(h, y + bw + 1)
        xs, xe = max(0, x - bw), min(w, x + bw + 1)
        self.label_map[..., ys:ye, xs:xe] = label_tgt
        self.inst_map[..., ys:ye, xs:xe] = label_tgt

    def add_objects(self, click_src: Tuple[int, int], label_tgt: int,
                    mask: np.ndarray, style_id: int = 0):
        """Stamp an object mask at the click point (reference
        models/ui_model.py:190-213)."""
        self.backup_current_state()
        y, x = click_src
        mh, mw = mask.shape
        h, w = self.label_map.shape[-2:]
        ye, xe = min(h, y + mh), min(w, x + mw)
        region = mask[: ye - y, : xe - x] > 0
        self.label_map[..., y:ye, x:xe][region] = label_tgt
        self.inst_map[..., y:ye, x:xe][region] = label_tgt

    # ------------------------------------------------------------------
    def single_forward(self, net_input: np.ndarray) -> np.ndarray:
        """Generator forward on an edited input (reference
        models/ui_model.py:215-223). net_input: [B, H, W, C]."""
        assert self.params_g is not None, "load generator params first"
        return np.asarray(self._fwd(self.params_g, jnp.asarray(net_input)))

    def get_current_visuals(self):
        """reference models/ui_model.py:336-346."""
        return {"label": None if self.label_map is None else self.label_map.copy(),
                "inst": None if self.inst_map is None else self.inst_map.copy()}


def get_edges(t: np.ndarray) -> np.ndarray:
    """Instance-boundary map (reference models/pix2pixHD_model.py:500-509):
    1 where an instance id differs from a 4-neighbour. t: [..., H, W] ints."""
    edge = np.zeros_like(t, dtype=bool)
    edge[..., :, 1:] |= t[..., :, 1:] != t[..., :, :-1]
    edge[..., :, :-1] |= t[..., :, 1:] != t[..., :, :-1]
    edge[..., 1:, :] |= t[..., 1:, :] != t[..., :-1, :]
    edge[..., :-1, :] |= t[..., 1:, :] != t[..., :-1, :]
    return edge.astype(np.float32)


class InferenceModel(Pix2PixHDSystem):
    """reference models/pix2pixHD_model.py:566-569."""

    def __call__(self, params_g, lr_audio, rng):
        return self.inference(params_g, lr_audio, rng)


def create_model(cfg: Config):
    """Factory parity (reference models/models.py:3-20). Data parallelism is
    a mesh property here, not a module wrapper."""
    if cfg.model == "pix2pixHD":
        return Pix2PixHDSystem(cfg) if cfg.is_train else InferenceModel(cfg)
    model = UIModel()
    model.initialize(cfg)
    return model
