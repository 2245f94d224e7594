"""Spectrogram / histogram / phase renders for the HTML gallery.

Parity: reference util/spectro_img.py:9-27 (matplotlib pcolormesh with
'PuBu_r', 100-bin histogram, 'cool' phase map). Uses imshow instead of
pcolormesh (same pixels, far faster) and the Agg backend.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _fig2img(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def compute_visuals(sp: Optional[np.ndarray] = None,
                    pha: Optional[np.ndarray] = None,
                    abs: bool = False) -> Tuple[Optional[np.ndarray],
                                                Optional[np.ndarray],
                                                Optional[np.ndarray]]:
    sp_spectro = sp_hist = pha_img = None
    if sp is not None:
        fig, ax = plt.subplots()
        ax.imshow(np.abs(sp) if abs else sp, cmap="PuBu_r", origin="lower",
                  aspect="auto")
        sp_spectro = _fig2img(fig)
        fig2, ax2 = plt.subplots()
        ax2.hist(np.asarray(sp).reshape(-1), bins=100)
        sp_hist = _fig2img(fig2)
    if pha is not None:
        fig3, ax3 = plt.subplots()
        ax3.imshow(pha, cmap="cool", origin="lower", aspect="auto")
        pha_img = _fig2img(fig3)
    plt.close("all")
    return sp_spectro, sp_hist, pha_img
