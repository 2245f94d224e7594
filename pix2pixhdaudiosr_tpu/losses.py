"""GAN objectives.

Parity: GANLoss (LSGAN MSE / vanilla BCE over multiscale nested outputs,
reference models/networks.py:68-110), discriminator feature matching
(reference models/pix2pixHD_model.py:390-398), and the frame-overlap match
loss (reference models/pix2pixHD_model.py:405-415).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def _single_gan_loss(pred: jnp.ndarray, target_is_real: bool,
                     use_lsgan: bool) -> jnp.ndarray:
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if use_lsgan:
        return jnp.mean((pred - target) ** 2)
    eps = 1e-7
    p = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def gan_loss(preds: Sequence[Sequence[jnp.ndarray]], target_is_real: bool,
             use_lsgan: bool = True) -> jnp.ndarray:
    """Sum of per-scale losses on each scale's final score map
    (reference models/networks.py:100-110)."""
    loss = 0.0
    for scale in preds:
        loss = loss + _single_gan_loss(scale[-1], target_is_real, use_lsgan)
    return loss


def feature_matching_loss(pred_fake: Sequence[Sequence[jnp.ndarray]],
                          pred_real: Sequence[Sequence[jnp.ndarray]],
                          n_layers_d: int, num_d: int,
                          lambda_feat: float) -> jnp.ndarray:
    """L1 over D intermediates, weights 4/(n_layers+1) * 1/num_D * lambda
    (reference models/pix2pixHD_model.py:393-398). pred_real is treated as a
    constant target by the caller (stop_gradient there)."""
    feat_w = 4.0 / (n_layers_d + 1)
    d_w = 1.0 / num_d
    loss = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            l1 = jnp.mean(jnp.abs(pred_fake[i][j].astype(jnp.float32)
                                  - pred_real[i][j].astype(jnp.float32)))
            loss = loss + d_w * feat_w * l1 * lambda_feat
    return loss


def match_loss(sr_frames: jnp.ndarray, window: jnp.ndarray, win_length: int,
               lambda_mat: float) -> jnp.ndarray:
    """Overlap-consistency MSE between the second half of frame t and the
    first half of frame t+1, each re-windowed
    (reference models/pix2pixHD_model.py:410-415). sr_frames: [B, T, n_fft]."""
    half = win_length // 2
    w = window.astype(sr_frames.dtype)
    a = sr_frames[..., :-1, half:win_length] * w[:half]
    b = sr_frames[..., 1:, :half] * w[half:win_length]
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2) * lambda_mat


LOSS_NAMES = ("G_GAN", "G_GAN_Feat", "G_VGG", "G_mat", "G_GAN_t",
              "D_real_t", "D_fake_t", "D_real", "D_fake")


def loss_filter_flags(use_gan_feat_loss: bool, use_vgg_loss: bool,
                      use_match_loss: bool, use_time_loss: bool):
    """init_loss_filter parity (reference models/pix2pixHD_model.py:19-23)."""
    return (True, use_gan_feat_loss, use_vgg_loss, use_match_loss,
            use_time_loss, use_time_loss, use_time_loss, True, True)


def filter_losses(losses: dict, flags) -> dict:
    return {n: losses[n] for n, f in zip(LOSS_NAMES, flags) if f}
