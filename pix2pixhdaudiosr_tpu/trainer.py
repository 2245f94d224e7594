"""Two-optimizer GAN training step and state.

Parity: reference train.py:127-231 — alternating Adam(lr, beta1, 0.999) steps
for G and D computed from ONE forward pass, linear LR decay after `niter`
epochs (reference models/pix2pixHD_model.py:530-539), and the
`niter_fix_global` two-phase finetune that trains only the local enhancer
first (reference models/pix2pixHD_model.py:110-126, train.py:226-227).

TPU-native: the whole step (MDCT encode -> G -> D -> losses -> both Adam
updates) is a single jitted function over a device mesh; the batch is sharded
on the `data` axis and parameters are replicated. bf16 compute with f32
params/optimizer state replaces torch.cuda.amp's GradScaler (reference
train.py:62-67) — no loss scaling is needed for bf16.

The `niter_fix_global` phase zeroes non-enhancer generator grads with fresh
Adam moments, exactly equivalent to the reference's enhancer-only optimizer;
the switch re-initializes optimizer state like the reference's new Adam
(reference models/pix2pixHD_model.py:521-528).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .config import Config
from .system import Pix2PixHDSystem


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # --adam_mu_bf16: first moment stored bf16 (memory knob for
    # beyond-flagship models, e.g. the 730M default G — config.py).
    # mu_dtype must stay static or inject_hyperparams traces it to an array.
    kw = {"mu_dtype": jnp.bfloat16} if cfg.adam_mu_bf16 else {}
    return optax.inject_hyperparams(optax.adam,
                                    static_args=("mu_dtype",))(
        learning_rate=cfg.lr, b1=cfg.beta1, b2=0.999, **kw)


def _split_params(params):
    """G-optimizer owns G and the feature encoder E (reference
    models/pix2pixHD_model.py:128-131); D-optimizer owns every discriminator."""
    g = {k: params[k] for k in ("G", "E") if k in params}
    d = {k: v for k, v in params.items() if k not in ("G", "E")}
    return g, d


def init_state(system: Pix2PixHDSystem, rng: jax.Array,
               batch: int = 1) -> Tuple[TrainState, optax.GradientTransformation,
                                        optax.GradientTransformation]:
    params = system.init_params(rng, batch=batch)
    opt_g = make_optimizer(system.cfg)
    opt_d = make_optimizer(system.cfg)
    pg, pd = _split_params(params)
    return TrainState(params=params, opt_g=opt_g.init(pg), opt_d=opt_d.init(pd),
                      step=jnp.zeros((), jnp.int32)), opt_g, opt_d


def reset_opt_g(state: TrainState, opt_g: optax.GradientTransformation,
                lr: float) -> TrainState:
    """The reference's update_fixed_params: a fresh Adam over all G params at
    the fix->finetune switch (reference models/pix2pixHD_model.py:521-528)."""
    pg, _ = _split_params(state.params)
    new = opt_g.init(pg)
    new.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_g=new)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Linear decay host hook (reference models/pix2pixHD_model.py:530-539).
    Each optimizer gets its OWN scalar array: sharing one buffer between two
    leaves of a donated train-step argument trips XLA's
    "donate the same buffer twice" check."""
    og, od = state.opt_g, state.opt_d
    og.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    od.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_g=og, opt_d=od)


def _mask_fixed_global(grads_g, n_local_enhancers: int):
    """Zero every G grad whose top module is not an enhancer branch
    (reference models/pix2pixHD_model.py:118-123 keys 'model<n>_*' ->
    our 'enh<n>_*' naming)."""
    def mask(path, leaf):
        root = path[0].key if path else ""
        if str(root) == "E":  # netE keeps training during the fix phase
            return leaf       # (reference models/pix2pixHD_model.py:128-129)
        top = path[2].key if len(path) > 2 else ""  # ('G','params',<module>,...)
        return leaf if str(top).startswith("enh") else jnp.zeros_like(leaf)
    return jax.tree_util.tree_map_with_path(mask, grads_g)


def make_train_step(system: Pix2PixHDSystem,
                    opt_g: optax.GradientTransformation,
                    opt_d: optax.GradientTransformation,
                    donate: bool = True):
    """Build the jitted train step.

    step(state, batch{label,image}, rng, pooled_fake=None) ->
        (state, losses dict, aux dict)
    Static flags: fix_global, with_visuals.
    """
    remat = system.cfg.remat_g or None

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
             pooled_fake: Optional[jnp.ndarray],
             fix_global: bool, with_visuals: bool):
        losses, grads_g, grads_d, aux = system.losses_and_grads(
            state.params, batch, rng, pooled_fake=pooled_fake,
            with_visuals=with_visuals, remat_g=remat)
        if fix_global:
            grads_g = _mask_fixed_global(grads_g, system.cfg.n_local_enhancers)
        pg, pd = _split_params(state.params)
        upd_g, new_opt_g = opt_g.update(grads_g, state.opt_g, pg)
        pg = optax.apply_updates(pg, upd_g)
        upd_d, new_opt_d = opt_d.update(grads_d, state.opt_d, pd)
        pd = optax.apply_updates(pd, upd_d)
        params = dict(pd)
        params.update(pg)
        new_state = state.replace(params=params, opt_g=new_opt_g,
                                  opt_d=new_opt_d, step=state.step + 1)
        return new_state, losses, aux

    return jax.jit(step, static_argnames=("fix_global", "with_visuals"),
                   donate_argnums=(0,) if donate else ())


def make_pool_steps(system: Pix2PixHDSystem,
                    opt_g: optax.GradientTransformation,
                    opt_d: optax.GradientTransformation):
    """Split G/D steps for pool_size > 0 (reference util/image_pool.py flow):
    g_step updates G and returns the (label, fake) pair; the host pool mixes
    history; d_step updates D against the pooled pair. The unused gradient
    branch in each step is dead-code-eliminated by XLA. Both steps must get
    the SAME rng so the mask noise (and thus lr_spec) matches."""

    def g_step(state: TrainState, batch, rng, fix_global: bool,
               with_visuals: bool):
        losses, grads_g, _, aux = system.losses_and_grads(
            state.params, batch, rng, with_visuals=with_visuals,
            remat_g=system.cfg.remat_g or None)
        if fix_global:
            grads_g = _mask_fixed_global(grads_g, system.cfg.n_local_enhancers)
        pg, _ = _split_params(state.params)
        upd_g, new_opt_g = opt_g.update(grads_g, state.opt_g, pg)
        pg = optax.apply_updates(pg, upd_g)
        params = dict(state.params)
        params.update(pg)
        return state.replace(params=params, opt_g=new_opt_g), losses, aux

    def d_step(state: TrainState, batch, rng, pooled_fake):
        # note: G params here are post-update, but the D losses only consume
        # the pooled pair / encode outputs, which depend on rng, not on G.
        losses, _, grads_d, _ = system.losses_and_grads(
            state.params, batch, rng, pooled_fake=pooled_fake)
        _, pd = _split_params(state.params)
        upd_d, new_opt_d = opt_d.update(grads_d, state.opt_d, pd)
        pd = optax.apply_updates(pd, upd_d)
        params = dict(state.params)
        params.update(pd)
        return state.replace(params=params, opt_d=new_opt_d,
                             step=state.step + 1), losses

    return (jax.jit(g_step, static_argnames=("fix_global", "with_visuals")),
            jax.jit(d_step))


def make_eval_step(system: Pix2PixHDSystem):
    """Jitted inference + waveform reconstruction used by the in-training
    eval loop (reference train.py:95-125): returns (sr_audio, sr_spectro)."""
    import numpy as np

    def step(params_g, lr_audio, rng):
        sr_spec, lr_pha, lr_norm, lr_spec = system.inference(params_g, lr_audio, rng)
        sr_audio = system.codec.imdct_eval(sr_spec, lr_pha, lr_norm, rng=rng)
        sr_audio = np.sqrt(system.cfg.up_ratio - 1).astype(np.float32) * sr_audio
        return sr_audio, sr_spec

    return jax.jit(step)
