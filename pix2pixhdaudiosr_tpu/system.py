"""The Pix2PixHD audio-SR GAN system.

Parity: reference models/pix2pixHD_model.py:15-569 — network construction,
input encoding, the full 9-loss GAN forward (LSGAN + feature matching +
match loss + optional time-domain discriminators), and inference — plus
reference models/models.py:3-20 (factory).

TPU-first structure: instead of autograd + two zero_grad/step passes
(reference train.py:162-184), the whole step is one pure function:
  1. one generator forward captured with jax.vjp,
  2. generator losses differentiated w.r.t. the generator OUTPUT, pulled back
     through the saved vjp (G runs forward exactly once),
  3. discriminator losses differentiated w.r.t. discriminator params with the
     generator output stop-gradiented (the reference's .detach()).
Identical discriminator forwards between the two phases are CSE'd by XLA.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .losses import (LOSS_NAMES, feature_matching_loss, filter_losses,
                     gan_loss, loss_filter_flags, match_loss)
from .models.discriminator import build_discriminator
from .models.generator import build_generator
from .models.hifigan_d import HiFiGANMultiScaleMultiPeriodDiscriminator
from .ops.audio import amplitude_to_db
from .ops.encoding import CodecConfig, SpectroCodec

Params = Dict[str, Any]


def _maybe_remat(fn, remat: Optional[str]):
    """Wrap a forward in jax.checkpoint per the remat_g mode (see
    losses_and_grads)."""
    if remat is None:
        return fn
    if remat == "full":
        return jax.checkpoint(fn)
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_saveable)
    raise ValueError(f"unknown remat mode: {remat!r}")


class Pix2PixHDSystem:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.codec = SpectroCodec(CodecConfig(
            n_fft=cfg.n_fft, hop_length=cfg.hop_length,
            win_length=cfg.win_length, center=cfg.center,
            segment_length=cfg.segment_length, up_ratio=cfg.up_ratio,
            alpha=cfg.alpha, min_value=cfg.min_value,
            explicit_encoding=cfg.explicit_encoding, mask_mode=cfg.mask_mode,
            phase_encoding_mode=cfg.phase_encoding_mode))
        self.dtype = jnp.dtype(cfg.compute_dtype)

        self.netG = build_generator(
            cfg.net_g, cfg.netg_input_nc, cfg.output_nc, cfg.ngf,
            cfg.n_downsample_global, cfg.n_blocks_global,
            cfg.n_local_enhancers, cfg.n_blocks_local, dtype=self.dtype,
            fast_conv=cfg.fast_conv,
            deconv_impl="torch" if cfg.torch_deconv else None)
        # Inference twin: identical param tree; optional Pallas-fused
        # enhancer resblocks and/or int8-MXU trunk resblocks (no vjp —
        # training keeps the XLA formulation above).
        self.netG_infer = build_generator(
            cfg.net_g, cfg.netg_input_nc, cfg.output_nc, cfg.ngf,
            cfg.n_downsample_global, cfg.n_blocks_global,
            cfg.n_local_enhancers, cfg.n_blocks_local, dtype=self.dtype,
            fast_conv=cfg.fast_conv,
            fused_enh_blocks=cfg.fused_enhancer,
            int8_trunk=cfg.int8_trunk,
            deconv_impl="torch" if cfg.torch_deconv else None) \
            if ((cfg.fused_enhancer or cfg.int8_trunk)
                and cfg.net_g in ("local", "global")) else self.netG
        self.netD = build_discriminator(
            cfg.netd_input_nc, cfg.ndf, cfg.n_layers_d,
            use_sigmoid=cfg.no_lsgan, num_d=cfg.num_d,
            get_interm_feat=not cfg.no_gan_feat_loss, dtype=self.dtype)
        self.time_D = build_discriminator(
            2, cfg.ndf, cfg.n_layers_d, use_sigmoid=cfg.no_lsgan,
            num_d=cfg.num_d, get_interm_feat=False, dtype=self.dtype) \
            if cfg.use_time_d else None
        self.hifigan_D = HiFiGANMultiScaleMultiPeriodDiscriminator(
            periods=tuple(int(p) for p in
                          str(cfg.hifigan_periods).split(",") if p),
            n_scales=cfg.hifigan_scales, dtype=self.dtype) \
            if cfg.use_hifigan_d else None
        # instance-feature encoder (reference models/pix2pixHD_model.py:67-70;
        # effectively deprecated for audio but part of the API surface)
        self.netE = build_generator(
            "encoder", cfg.output_nc, cfg.feat_num, cfg.nef,
            cfg.n_downsample_e, 0, 0, 0, dtype=self.dtype) \
            if cfg.use_features and not cfg.load_features else None

        # loss filter (reference models/pix2pixHD_model.py:19-23, :96)
        self.flags = loss_filter_flags(not cfg.no_gan_feat_loss,
                                       not cfg.no_vgg_loss, cfg.use_match_loss,
                                       cfg.use_hifigan_d or cfg.use_time_d)
        self.loss_names = [n for n, f in zip(LOSS_NAMES, self.flags) if f]

    # ------------------------------------------------------------------
    @staticmethod
    def frames_for(seg: int, hop: int, win: int, center: bool) -> int:
        """Frame count of a `seg`-sample signal under the reference pad rule
        (reference models/mdct.py:379-391) — the ONE implementation; used by
        n_frames and by generate.cp_generate's full-file padding."""
        start = hop if center else 0
        extra = seg % hop
        end = start + (hop - extra if extra else 0)
        L = seg + start + end
        return (L - win) // hop + 1

    @property
    def n_frames(self) -> int:
        """Frame count of one segment: 128 for the default config."""
        return self.frames_for(self.cfg.segment_length, self.cfg.hop_length,
                               self.cfg.win_length, self.cfg.center)

    def spectro_shape(self, batch: int) -> Tuple[int, int, int, int]:
        c = 2 if self.cfg.explicit_encoding else 1
        cfg = self.cfg
        stride = 2 ** cfg.n_downsample_global
        if cfg.net_g == "local":
            stride *= 2 ** cfg.n_local_enhancers
        if self.n_frames % stride:
            raise ValueError(
                f"segment_length {cfg.segment_length} gives {self.n_frames} "
                f"frames, not divisible by the generator stride {stride}; "
                f"pick segment_length = (16k-1)*hop like the default "
                f"(reference options/audio_config.py BINS%16==0 invariant)")
        return (batch, cfg.n_fft, self.n_frames, c)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, batch: int = 1) -> Params:
        cfg = self.cfg
        kg, kd, kt, kh = jax.random.split(rng, 4)
        spec = jnp.zeros(self.spectro_shape(batch), jnp.float32)
        base = spec if cfg.no_instance else jnp.concatenate(
            [spec, jnp.zeros(spec.shape[:-1] + (1,), jnp.float32)], -1)
        g_in = base
        if cfg.use_features:  # encoder feature channels on the G input only
            # (D sees the raw label spectrogram, reference
            # models/pix2pixHD_model.py:345-351)
            g_in = jnp.concatenate(
                [base, jnp.zeros(spec.shape[:-1] + (cfg.feat_num,), jnp.float32)], -1)
        params = {"G": self.netG.init(kg, g_in)}
        d_in = jnp.concatenate([base, jnp.zeros(self.spectro_shape(batch), jnp.float32)], -1)
        params["D"] = self.netD.init(kd, d_in)
        if self.time_D is not None:
            frames = jnp.zeros((batch, self.n_frames, cfg.n_fft, 2), jnp.float32)
            params["time_D"] = self.time_D.init(kt, frames)
        if self.hifigan_D is not None:
            wav = jnp.zeros((batch, cfg.segment_length, 1), jnp.float32)
            params["hifigan_D"] = self.hifigan_D.init(kh, wav)
        if self.netE is not None:
            ke = jax.random.fold_in(kg, 17)
            espec = jnp.zeros(self.spectro_shape(batch), jnp.float32)
            einst = jnp.zeros(espec.shape[:-1] + (1,), jnp.int32)
            params["E"] = self.netE.init(ke, espec, einst)
        return params

    # ------------------------------------------------------------------
    def encode_input(self, lr_audio, hr_audio, rng,
                     inst: Optional[jnp.ndarray] = None):
        """reference models/pix2pixHD_model.py:260-302: hr unmasked, lr always
        masked; both are constants w.r.t. params (torch no_grad)."""
        k_lr, k_hr = jax.random.split(rng)
        need_frames = self.cfg.use_time_d
        lr_spec, lr_pha, lr_norm = self.codec.to_spectro(
            lr_audio, rng=k_lr, mask=True, return_frames=need_frames)
        if hr_audio is not None:
            hr_spec, hr_pha, hr_norm = self.codec.to_spectro(
                hr_audio, rng=k_hr, mask=False, return_frames=need_frames)
        else:
            hr_spec = hr_pha = hr_norm = None
        if not self.cfg.no_instance and inst is not None:
            lr_spec = jnp.concatenate([lr_spec, inst], axis=-1)
        return lr_spec, lr_pha, lr_norm, hr_spec, hr_pha, hr_norm

    def _d_apply(self, pd, label_spec, image_spec):
        x = jnp.concatenate([label_spec, image_spec], axis=-1).astype(self.dtype)
        return self.netD.apply(pd, x)

    def _time_frames(self, spec, norm):
        """sqrt(up-1) * window * to_frames (reference
        models/pix2pixHD_model.py:376): [B, T, n_fft]."""
        f = self.codec.to_frames(spec, norm)
        w = jnp.asarray(self.codec.window, f.dtype)
        return np.sqrt(self.cfg.up_ratio - 1).astype(np.float32) * w * f

    def _time_d_apply(self, pt, label_frames, test_frames):
        """reference models/pix2pixHD_model.py:314-320: dB of |frames|, concat
        on channels."""
        mv = self.cfg.min_value
        a = amplitude_to_db(jnp.abs(label_frames), 20.0, mv, 1.0)
        b = amplitude_to_db(jnp.abs(test_frames), 20.0, mv, 1.0)
        x = jnp.stack([a, b], axis=-1).astype(self.dtype)  # [B,T,n_fft,2]
        return self.time_D.apply(pt, x)

    # ------------------------------------------------------------------
    def losses_and_grads(self, params: Params, batch: Dict[str, jnp.ndarray],
                         rng: jax.Array,
                         pooled_fake: Optional[jnp.ndarray] = None,
                         with_visuals: bool = False,
                         remat_g: Optional[str] = None):
        """One full GAN step's losses and grads
        (reference models/pix2pixHD_model.py:331-435 + train.py:147-184).

        remat_g: rematerialize the G forward in the backward pass instead of
        stashing activations — None (off), "full" (jax.checkpoint), or
        "dots" (checkpoint_policies.dots_saveable: keep MXU outputs,
        recompute elementwise/norm). Measured on v5e in
        benchmarks/remat_experiment.py; a memory/speed trade knob for
        larger-than-flagship models.
        """
        cfg = self.cfg
        use_lsgan = not cfg.no_lsgan
        k_enc, k_g, k_d = jax.random.split(rng, 3)
        lr_spec, lr_pha, lr_norm, hr_spec, hr_pha, hr_norm = self.encode_input(
            batch["label"], batch["image"], k_enc, batch.get("inst"))
        lr_spec = jax.lax.stop_gradient(lr_spec)
        hr_spec = jax.lax.stop_gradient(hr_spec)

        # --- generator forward, captured once. With instance features the
        # encoder output concatenates onto the G input (reference
        # models/pix2pixHD_model.py:338-347; lr_pha stands in for the
        # instance map, shifted to non-negative ids for the pooling)
        if self.netE is not None:
            def g_fwd(ge):
                pg, pe = ge
                ids = (lr_pha[..., None] + 1.0).astype(jnp.int32)
                feat = self.netE.apply(pe, hr_spec.astype(self.dtype), ids)
                gin = jnp.concatenate([lr_spec.astype(self.dtype),
                                       feat.astype(self.dtype)], axis=-1)
                return self.netG.apply(pg, gin).astype(jnp.float32)

            sr, g_vjp_e = jax.vjp(_maybe_remat(g_fwd, remat_g),
                                  (params["G"], params["E"]))
        else:
            def g_fwd(pg):
                out = self.netG.apply(pg, lr_spec.astype(self.dtype))
                return out.astype(jnp.float32)

            sr, g_vjp = jax.vjp(_maybe_remat(g_fwd, remat_g), params["G"])

        # --- generator-side losses as a function of the G output
        def g_losses(sr_):
            parts = {}
            pred_fake = self._d_apply(params["D"], lr_spec, sr_)
            parts["G_GAN"] = gan_loss(pred_fake, True, use_lsgan)
            parts["G_GAN_Feat"] = jnp.float32(0)
            if not cfg.no_gan_feat_loss:
                pred_real = jax.lax.stop_gradient(
                    self._d_apply(params["D"], lr_spec, hr_spec))
                parts["G_GAN_Feat"] = feature_matching_loss(
                    pred_fake, pred_real, cfg.n_layers_d, cfg.num_d,
                    cfg.lambda_feat)
            parts["G_VGG"] = jnp.float32(0)  # disabled for audio (reference :400-403)
            parts["G_mat"] = jnp.float32(0)
            if cfg.explicit_encoding and cfg.use_match_loss:
                sr_frames = self.codec.to_frames(sr_, lr_norm)
                parts["G_mat"] = match_loss(sr_frames,
                                            jnp.asarray(self.codec.window, jnp.float32),
                                            cfg.win_length, cfg.lambda_mat)
            parts["G_GAN_t"] = jnp.float32(0)
            if cfg.use_time_d:
                sr_frames_t = self._time_frames(sr_, lr_norm)
                pred = self._time_d_apply(params["time_D"],
                                          lr_norm["frames"], sr_frames_t)
                parts["G_GAN_t"] = parts["G_GAN_t"] + \
                    gan_loss(pred, True, use_lsgan) * cfg.lambda_time
            if cfg.use_hifigan_d:
                wav = self.codec.to_audio(sr_, lr_norm, pha=lr_pha, rng=k_g)
                pred = self.hifigan_D.apply(params["hifigan_D"],
                                            wav[..., None].astype(self.dtype))
                parts["G_GAN_t"] = parts["G_GAN_t"] + \
                    gan_loss(pred, True, use_lsgan) * cfg.lambda_time
            total = parts["G_GAN"] + parts["G_mat"] + parts["G_GAN_Feat"] \
                + parts["G_VGG"] + parts["G_GAN_t"]
            return total, parts

        (_, g_parts), sr_bar = jax.value_and_grad(g_losses, has_aux=True)(sr)
        if self.netE is not None:
            gg, ge = g_vjp_e(sr_bar)[0]
            # the G optimizer also trains E (reference
            # models/pix2pixHD_model.py:128-131)
            grads_g = {"G": gg, "E": ge}
        else:
            grads_g = {"G": g_vjp(sr_bar)[0]}

        # --- discriminator-side losses (G output detached, reference :307)
        sr_d = jax.lax.stop_gradient(sr)
        d_params = {k: v for k, v in params.items() if k not in ("G", "E")}

        def d_losses(pd):
            parts = {}
            fake_pair = pooled_fake if pooled_fake is not None else \
                jnp.concatenate([lr_spec, sr_d], axis=-1)
            pred_fake_pool = self.netD.apply(pd["D"], fake_pair.astype(self.dtype))
            parts["D_fake"] = gan_loss(pred_fake_pool, False, use_lsgan)
            pred_real = self._d_apply(pd["D"], lr_spec, hr_spec)
            parts["D_real"] = gan_loss(pred_real, True, use_lsgan)
            parts["D_fake_t"] = jnp.float32(0)
            parts["D_real_t"] = jnp.float32(0)
            if cfg.use_time_d:
                sr_frames_t = jax.lax.stop_gradient(
                    self._time_frames(sr_d, lr_norm))
                pf = self._time_d_apply(pd["time_D"], lr_norm["frames"], sr_frames_t)
                parts["D_fake_t"] = parts["D_fake_t"] + \
                    gan_loss(pf, False, use_lsgan) * cfg.lambda_time
                pr = self._time_d_apply(pd["time_D"], lr_norm["frames"],
                                        hr_norm["frames"])
                parts["D_real_t"] = parts["D_real_t"] + \
                    gan_loss(pr, True, use_lsgan) * cfg.lambda_time
            if cfg.use_hifigan_d:
                wav_f = jax.lax.stop_gradient(
                    self.codec.to_audio(sr_d, lr_norm, pha=lr_pha, rng=k_g))
                pf = self.hifigan_D.apply(pd["hifigan_D"],
                                          wav_f[..., None].astype(self.dtype))
                parts["D_fake_t"] = parts["D_fake_t"] + \
                    gan_loss(pf, False, use_lsgan) * cfg.lambda_time
                pr = self.hifigan_D.apply(pd["hifigan_D"],
                                          batch["image"][..., None].astype(self.dtype))
                parts["D_real_t"] = parts["D_real_t"] + \
                    gan_loss(pr, True, use_lsgan) * cfg.lambda_time
            total = (parts["D_fake"] + parts["D_real"]) * 0.5 \
                + (parts["D_fake_t"] + parts["D_real_t"]) * 0.5
            return total, parts

        (_, d_parts), grads_d = jax.value_and_grad(d_losses, has_aux=True)(d_params)

        losses = dict(g_parts)
        losses.update(d_parts)
        losses = filter_losses(losses, self.flags)

        aux = {"sr": sr_d,
               # the D input pair for the host-side fake pool (reference
               # util/image_pool.py via models/pix2pixHD_model.py:304-312)
               "fake_pair": jnp.concatenate([lr_spec, sr_d], axis=-1)}
        if with_visuals:
            aux["visuals"] = self._visual_slices(lr_spec, sr_d, hr_spec,
                                                 lr_pha, hr_pha)
        return losses, grads_g, grads_d, aux

    # ------------------------------------------------------------------
    def _visual_slices(self, lr_spec, sr, hr_spec, lr_pha, hr_pha):
        """First-sample visual tensors (reference
        models/pix2pixHD_model.py:417-432)."""
        cfg = self.cfg
        if cfg.explicit_encoding:
            lab = 0.5 * (lr_spec[0, :, :, 0] + lr_spec[0, :, :, 1])
            gen = 0.5 * (sr[0, :, :, 0] + sr[0, :, :, 1])
            real = 0.5 * (hr_spec[0, :, :, 0] + hr_spec[0, :, :, 1])
            sr_pha = jnp.sign(sr[0, :, :, 0] - sr[0, :, :, 1])
            vis = {"label": lab, "generated": gen, "real": real,
                   "label_pha": hr_pha[0] - sr_pha, "generated_pha": sr_pha,
                   "real_pha": hr_pha[0]}
        else:
            vis = {"label": lr_spec[0, :, :, 0], "generated": sr[0, :, :, 0],
                   "real": hr_spec[0, :, :, 0]}
        return vis

    # ------------------------------------------------------------------
    def inference(self, params_g, lr_audio: jnp.ndarray, rng: jax.Array,
                  inst: Optional[jnp.ndarray] = None,
                  feat_map: Optional[jnp.ndarray] = None):
        """reference models/pix2pixHD_model.py:437-455: returns
        (sr_spectro, lr_pha, lr_norm_param, lr_spectro). With instance
        features, pass a feat_map from sample_features (cluster sampling)."""
        lr_spec, lr_pha, lr_norm, *_ = self.encode_input(lr_audio, None, rng, inst)
        g_in = lr_spec
        if feat_map is not None:
            g_in = jnp.concatenate([lr_spec, feat_map], axis=-1)
        sr = self.netG_infer.apply(
            params_g, g_in.astype(self.dtype)).astype(jnp.float32)
        return sr, lr_pha, lr_norm, lr_spec

    def sample_features(self, inst: "np.ndarray", cluster_path: str,
                        rng: Optional["np.random.Generator"] = None):
        """Host-side style sampling from precomputed k-means clusters
        (reference models/pix2pixHD_model.py:457-476): for each instance id,
        pick a random cluster center and broadcast it over the region.
        inst: [B, H, W] int ids; returns [B, H, W, feat_num] float32."""
        clusters = np.load(cluster_path, allow_pickle=True).item()
        rng = rng or np.random.default_rng(self.cfg.seed)
        b, h, w = inst.shape
        feat = np.zeros((b, h, w, self.cfg.feat_num), np.float32)
        for i in np.unique(inst):
            label = int(i) if i < 1000 else int(i) // 1000
            if label not in clusters:
                continue
            centers = clusters[label]
            pick = centers[rng.integers(0, centers.shape[0])]
            feat[inst == i] = pick[: self.cfg.feat_num]
        return feat
