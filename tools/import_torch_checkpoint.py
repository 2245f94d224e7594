#!/usr/bin/env python
"""Import a reference (torch) generator checkpoint into this framework.

The reference saves `latest_net_G.pth` torch state_dicts
(/root/reference/models/base_model.py:43-46) whose keys follow the
Sequential layouts of /root/reference/models/networks.py:129-211 (trunk
`model.<i>`, enhancer `model<n>_1` / `model<n>_2`, resblocks
`...conv_block.{1,5}`; InstanceNorm is affine=False so only convolution
weights/biases exist). This tool maps those tensors onto the identical
architecture here (models/generator.py) so a user of the reference can keep
serving their trained models:

* Conv2d weight [co, ci, kh, kw]  -> HWIO [kh, kw, ci, co]
* ConvTranspose2d weight [ci, co, kh, kw] -> flax nn.ConvTranspose kernel
  [kh, kw, ci, co], spatially FLIPPED: torch's transposed conv places tap
  p at output 2i + p - pad while lax.conv_transpose (transpose_kernel=False)
  scatters the unflipped kernel the opposite way (see
  models/layers.conv_subpixel_transpose derivation) — verified exactly
  against a torch oracle in tests/test_torch_import.py.

CLI: build the full framework checkpoint (Orbax, loadable with
--load_pretrain) from a .pth file:

  python tools/import_torch_checkpoint.py --pth latest_net_G.pth \\
      --out /ckpts/imported <the same model flags as training>
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [co,ci,kh,kw] -> HWIO [kh,kw,ci,co]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)).astype(np.float32))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [ci,co,kh,kw] -> flax [kh,kw,ci,co], flipped."""
    w = np.transpose(w, (2, 3, 0, 1))           # [kh, kw, ci, co]
    return np.ascontiguousarray(w[::-1, ::-1].astype(np.float32))


def _take(sd, key, deconv=False):
    w = np.asarray(sd[key + ".weight"])
    b = np.asarray(sd[key + ".bias"]).astype(np.float32)
    return {"kernel": _deconv_w(w) if deconv else _conv_w(w), "bias": b}


def _convin(sd, key, deconv=False):
    inner = "ConvTranspose_0" if deconv else "Conv_0"
    return {inner: _take(sd, key, deconv)}


def _trunk(sd, prefix, n_down, n_blocks):
    """`model.<i>` Sequential of the trunk (head, downs, resblocks, deconvs;
    reference models/networks.py:185-208 without the final triple)."""
    out = {"ConvIN_0": _convin(sd, f"{prefix}.1")}
    for i in range(n_down):
        out[f"ConvIN_{i + 1}"] = _convin(sd, f"{prefix}.{4 + 3 * i}")
    base_rb = 4 + 3 * n_down
    for i in range(n_blocks):
        out[f"ResnetBlock_{i}"] = {
            "ConvIN_0": _convin(sd, f"{prefix}.{base_rb + i}.conv_block.1"),
            "ConvIN_1": _convin(sd, f"{prefix}.{base_rb + i}.conv_block.5"),
        }
    base_up = base_rb + n_blocks
    for i in range(n_down):
        out[f"ConvTransposeIN_{i}"] = _convin(
            sd, f"{prefix}.{base_up + 3 * i}", deconv=True)
    return out, base_up + 3 * n_down


def convert_generator_state_dict(sd, net_g: str, n_downsample_global: int,
                                 n_blocks_global: int,
                                 n_local_enhancers: int = 1,
                                 n_blocks_local: int = 3):
    """torch state_dict -> flax params dict for models/generator.py
    (wrap as {"params": ...} for .apply)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if net_g == "global":
        trunk, final_pad = _trunk(sd, "model", n_downsample_global,
                                  n_blocks_global)
        return {"GlobalTrunk_0": trunk,
                "ConvIN_0": _convin(sd, f"model.{final_pad + 1}")}
    if net_g != "local":
        raise ValueError(f"unsupported netG for import: {net_g}")
    trunk, _ = _trunk(sd, "model", n_downsample_global, n_blocks_global)
    out = {"global": trunk}
    nle = n_local_enhancers
    for n in range(1, nle + 1):
        out[f"enh{n}_down0"] = _convin(sd, f"model{n}_1.1")
        out[f"enh{n}_down1"] = _convin(sd, f"model{n}_1.4")
        for i in range(n_blocks_local):
            out[f"enh{n}_block{i}"] = {
                "ConvIN_0": _convin(sd, f"model{n}_2.{i}.conv_block.1"),
                "ConvIN_1": _convin(sd, f"model{n}_2.{i}.conv_block.5"),
            }
        out[f"enh{n}_up"] = _convin(sd, f"model{n}_2.{n_blocks_local}",
                                    deconv=True)
        if n == nle:
            out[f"enh{n}_final"] = _convin(
                sd, f"model{n}_2.{n_blocks_local + 4}")
    return out


def convert_discriminator_state_dict(sd, n_layers: int = 3, num_d: int = 2,
                                     get_interm_feat: bool = True):
    """torch MultiscaleDiscriminator state_dict -> flax params dict
    (reference models/networks.py:291-331: `scale{i}_layer{j}.0` keys with
    getIntermFeat — the training default — or flat `layer{i}.<seq idx>`
    Sequentials, convs at stream index 0 then 3j-1)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out = {}
    for i in range(num_d):
        scale = {}
        for j in range(n_layers + 2):
            if get_interm_feat:
                key = f"scale{i}_layer{j}.0"
            else:
                key = f"layer{i}.{0 if j == 0 else 3 * j - 1}"
            scale[f"ConvIN_{j}"] = _convin(sd, key)
        out[f"scale{i}"] = scale
    return out


def main(argv=None):
    import argparse

    import jax

    from pix2pixhdaudiosr_tpu.config import parse_config
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state
    from pix2pixhdaudiosr_tpu.utils.checkpoint import CheckpointManager

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--pth", required=True, help="latest_net_G.pth path")
    ap.add_argument("--pth_d", default=None,
                    help="optional latest_net_D.pth (to continue training)")
    args, rest = ap.parse_known_args(argv)

    import torch  # CPU-only torch is available in this image
    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}

    cfg = parse_config(rest, is_train=True)
    if not cfg.torch_deconv:
        # the imported deconvs require torch ConvTranspose2d semantics
        # (see models/layers.ConvTransposeIN impl="torch")
        cfg = cfg.replace(torch_deconv=True)
        print("note: enabling --torch_deconv (required when serving this "
              "checkpoint; pass it to generate_audio/eval_matric)")
    params_g = {"params": convert_generator_state_dict(
        sd, cfg.net_g, cfg.n_downsample_global, cfg.n_blocks_global,
        cfg.n_local_enhancers, cfg.n_blocks_local)}

    system = Pix2PixHDSystem(cfg)
    state, *_ = init_state(system, jax.random.PRNGKey(cfg.seed), batch=1)
    want = jax.tree.map(lambda a: a.shape, state.params["G"])
    got = jax.tree.map(lambda a: a.shape, params_g)
    if want != got:
        raise SystemExit(f"converted tree mismatch:\nwant {want}\ngot {got}")
    new_params = {**state.params, "G": jax.tree.map(jax.numpy.asarray,
                                                    params_g)}
    if args.pth_d:
        sd_d = {k: v.numpy() for k, v in
                torch.load(args.pth_d, map_location="cpu", weights_only=True).items()}
        params_d = {"params": convert_discriminator_state_dict(
            sd_d, cfg.n_layers_d, cfg.num_d,
            get_interm_feat=not cfg.no_gan_feat_loss)}
        want_d = jax.tree.map(lambda a: a.shape, state.params["D"])
        got_d = jax.tree.map(lambda a: a.shape, params_d)
        if want_d != got_d:
            raise SystemExit(f"D tree mismatch:\nwant {want_d}\ngot {got_d}")
        new_params["D"] = jax.tree.map(jax.numpy.asarray, params_d)
    state = state.replace(params=new_params)
    ckpt = CheckpointManager(cfg.expr_dir)
    ckpt.save(state, "latest")
    print(f"imported {args.pth} -> {cfg.expr_dir}/latest_state "
          f"(load with --load_pretrain {cfg.expr_dir})")


if __name__ == "__main__":
    main()
