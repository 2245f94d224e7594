"""Reference-checkpoint import: a torch generator built to the reference's
architecture spec (models/networks.py:129-253 — Sequential layout, reflect
padding, affine-free InstanceNorm) produces a state_dict whose conversion
(tools/import_torch_checkpoint.py) makes our flax generator match the torch
forward output exactly (f32 tolerance). torch (CPU) is the test oracle."""

import sys
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pix2pixhdaudiosr_tpu.models.generator import (GlobalGenerator,  # noqa: E402
                                                   LocalEnhancer)
from tools.import_torch_checkpoint import convert_generator_state_dict  # noqa: E402


def _norm(c):
    return nn.InstanceNorm2d(c, affine=False)


class TorchResnetBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3), _norm(dim),
            nn.ReLU(True), nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
            _norm(dim))

    def forward(self, x):
        return x + self.conv_block(x)


def _torch_trunk_layers(input_nc, ngf, n_down, n_blocks):
    layers = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf, 7),
              _norm(ngf), nn.ReLU(True)]
    for i in range(n_down):
        m = 2 ** i
        layers += [nn.Conv2d(ngf * m, ngf * m * 2, 3, stride=2, padding=1),
                   _norm(ngf * m * 2), nn.ReLU(True)]
    m = 2 ** n_down
    layers += [TorchResnetBlock(ngf * m) for _ in range(n_blocks)]
    for i in range(n_down):
        m = 2 ** (n_down - i)
        layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, stride=2,
                                      padding=1, output_padding=1),
                   _norm(ngf * m // 2), nn.ReLU(True)]
    return layers


class TorchGlobalG(nn.Module):
    def __init__(self, input_nc, output_nc, ngf, n_down, n_blocks):
        super().__init__()
        layers = _torch_trunk_layers(input_nc, ngf, n_down, n_blocks)
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7),
                   nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class TorchLocalE(nn.Module):
    def __init__(self, input_nc, output_nc, ngf, n_down_g, n_blocks_g,
                 nle, n_blocks_l):
        super().__init__()
        self.nle = nle
        ngf_g = ngf * 2 ** nle
        self.model = nn.Sequential(
            *_torch_trunk_layers(input_nc, ngf_g, n_down_g, n_blocks_g))
        for n in range(1, nle + 1):
            ngf_n = ngf * 2 ** (nle - n)
            down = [nn.ReflectionPad2d(3), nn.Conv2d(input_nc, ngf_n, 7),
                    _norm(ngf_n), nn.ReLU(True),
                    nn.Conv2d(ngf_n, ngf_n * 2, 3, stride=2, padding=1),
                    _norm(ngf_n * 2), nn.ReLU(True)]
            up = [TorchResnetBlock(ngf_n * 2) for _ in range(n_blocks_l)]
            up += [nn.ConvTranspose2d(ngf_n * 2, ngf_n, 3, stride=2,
                                      padding=1, output_padding=1),
                   _norm(ngf_n), nn.ReLU(True)]
            if n == nle:
                up += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, output_nc, 7),
                       nn.Tanh()]
            setattr(self, f"model{n}_1", nn.Sequential(*down))
            setattr(self, f"model{n}_2", nn.Sequential(*up))
        self.downsample = nn.AvgPool2d(3, stride=2, padding=1,
                                       count_include_pad=False)

    def forward(self, x):
        pyr = [x]
        for _ in range(self.nle):
            pyr.append(self.downsample(pyr[-1]))
        out = self.model(pyr[-1])
        for n in range(1, self.nle + 1):
            down = getattr(self, f"model{n}_1")
            up = getattr(self, f"model{n}_2")
            out = up(down(pyr[self.nle - n]) + out)
        return out


def _run_pair(tm, fm, conv_kwargs, x_np):
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_generator_state_dict(sd, **conv_kwargs)}
    got = np.asarray(fm.apply(jax.tree.map(jnp.asarray, params),
                              jnp.asarray(x_np)), np.float32)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_import_global_generator(rng_np):
    torch.manual_seed(0)
    tm = TorchGlobalG(2, 2, ngf=8, n_down=2, n_blocks=2)
    fm = GlobalGenerator(2, 2, ngf=8, n_downsampling=2, n_blocks=2,
                         fast_conv=False, deconv_impl="torch")
    x = (rng_np.standard_normal((2, 32, 32, 2)) * 0.5).astype(np.float32)
    _run_pair(tm, fm, dict(net_g="global", n_downsample_global=2,
                           n_blocks_global=2), x)


def test_import_local_enhancer(rng_np):
    torch.manual_seed(1)
    tm = TorchLocalE(2, 2, ngf=4, n_down_g=2, n_blocks_g=1, nle=1,
                     n_blocks_l=2)
    fm = LocalEnhancer(2, 2, ngf=4, n_downsample_global=2, n_blocks_global=1,
                       n_local_enhancers=1, n_blocks_local=2, fast_conv=False,
                       deconv_impl="torch")
    x = (rng_np.standard_normal((2, 32, 32, 2)) * 0.5).astype(np.float32)
    _run_pair(tm, fm, dict(net_g="local", n_downsample_global=2,
                           n_blocks_global=1, n_local_enhancers=1,
                           n_blocks_local=2), x)


def test_import_tool_cli(tmp_path, rng_np):
    """The CLI writes a checkpoint that restores into a matching train state."""
    import tools.import_torch_checkpoint as tool
    from pix2pixhdaudiosr_tpu.utils.checkpoint import CheckpointManager

    torch.manual_seed(2)
    tm = TorchGlobalG(2, 2, ngf=8, n_down=2, n_blocks=1)
    pth = tmp_path / "latest_net_G.pth"
    torch.save(tm.state_dict(), str(pth))

    tool.main(["--pth", str(pth), "--name", "imp",
               "--checkpoints_dir", str(tmp_path),
               "--netG", "global", "--ngf", "8", "--n_downsample_global", "2",
               "--n_blocks_global", "1", "--input_nc", "2", "--output_nc", "2",
               "--label_nc", "0", "--no_instance", "--explicit_encoding",
               "--mask_mode", "mode2", "--compute_dtype", "float32",
               "--torch_deconv"])
    expr = tmp_path / "imp"
    assert (expr / "latest_state").exists()

    # restorable and carries the torch weights
    from pix2pixhdaudiosr_tpu.config import parse_config
    from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
    from pix2pixhdaudiosr_tpu.trainer import init_state
    cfg = parse_config(["--name", "imp", "--checkpoints_dir", str(tmp_path),
                        "--netG", "global", "--ngf", "8",
                        "--n_downsample_global", "2", "--n_blocks_global", "1",
                        "--input_nc", "2", "--output_nc", "2", "--label_nc",
                        "0", "--no_instance", "--explicit_encoding",
                        "--mask_mode", "mode2", "--compute_dtype", "float32",
                        "--torch_deconv"], is_train=True)
    system = Pix2PixHDSystem(cfg)
    state, *_ = init_state(system, jax.random.PRNGKey(0), batch=1)
    restored = CheckpointManager(str(expr)).restore(
        "latest", target=jax.device_get(state))
    head = restored.params["G"]["params"]["GlobalTrunk_0"]["ConvIN_0"]["Conv_0"]["kernel"]
    want = np.transpose(tm.model[1].weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(head), want, atol=1e-6)


class TorchNLayerD(nn.Module):
    """Reference NLayerDiscriminator spec (models/networks.py:334-383),
    getIntermFeat variant."""
    def __init__(self, input_nc, ndf, n_layers):
        super().__init__()
        self.n_layers = n_layers
        seq = [[nn.Conv2d(input_nc, ndf, 4, stride=2, padding=2),
                nn.LeakyReLU(0.2, True)]]
        nf = ndf
        for _ in range(1, n_layers):
            prev, nf = nf, min(nf * 2, 512)
            seq += [[nn.Conv2d(prev, nf, 4, stride=2, padding=2), _norm(nf),
                     nn.LeakyReLU(0.2, True)]]
        prev, nf = nf, min(nf * 2, 512)
        seq += [[nn.Conv2d(prev, nf, 4, stride=1, padding=2), _norm(nf),
                 nn.LeakyReLU(0.2, True)]]
        seq += [[nn.Conv2d(nf, 1, 4, stride=1, padding=2)]]
        for n, layers in enumerate(seq):
            setattr(self, f"model{n}", nn.Sequential(*layers))

    def forward(self, x):
        res = [x]
        for n in range(self.n_layers + 2):
            res.append(getattr(self, f"model{n}")(res[-1]))
        return res[1:]


class TorchMultiD(nn.Module):
    def __init__(self, input_nc, ndf, n_layers, num_d):
        super().__init__()
        self.num_d, self.n_layers = num_d, n_layers
        for i in range(num_d):
            d = TorchNLayerD(input_nc, ndf, n_layers)
            for j in range(n_layers + 2):
                setattr(self, f"scale{i}_layer{j}", getattr(d, f"model{j}"))
        self.downsample = nn.AvgPool2d(3, stride=2, padding=1,
                                       count_include_pad=False)

    def forward(self, x):
        result = []
        for i in range(self.num_d):
            mods = [getattr(self, f"scale{self.num_d - 1 - i}_layer{j}")
                    for j in range(self.n_layers + 2)]
            h = x
            feats = []
            for m in mods:
                h = m(h)
                feats.append(h)
            result.append(feats)
            if i != self.num_d - 1:
                x = self.downsample(x)
        return result


def test_import_discriminator(rng_np):
    from pix2pixhdaudiosr_tpu.models.discriminator import build_discriminator
    from tools.import_torch_checkpoint import convert_discriminator_state_dict

    torch.manual_seed(3)
    tm = TorchMultiD(4, ndf=8, n_layers=3, num_d=2)
    fm = build_discriminator(4, 8, 3, use_sigmoid=False, num_d=2,
                             get_interm_feat=True)
    x = (rng_np.standard_normal((2, 32, 32, 4)) * 0.5).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_discriminator_state_dict(sd, 3, 2, True)}
    got = fm.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    assert len(got) == len(want) == 2
    for gs, ws in zip(got, want):
        for g, w in zip(gs, ws):
            wn = np.transpose(w.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(np.asarray(g, np.float32), wn,
                                       atol=2e-4, rtol=1e-3)
