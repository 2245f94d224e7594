"""Architecture parity via exact parameter counts (the reference publishes an
exact param ladder in train_script.sh comments) plus shape checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pix2pixhdaudiosr_tpu.models import (GlobalGenerator, LocalEnhancer,
                                         MultiscaleDiscriminator,
                                         build_discriminator, build_generator)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def param_shapes(model, shape):
    """Abstract init (no FLOPs) — counts params of arbitrarily large models."""
    return jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros(shape, jnp.float32))


# Reference ladder (train_script.sh comments): LocalEnhancer, io 2ch,
# n_downsample_global 4.
LADDER = [
    # (n_blocks_global, n_blocks_local, ngf, expected_params)
    (9, 3, 64, 730_713_346),
    (7, 3, 64, 579_710_210),
    (5, 3, 64, 428_707_074),
    (3, 2, 64, 277_408_770),
    (3, 2, 48, 156_050_690),
    (3, 2, 32, 69_363_202),
    (3, 2, 24, 39_020_930),
    (3, 2, 16, 17_346_306),
    (3, 2, 8, 4_339_330),
]


@pytest.mark.parametrize("gb,lb,ngf,expected", LADDER)
def test_local_enhancer_param_ladder(gb, lb, ngf, expected):
    g = LocalEnhancer(input_nc=2, output_nc=2, ngf=ngf, n_downsample_global=4,
                      n_blocks_global=gb, n_local_enhancers=1, n_blocks_local=lb)
    params = param_shapes(g, (1, 64, 64, 2))
    assert n_params(params) == expected


def test_discriminator_param_count():
    """D = 5,531,522 at audio defaults (netD input 4ch, ndf 64, 3 layers,
    num_D 2, getIntermFeat) — reference train_script.sh comment."""
    d = build_discriminator(4, 64, 3, use_sigmoid=False, num_d=2,
                            get_interm_feat=True)
    params = param_shapes(d, (1, 64, 64, 4))
    assert n_params(params) == 5_531_522


def test_global_generator_shapes():
    g = GlobalGenerator(input_nc=2, output_nc=2, ngf=8, n_downsampling=4,
                        n_blocks=2)
    x = jnp.zeros((2, 512, 128, 2))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (2, 512, 128, 2)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh range


def test_local_enhancer_shapes():
    g = LocalEnhancer(input_nc=2, output_nc=2, ngf=8, n_downsample_global=3,
                      n_blocks_global=2, n_local_enhancers=1, n_blocks_local=1)
    x = jnp.zeros((1, 512, 128, 2))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (1, 512, 128, 2)


def test_multiscale_discriminator_structure():
    d = MultiscaleDiscriminator(input_nc=4, ndf=16, n_layers=3, num_d=2,
                                get_interm_feat=True)
    x = jnp.zeros((1, 512, 128, 4))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert len(out) == 2                       # num_D scales
    assert all(len(feats) == 5 for feats in out)  # n_layers + 2 outputs each
    # PatchGAN score map shapes: three stride-2 convs then two stride-1
    assert out[0][-1].shape[-1] == 1
    # second scale sees a 2x downsampled input -> smaller score map
    assert out[1][-1].shape[1] < out[0][-1].shape[1]


def test_discriminator_no_interm_feat():
    d = MultiscaleDiscriminator(input_nc=4, ndf=16, n_layers=3, num_d=2,
                                get_interm_feat=False)
    x = jnp.zeros((1, 128, 128, 4))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert len(out) == 2 and all(len(f) == 1 for f in out)
