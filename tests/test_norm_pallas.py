"""Fused Pallas InstanceNorm vs the reference jnp implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from pix2pixhdaudiosr_tpu.models.layers import instance_norm


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import pix2pixhdaudiosr_tpu.ops.norm_pallas as N
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(N.pl, "pallas_call", interp)
    yield


def test_fused_in_matches_reference(rng_np):
    from pix2pixhdaudiosr_tpu.ops.norm_pallas import fused_instance_norm
    x = jnp.asarray((rng_np.standard_normal((2, 16, 32, 8)) * 3 + 5)
                    .astype(np.float32))
    got = np.asarray(fused_instance_norm(x))
    want = np.asarray(instance_norm(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_in_relu(rng_np):
    from pix2pixhdaudiosr_tpu.ops.norm_pallas import fused_instance_norm
    x = jnp.asarray(rng_np.standard_normal((1, 8, 16, 4)).astype(np.float32))
    got = np.asarray(fused_instance_norm(x, act="relu"))
    want = np.maximum(np.asarray(instance_norm(x)), 0)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.min() >= 0


def test_fused_in_bf16(rng_np):
    from pix2pixhdaudiosr_tpu.ops.norm_pallas import fused_instance_norm
    x = jnp.asarray(rng_np.standard_normal((2, 8, 16, 4)).astype(np.float32))
    got = np.asarray(fused_instance_norm(x.astype(jnp.bfloat16)),
                     dtype=np.float32)
    want = np.asarray(instance_norm(x))
    np.testing.assert_allclose(got, want, atol=0.02)
