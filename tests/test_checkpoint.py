"""Checkpointing: full save/restore roundtrip, tolerant partial restore on
architecture drift (reference models/base_model.py:62-89), iter.txt cursor."""

import jax
import jax.numpy as jnp
import numpy as np

from pix2pixhdaudiosr_tpu.config import Config
from pix2pixhdaudiosr_tpu.system import Pix2PixHDSystem
from pix2pixhdaudiosr_tpu.trainer import init_state
from pix2pixhdaudiosr_tpu.utils import CheckpointManager
from pix2pixhdaudiosr_tpu.utils.checkpoint import merge_matching

CFG = Config(net_g="global", ngf=4, n_downsample_global=2, n_blocks_global=1,
             ndf=4, n_layers_d=2, num_d=2, input_nc=2, output_nc=2,
             label_nc=0, explicit_encoding=True, mask_mode="mode2",
             compute_dtype="float32")


def test_save_restore_roundtrip(tmp_path):
    system = Pix2PixHDSystem(CFG)
    state, *_ = init_state(system, jax.random.PRNGKey(0))
    cm = CheckpointManager(str(tmp_path / "expr"))
    cm.save(state, "latest")
    assert cm.has("latest")
    restored = cm.restore("latest", target=jax.device_get(state))
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_partial_restore_on_arch_drift(tmp_path):
    """Bigger model warm-started from a smaller checkpoint keeps only
    shape-matching leaves — the reference's tolerant loader."""
    small = Pix2PixHDSystem(CFG)
    s_state, *_ = init_state(small, jax.random.PRNGKey(0))
    cm = CheckpointManager(str(tmp_path / "expr"))
    cm.save(s_state, "latest")

    big = Pix2PixHDSystem(CFG.replace(n_blocks_global=2))
    b_state, *_ = init_state(big, jax.random.PRNGKey(1))
    merged = cm.restore("latest", target=jax.device_get(b_state))
    # first conv matches shapes -> taken from the checkpoint
    sp = s_state.params["G"]["params"]
    bp = merged.params["G"]["params"]
    k0 = sorted(sp.keys())[0]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(sp[k0])[0]),
        np.asarray(jax.tree.leaves(bp[k0])[0]))
    # modules absent from the checkpoint keep the fresh init (the extra
    # resblock lives inside the trunk submodule)
    trunk = [k for k in bp if "Trunk" in k][0]
    extra = set(bp[trunk].keys()) - set(sp[trunk].keys())
    assert extra  # the added resblock exists and did not crash the restore


def test_merge_matching_shape_mismatch():
    target = {"a": np.zeros((2, 3)), "b": np.zeros(4)}
    saved = {"a": np.ones((2, 3)), "b": np.ones(5)}
    out = merge_matching(target, saved)
    np.testing.assert_array_equal(out["a"], 1)   # shape match -> taken
    np.testing.assert_array_equal(out["b"], 0)   # mismatch -> kept


def test_iter_cursor(tmp_path):
    cm = CheckpointManager(str(tmp_path / "e"))
    assert cm.load_iter() == (1, 0)
    cm.save_iter(7, 123)
    assert cm.load_iter() == (7, 123)


def test_restore_actually_loads_weights(tmp_path):
    """Regression: restoring into a DIFFERENT init must take the checkpoint's
    nonzero kernels (round-1 merge never descended into the TrainState
    dataclass, silently returning the fresh target — biases being zero in
    every init masked it in the roundtrip test above)."""
    system = Pix2PixHDSystem(CFG)
    s_state, *_ = init_state(system, jax.random.PRNGKey(0))
    cm = CheckpointManager(str(tmp_path / "expr"))
    cm.save(s_state, "latest")

    f_state, *_ = init_state(system, jax.random.PRNGKey(1))
    merged = cm.restore("latest", target=jax.device_get(f_state))

    def kernels(tree):
        out = {}
        def walk(d, p):
            if isinstance(d, dict):
                for k, v in d.items():
                    walk(v, p + "/" + k)
            elif p.endswith("kernel"):
                out[p] = np.asarray(d)
        walk(tree, "")
        return out

    saved_k = kernels(s_state.params["G"])
    fresh_k = kernels(f_state.params["G"])
    merged_k = kernels(merged.params["G"])
    assert saved_k and any(
        not np.array_equal(saved_k[p], fresh_k[p]) for p in saved_k)
    for p in saved_k:
        np.testing.assert_array_equal(merged_k[p], saved_k[p])
    # optimizer state (optax namedtuples nested in tuples) restored too
    for a, b in zip(jax.tree.leaves(merged.opt_g),
                    jax.tree.leaves(s_state.opt_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(merged.step) == int(s_state.step)


def test_continue_train_carries_weights(tmp_path):
    """e2e through train_loop.main: a resumed run must start from the saved
    weights, not a fresh init (the round-1 restore no-op would have passed
    any 'Resuming from epoch' string check)."""
    from pix2pixhdaudiosr_tpu import train_loop
    from pix2pixhdaudiosr_tpu.data import write_wav
    rng = np.random.default_rng(3)
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(4):
        write_wav(str(d / f"a{i}.wav"),
                  rng.standard_normal(40000).astype(np.float32) * 0.1, 48000)
    base = dict(dataroot=str(d), checkpoints_dir=str(tmp_path / "ck"),
                name="t", batch_size=2, validation_split=0.0,
                net_g="global", ngf=4, ndf=4, n_layers_d=2, num_d=1,
                n_downsample_global=1, n_blocks_global=1, input_nc=2,
                output_nc=2, label_nc=0, no_instance=True,
                explicit_encoding=True, mask_mode="mode2",
                compute_dtype="float32", niter=1, niter_decay=0,
                save_epoch_freq=1, save_latest_freq=10**9,
                display_freq=10**9, eval_freq=10**9, print_freq=2)
    train_loop.main(cfg=Config(**base))
    cm = CheckpointManager(str(tmp_path / "ck" / "t"))
    saved = cm.restore("latest", target=None)

    # resume for one more epoch; the loaded weights must equal the save
    import pix2pixhdaudiosr_tpu.utils.checkpoint as ckpt_mod
    seen = {}
    orig = ckpt_mod.CheckpointManager.restore

    def spy(self, tag="latest", target=None, expr_dir=None):
        out = orig(self, tag, target=target, expr_dir=expr_dir)
        if target is not None and not seen:
            seen["k"] = np.asarray(
                [l for l in jax.tree.leaves(out.params["G"]) if l.ndim == 4][0])
        return out

    ckpt_mod.CheckpointManager.restore = spy
    try:
        train_loop.main(cfg=Config(**{**base, "niter": 2,
                                      "continue_train": True}))
    finally:
        ckpt_mod.CheckpointManager.restore = orig
    want = np.asarray(
        [l for l in jax.tree.leaves(saved["params"]["G"])
         if getattr(l, "ndim", 0) == 4][0])
    np.testing.assert_array_equal(seen["k"], want)


def test_restore_across_adam_mu_dtype_flip(tmp_path):
    """Flipping --adam_mu_bf16 between runs must restore cleanly: the
    tolerant merge casts shape-matching leaves to the TARGET's dtype, so an
    f32-moment checkpoint loads into a bf16-moment state and vice versa."""
    import jax.numpy as jnp

    sys_f32 = Pix2PixHDSystem(CFG)
    sys_bf16 = Pix2PixHDSystem(CFG.replace(adam_mu_bf16=True))
    state, *_ = init_state(sys_f32, jax.random.PRNGKey(0))
    cm = CheckpointManager(str(tmp_path / "expr"))
    cm.save(state, "latest")

    target, *_ = init_state(sys_bf16, jax.random.PRNGKey(1))
    restored = cm.restore("latest", target=jax.device_get(target))
    # weights carried from the f32 run
    a = jax.tree.leaves(state.params["G"])[0]
    b = jax.tree.leaves(restored.params["G"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moment dtypes follow the TARGET config (bf16 mu present)
    dtypes = {x.dtype for x in jax.tree.leaves(restored.opt_g)
              if hasattr(x, "dtype")}
    assert jnp.dtype(jnp.bfloat16) in dtypes
