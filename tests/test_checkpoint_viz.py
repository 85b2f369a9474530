"""Checkpoint roundtrip, metric logging, viz grid tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from smirk_tpu.utils import checkpoint as ckpt
from smirk_tpu.utils.metrics import MetricLogger
from smirk_tpu.utils import viz


def test_state_roundtrip(tmp_path):
    state = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "b": {"c": jnp.ones((4,), jnp.int32), "d": jnp.zeros(())},
    }
    path = str(tmp_path / "s.npz")
    ckpt.save_state(state, path)
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ckpt.restore_state(zero, path)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(a, b)


def test_orbax_async_roundtrip(tmp_path):
    """Orbax directory checkpoints (async save) restore exactly, including
    a realistic nested state with an optax-like structure."""
    import optax

    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    opt = optax.adam(1e-3).init(params)
    state = {"step": jnp.asarray(7, jnp.int32), "params": params, "opt": opt}
    path = str(tmp_path / "ckpt_dir")
    ckpt.save_state(state, path)  # non-.npz -> orbax async
    ckpt.finalize()
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ckpt.restore_state(zero, path)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_export_roundtrip_orbax(tmp_path):
    """save_model/load_model through the orbax directory backend (non-.npz
    path), including the generator-subtree detection via _METADATA."""
    from smirk_tpu.train.trainer import TrainState

    enc = {"params": {"w": jnp.ones((3, 3))}, "batch_stats": {"m": jnp.zeros(3)}}
    gen = {"params": {"w": jnp.full((2,), 2.0)}, "batch_stats": {}}
    state = TrainState(step=jnp.zeros((), jnp.int32), encoder=enc,
                       generator=gen, base_encoder=enc, enc_opt=None,
                       gen_opt=None)
    path = str(tmp_path / "model_dir")
    ckpt.save_model(state, path)
    ckpt.finalize()
    blank = state.replace(
        encoder=jax.tree_util.tree_map(jnp.zeros_like, enc),
        generator=jax.tree_util.tree_map(jnp.zeros_like, gen),
    )
    restored = ckpt.load_model(blank, path)
    np.testing.assert_array_equal(
        np.asarray(restored.encoder["params"]["w"]), np.ones((3, 3)))
    np.testing.assert_array_equal(
        np.asarray(restored.generator["params"]["w"]), np.full((2,), 2.0))

    # full export (with generator) into a generator-less template: the
    # extra subtree is ignored (reference strict=False load semantics)
    solo = TrainState(step=jnp.zeros((), jnp.int32), encoder=enc,
                      generator=None, base_encoder=enc, enc_opt=None,
                      gen_opt=None)
    partial = ckpt.load_model(
        solo.replace(encoder=jax.tree_util.tree_map(jnp.zeros_like, enc)),
        path)
    np.testing.assert_array_equal(
        np.asarray(partial.encoder["params"]["w"]), np.ones((3, 3)))
    assert partial.generator is None
    path2 = str(tmp_path / "model_dir2")
    ckpt.save_model(solo, path2)
    ckpt.finalize()
    out = ckpt.load_model(
        solo.replace(encoder=jax.tree_util.tree_map(jnp.zeros_like, enc)),
        path2)
    np.testing.assert_array_equal(
        np.asarray(out.encoder["params"]["w"]), np.ones((3, 3)))
    assert out.generator is None


def test_model_export_roundtrip(tmp_path):
    from smirk_tpu.train.trainer import TrainState

    enc = {"params": {"w": jnp.ones((3, 3))}, "batch_stats": {"m": jnp.zeros(3)}}
    gen = {"params": {"w": jnp.full((2,), 2.0)}, "batch_stats": {}}
    state = TrainState(step=jnp.zeros((), jnp.int32), encoder=enc,
                       generator=gen, base_encoder=enc, enc_opt=None,
                       gen_opt=None)
    path = str(tmp_path / "m.npz")
    ckpt.save_model(state, path)
    blank = state.replace(
        encoder=jax.tree_util.tree_map(jnp.zeros_like, enc),
        generator=jax.tree_util.tree_map(jnp.zeros_like, gen),
    )
    restored = ckpt.load_model(blank, path)
    np.testing.assert_array_equal(restored.encoder["params"]["w"], np.ones((3, 3)))
    np.testing.assert_array_equal(restored.generator["params"]["w"], [2, 2])


def test_metric_logger(tmp_path):
    logger = MetricLogger(str(tmp_path), every=2)
    logger.log(0, {"loss": 1.0})
    logger.log(1, {"loss": 2.0})  # skipped (every=2)
    logger.log(2, {"loss": 3.0})
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2


def test_viz_grid(tmp_path):
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.random((2, 32, 32, 3)).astype(np.float32),
        "landmarks_mp": rng.uniform(-1, 1, (2, 105, 2)).astype(np.float32),
    }
    outputs = {
        "rendered_img": rng.random((2, 32, 32, 3)).astype(np.float32),
        "masked_img": rng.random((2, 32, 32, 3)).astype(np.float32),
        "landmarks_mp": rng.uniform(-1, 1, (2, 105, 2)).astype(np.float32),
    }
    grid = viz.training_grid(batch, outputs)
    assert grid.ndim == 3 and grid.shape[2] == 3
    viz.save_image(grid, str(tmp_path / "g.jpg"))
    assert os.path.getsize(tmp_path / "g.jpg") > 0
