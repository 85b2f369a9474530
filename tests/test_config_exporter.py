"""Config YAML loading, overrides, and importer<->exporter roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp

from smirk_tpu.config import load_config, apply_override


def test_load_reference_style_yaml():
    cfg = load_config("configs/config_train.yaml")
    assert cfg.train.lr == 1e-3
    assert cfg.arch.enable_fuse_generator
    assert cfg.train.loss_weights.cycle_loss == 1.0
    cfg2 = load_config("configs/config_pretrain.yaml")
    assert cfg2.train.optimize_shape and not cfg2.arch.enable_fuse_generator
    assert cfg2.train.loss_weights.mica_loss == 10.0


def test_cli_overrides():
    cfg = load_config("configs/config_train.yaml",
                      overrides=("train.lr=5e-4", "arch.num_shape=100",
                                 "train.loss_weights.cycle_loss=0"))
    assert cfg.train.lr == 5e-4
    assert cfg.arch.num_shape == 100
    assert cfg.train.loss_weights.cycle_loss == 0.0


def test_export_import_roundtrip():
    from smirk_tpu.models.generator import SmirkGenerator
    from smirk_tpu.utils import importer

    gen = SmirkGenerator(init_features=4, res_blocks=1)
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)))
    sd = importer.export_state_dict(v)
    assert "encoder1.enc1conv1.weight" in sd
    assert "upconv4.weight" in sd
    zero = jax.tree_util.tree_map(np.zeros_like, v)
    back = importer.import_state_dict(sd, zero)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_ops_namespace_imports():
    import smirk_tpu.ops as ops

    for name in ("rasterize", "lbs", "compose_mask", "directional_shading",
                 "batch_orth_proj", "rasterize_normals_fused"):
        assert hasattr(ops, name), name


def test_null_yaml_values_use_defaults(tmp_path):
    """Null YAML values at any depth mean 'unset' (OmegaConf `resume:`
    style) — they must not poison typed frozen fields with None."""
    from smirk_tpu.config import Config, load_config

    p = tmp_path / "c.yaml"
    p.write_text("resume:\ndevice:\ntrain:\n  lr:\n  batch_size: 4\n")
    cfg = load_config(str(p))
    d = Config()
    assert cfg.resume == d.resume
    assert cfg.device == d.device
    assert cfg.train.lr == d.train.lr
    assert cfg.train.batch_size == 4
