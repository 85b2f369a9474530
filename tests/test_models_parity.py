"""Numerics parity: flax models + torch-checkpoint importer vs torch refs.

A randomly initialized torch model (with nontrivial BN running stats) is
exported to a state dict, imported into the flax twins via
smirk_tpu.utils.importer, and both are run on the same input. This validates
architecture, TF-SAME padding, BN eps, layout conversions, and key mapping —
the pieces the <1e-3 checkpoint-parity gate depends on.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from smirk_tpu.models.encoders import SmirkEncoder
from smirk_tpu.models.generator import SmirkGenerator
from smirk_tpu.models.mobilenetv3 import SMALL_MINIMAL, LARGE_MINIMAL
from smirk_tpu.utils import importer

from torch_ref import (
    SmirkEncoderTorch,
    SmirkGeneratorTorch,
    randomize_bn_stats,
)

# tiny param counts for CI speed: still covers every block type/stride
TINY_SMALL = [
    [("ds", 16, 16, 2)],
    [("ir", 24, 24, 2), ("ir", 32, 24, 1)],
    [("cn", 0, 40, 1)],
]
TINY_LARGE = [
    [("ds", 16, 16, 1)],
    [("ir", 24, 24, 2)],
    [("ir", 40, 32, 2), ("ir", 48, 32, 1)],
    [("cn", 0, 56, 1)],
]


def _forward_pair(torch_model, flax_model, x_nchw, prefix=""):
    torch_model.eval()
    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(x_nchw))
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    import jax

    variables = flax_model.init(jax.random.PRNGKey(0), x_nhwc)
    variables = importer.import_state_dict(sd, variables, prefix=prefix)
    out_f = flax_model.apply(variables, x_nhwc)
    return out_t, out_f


@pytest.mark.parametrize("arch_key", ["tiny_archs"])
def test_encoder_parity(arch_key, monkeypatch):
    # patch both implementations to the tiny arch tables
    from smirk_tpu.models import mobilenetv3 as mnv3

    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_small_minimal_100", (TINY_SMALL, 40)
    )
    monkeypatch.setitem(
        mnv3.ARCHS, "tf_mobilenetv3_large_minimal_100", (TINY_LARGE, 56)
    )

    gen = torch.Generator().manual_seed(0)
    torch.manual_seed(0)
    tmodel = SmirkEncoderTorch(TINY_SMALL, TINY_LARGE, n_shape=30, n_exp=10)
    with torch.no_grad():
        randomize_bn_stats(tmodel, gen)
        # make zero-init heads nontrivial
        for sub in (tmodel.shape_encoder.shape_layers,):
            sub[0].weight.data.normal_(0, 0.05, generator=gen)
            sub[0].bias.data.normal_(0, 0.05, generator=gen)

    x = np.random.default_rng(0).random((2, 3, 64, 64), np.float32)
    fmodel = SmirkEncoder(n_exp=10, n_shape=30)
    out_t, out_f = _forward_pair(tmodel, fmodel, x)

    for key in ["pose_params", "cam", "shape_params", "expression_params",
                "eyelid_params", "jaw_params"]:
        np.testing.assert_allclose(
            np.asarray(out_f[key]),
            out_t[key].numpy(),
            rtol=1e-4,
            atol=2e-5,
            err_msg=key,
        )


# timm arch-definition strings for the two "minimal" variants
# (timm mobilenetv3.py _gen_mobilenet_v3, 'minimal' branches). Kept as DATA:
# an independent spelling of the architecture that the repo's precomputed
# tables must decode to. Catches a wrong expansion/stride/count in any row.
TIMM_SMALL_MINIMAL_SPEC = [
    ["ds_r1_k3_s2_e1_c16"],
    ["ir_r1_k3_s2_e4.5_c24", "ir_r1_k3_s1_e3.67_c24"],
    ["ir_r1_k3_s2_e4_c40", "ir_r2_k3_s1_e6_c40"],
    ["ir_r2_k3_s1_e3_c48"],
    ["ir_r3_k3_s2_e6_c96"],
    ["cn_r1_k1_s1_c576"],
]
TIMM_LARGE_MINIMAL_SPEC = [
    ["ds_r1_k3_s1_e1_c16"],
    ["ir_r1_k3_s2_e4_c24", "ir_r1_k3_s1_e3_c24"],
    ["ir_r3_k3_s2_e3_c40"],
    ["ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"],
    ["ir_r2_k3_s1_e6_c112"],
    ["ir_r3_k3_s2_e6_c160"],
    ["cn_r1_k1_s1_c960"],
]


def _make_divisible(v, divisor=8, round_limit=0.9):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def _decode_timm_spec(spec, stem_chs=16):
    """timm block-string decoder -> [(btype, exp_chs, out_chs, stride)] stages."""
    stages, in_chs = [], stem_chs
    for stage_spec in spec:
        stage = []
        for block in stage_spec:
            parts = dict(
                (p[:1], p[1:]) for p in block.split("_")
            )  # {'d': 's'|..., 'r': n, 'k': k, 's': s, 'e': ratio, 'c': out}
            btype = block.split("_")[0]
            repeats = int(parts["r"])
            stride = int(parts["s"])
            out_chs = int(parts["c"])
            exp_ratio = float(parts["e"]) if "e" in parts else 0.0
            for i in range(repeats):
                exp = _make_divisible(in_chs * exp_ratio) if btype == "ir" else (
                    in_chs if btype == "ds" else 0
                )
                stage.append((btype, exp if btype == "ir" else (exp if btype == "ds" else 0),
                              out_chs, stride if i == 0 else 1))
                in_chs = out_chs
        stages.append(stage)
    return stages


def test_arch_tables_match_timm_spec():
    """The precomputed SMALL/LARGE tables decode exactly from timm's specs.

    An error in any row (wrong expansion count, stride, residual condition)
    fails here even though the torch twin is built from the same tables.
    """
    small = _decode_timm_spec(TIMM_SMALL_MINIMAL_SPEC)
    # ds blocks carry exp==in_chs implicitly; repo tables record exp==in_chs
    # for 'ds' and 0 for 'cn'
    assert len(small) == len(SMALL_MINIMAL)
    for got, want in zip(small, SMALL_MINIMAL):
        assert got == list(want), (got, want)

    large = _decode_timm_spec(TIMM_LARGE_MINIMAL_SPEC)
    assert len(large) == len(LARGE_MINIMAL)
    for got, want in zip(large, LARGE_MINIMAL):
        assert got == list(want), (got, want)


def test_encoder_parity_fullsize():
    """Full-size (real tables) torch-twin forward parity at 224px.

    Covers what the tiny-table test cannot: TF-SAME asymmetric padding on the
    real 224->7 stride pyramid, every full-size stage row, residual/skip
    conditions at real channel counts, and the importer key map over all 31
    blocks x 3 encoders. Reference head semantics per smirk_encoder.py:14-110.
    """
    gen = torch.Generator().manual_seed(7)
    torch.manual_seed(7)
    tmodel = SmirkEncoderTorch(SMALL_MINIMAL, LARGE_MINIMAL,
                               n_shape=300, n_exp=50)
    with torch.no_grad():
        randomize_bn_stats(tmodel, gen)
        for sub in (tmodel.pose_encoder.pose_cam_layers,
                    tmodel.shape_encoder.shape_layers,
                    tmodel.expression_encoder.expression_layers):
            sub[0].weight.data.normal_(0, 0.05, generator=gen)
            sub[0].bias.data.normal_(0, 0.05, generator=gen)

    x = np.random.default_rng(7).random((1, 3, 224, 224), np.float32)
    fmodel = SmirkEncoder(n_exp=50, n_shape=300)
    out_t, out_f = _forward_pair(tmodel, fmodel, x)

    for key in ["pose_params", "cam", "shape_params", "expression_params",
                "eyelid_params", "jaw_params"]:
        np.testing.assert_allclose(
            np.asarray(out_f[key]),
            out_t[key].numpy(),
            rtol=1e-3,
            atol=1e-4,
            err_msg=key,
        )


def test_full_backbone_shapes():
    """Real (non-tiny) arch tables produce timm's documented feature dims."""
    import jax

    from smirk_tpu.models.mobilenetv3 import MobileNetV3Features

    x = jnp.zeros((1, 224, 224, 3))
    for arch, dim, n_stages in [
        ("tf_mobilenetv3_small_minimal_100", 576, 6),
        ("tf_mobilenetv3_large_minimal_100", 960, 7),
    ]:
        m = MobileNetV3Features(arch)
        variables = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(variables, x)
        assert len(feats) == n_stages
        assert feats[-1].shape == (1, 7, 7, dim), arch


def test_generator_parity():
    torch.manual_seed(1)
    gen = torch.Generator().manual_seed(1)
    tmodel = SmirkGeneratorTorch(in_channels=6, out_channels=3,
                                 init_features=8, res_blocks=2)
    with torch.no_grad():
        randomize_bn_stats(tmodel, gen)

    x = np.random.default_rng(1).random((2, 6, 64, 64), np.float32)
    fmodel = SmirkGenerator(in_channels=6, out_channels=3, init_features=8,
                            res_blocks=2)
    out_t, out_f = _forward_pair(tmodel, fmodel, x)
    np.testing.assert_allclose(
        np.asarray(out_f),
        out_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4,
        atol=2e-5,
    )


def test_backbone_init_from_raw_timm_state_dicts():
    """arch.backbone_init_{small,large}: raw timm tf_mobilenetv3 state
    dicts (conv_stem./bn1./blocks.i.j... keys, no smirk_encoder prefix)
    initialize the three encoders' feature extractors; heads keep their
    init (reference smirk_encoder.py:7-12 pretrained=True semantics)."""
    import jax
    import jax.numpy as jnp
    import torch

    from smirk_tpu.models.encoders import SmirkEncoder
    from smirk_tpu.utils import importer
    from tests.torch_ref import MobileNetV3FeaturesTorch

    small = [[("ds", 16, 16, 2)], [("ir", 24, 24, 2)], [("cn", 0, 40, 1)]]
    large = [[("ds", 16, 16, 1)], [("ir", 24, 24, 2)], [("cn", 0, 48, 1)]]
    torch.manual_seed(0)
    tw_small = MobileNetV3FeaturesTorch(small)
    tw_large = MobileNetV3FeaturesTorch(large)
    # extra timm-checkpoint keys (conv_head/classifier) must be ignored
    small_sd = {**{k: v for k, v in tw_small.state_dict().items()},
                "conv_head.weight": torch.zeros(1),
                "classifier.bias": torch.zeros(1)}
    large_sd = dict(tw_large.state_dict())

    from smirk_tpu.models import mobilenetv3 as mnv3
    orig = dict(mnv3.ARCHS)
    mnv3.ARCHS["tf_mobilenetv3_small_minimal_100"] = (small, 40)
    mnv3.ARCHS["tf_mobilenetv3_large_minimal_100"] = (large, 48)
    try:
        enc = SmirkEncoder(n_exp=10, n_shape=30)
        variables = enc.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)), train=False)
        variables = jax.tree_util.tree_map(np.asarray, dict(variables))
        out = importer.init_backbones_from_state_dicts(
            variables, small_sd, large_sd)
    finally:
        mnv3.ARCHS.clear()
        mnv3.ARCHS.update(orig)

    # backbone conv_stem imported (OIHW -> HWIO) per encoder
    np.testing.assert_array_equal(
        out["params"]["pose_encoder"]["encoder"]["conv_stem"]["kernel"],
        importer.convert_conv(small_sd["conv_stem.weight"]))
    for e in ("shape_encoder", "expression_encoder"):
        np.testing.assert_array_equal(
            out["params"][e]["encoder"]["conv_stem"]["kernel"],
            importer.convert_conv(large_sd["conv_stem.weight"]))
    # BN running stats land in batch_stats
    np.testing.assert_array_equal(
        out["batch_stats"]["pose_encoder"]["encoder"]["bn1"]["mean"],
        small_sd["bn1.running_mean"].numpy())
    # heads keep their init
    np.testing.assert_array_equal(
        out["params"]["pose_encoder"]["pose_cam_layers_0"]["kernel"],
        variables["params"]["pose_encoder"]["pose_cam_layers_0"]["kernel"])
