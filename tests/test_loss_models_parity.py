"""Parity tests for the frozen loss networks vs the reference torch code.

These load the reference implementations live from /root/reference (skipped
when unavailable) with reduced block depths — every block type, stride, and
naming rule is still exercised — and check torch-forward == flax-forward
after running the state dict through the importer.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smirk_tpu.utils import importer  # noqa: E402


def _load_ref(relpath, name):
    for mod in ("cv2",):
        # stub only if genuinely missing — a fake module would shadow the
        # real one for every later test in the process
        try:
            __import__(mod)
        except ImportError:
            sys.modules.setdefault(mod, types.ModuleType(mod))
    for pkg in ("src", "src.FLAME", "src.renderer", "src.utils", "src.losses",
                "src.models", "src.models.MICA"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(REF, *pkg.split(".")[1:])]
            sys.modules[pkg] = m
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize_bn(model, gen):
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.1, generator=gen)
            m.running_var.uniform_(0.8, 1.3, generator=gen)
            m.weight.data.normal_(1.0, 0.1, generator=gen)
            m.bias.data.normal_(0, 0.05, generator=gen)


def test_emoca_resnet_parity(monkeypatch):
    resnet = _load_ref("src/losses/resnet.py", "ref_resnet")
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(0)
    tmodel = resnet.ResNet(
        resnet.Bottleneck, [1, 1, 1, 1], include_top=False, emoca_specific=True
    ).eval()
    with torch.no_grad():
        _randomize_bn(tmodel, gen)

    from smirk_tpu.models import emoca_resnet

    monkeypatch.setattr(emoca_resnet, "LAYERS_R50", [1, 1, 1, 1])
    fmodel = emoca_resnet.EmocaResNet50()

    x = np.random.default_rng(0).random((2, 3, 224, 224), np.float32)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x)).flatten(1).numpy()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = fmodel.init(jax.random.PRNGKey(0),
                            jnp.asarray(x.transpose(0, 2, 3, 1)))
    # reference state dict contains fc.* (unused with include_top=False)
    variables = importer.import_state_dict(sd, variables)
    out_f = np.asarray(fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out_f, out_t, rtol=1e-4, atol=1e-4)


def test_mica_parity(monkeypatch):
    arcface = _load_ref("src/models/MICA/arcface.py", "src.models.MICA.arcface")
    mica_mod = _load_ref("src/models/MICA/mica.py", "ref_mica")
    torch.manual_seed(1)
    gen = torch.Generator().manual_seed(1)

    t_arc = arcface.IResNet(arcface.IBasicBlock, [1, 1, 1, 1]).eval()
    t_map = mica_mod.MappingNetwork(512, 300, 300, hidden=3).eval()
    with torch.no_grad():
        _randomize_bn(t_arc, gen)

    x = np.random.default_rng(1).random((2, 3, 112, 112), np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x).sub(0.5).div(0.5)[:, [2, 1, 0]]
        emb = torch.nn.functional.normalize(t_arc(xt))
        out_t = t_map(emb).numpy()

    from smirk_tpu.models import mica as fmica

    monkeypatch.setattr(fmica, "IRESNET100_LAYERS", [1, 1, 1, 1])
    fmodel = fmica.Mica()
    sd = {}
    sd.update({f"arcface.{k}": v.numpy() for k, v in t_arc.state_dict().items()})
    sd.update({f"regressor.{k}": v.numpy() for k, v in t_map.state_dict().items()})
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fmodel.init(jax.random.PRNGKey(0), x_nhwc)
    variables = importer.import_state_dict(sd, variables)
    out_f = np.asarray(fmodel.apply(variables, x_nhwc))
    np.testing.assert_allclose(out_f, out_t, rtol=2e-4, atol=2e-4)


def test_vgg_features_parity():
    """Torch twin of the vgg16 feature slices (torchvision naming)."""
    from smirk_tpu.models import vgg as fvgg

    torch.manual_seed(2)
    layers = {}
    seq = []
    in_ch = 3
    flat_convs = [(i, c) for block in fvgg.VGG16_BLOCK_CONVS for i, c in block]
    conv_by_idx = dict(flat_convs)
    for idx in range(23):
        if idx in conv_by_idx:
            conv = torch.nn.Conv2d(in_ch, conv_by_idx[idx], 3, padding=1)
            in_ch = conv_by_idx[idx]
            layers[str(idx)] = conv
            seq.append(conv)
        elif idx in (4, 9, 16):
            seq.append(torch.nn.MaxPool2d(2, 2))
        else:
            seq.append(torch.nn.ReLU())
    tfeat = torch.nn.Sequential(*seq).eval()

    x = np.random.default_rng(2).random((1, 3, 64, 64), np.float32)
    outs_t = []
    with torch.no_grad():
        h = torch.from_numpy(x)
        for i, m in enumerate(tfeat):
            h = m(h)
            if i in (3, 8, 15, 22):
                outs_t.append(h.numpy())

    sd = {f"features.{k}.{n}": p.detach().numpy()
          for k, conv in layers.items() for n, p in conv.named_parameters()}
    fmodel = fvgg.VGG16Features()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fmodel.init(jax.random.PRNGKey(0), x_nhwc)
    variables = importer.import_state_dict(sd, variables)
    outs_f = fmodel.apply(variables, x_nhwc)
    for a, b in zip(outs_f, outs_t):
        np.testing.assert_allclose(
            np.asarray(a), b.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )


def test_teacher_loaders_roundtrip(tmp_path, monkeypatch):
    """teachers.load_* consume the released checkpoint FORMATS correctly
    (reduced-depth fakes with the exact key layouts)."""
    arcface = sys.modules.get("src.models.MICA.arcface") or _load_ref(
        "src/models/MICA/arcface.py", "src.models.MICA.arcface"
    )
    mica_mod = _load_ref("src/models/MICA/mica.py", "ref_mica2")
    resnet = _load_ref("src/losses/resnet.py", "ref_resnet2")

    from smirk_tpu.models import emoca_resnet, mica as fmica, teachers

    monkeypatch.setattr(fmica, "IRESNET100_LAYERS", [1, 1, 1, 1])
    monkeypatch.setattr(emoca_resnet, "LAYERS_R50", [1, 1, 1, 1])

    torch.manual_seed(3)
    # mica.tar format: {'arcface': sd, 'flameModel': sd with regressor.* keys}
    t_arc = arcface.IResNet(arcface.IBasicBlock, [1, 1, 1, 1])
    t_map = mica_mod.MappingNetwork(512, 300, 300, hidden=3)
    mica_tar = {
        "arcface": t_arc.state_dict(),
        "flameModel": {f"regressor.{k}": v for k, v in
                       t_map.state_dict().items()},
    }
    p1 = str(tmp_path / "mica.tar")
    torch.save(mica_tar, p1)
    v = teachers.load_mica_teacher(p1)
    assert v is not None and "params" in v

    # EMOCA ckpt format: {'state_dict': {'backbone.*': ...}}
    t_r50 = resnet.ResNet(resnet.Bottleneck, [1, 1, 1, 1],
                          include_top=True, emoca_specific=True)
    ckpt = {"state_dict": {f"backbone.{k}": v for k, v in
                           t_r50.state_dict().items()}}
    p2 = str(tmp_path / "emotion.ckpt")
    torch.save(ckpt, p2)
    v2 = teachers.load_emotion_teacher(p2)
    assert v2 is not None and "batch_stats" in v2

    assert teachers.load_mica_teacher(None) is None
    assert teachers.load_vgg_teacher(str(tmp_path / "missing.pth")) is None
