"""Torch reference models for numerics/importer parity tests.

Fresh torch implementations of the architectures the reference builds via
timm (`tf_mobilenetv3_*_minimal_100`) and its own UNet generator, with
state_dict key names matching what the released SMIRK checkpoints contain.
Used ONLY by tests: random-initialized torch model -> state_dict ->
smirk_tpu importer -> flax forward must equal torch forward.
"""
import math
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

BN_EPS_TF = 1e-3


class Conv2dSame(nn.Conv2d):
    """TF-style SAME padding (asymmetric), like timm's tf_ variants."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )


def bn(c):
    return nn.BatchNorm2d(c, eps=BN_EPS_TF)


class DsBlock(nn.Module):
    def __init__(self, in_c, out_c, stride):
        super().__init__()
        self.conv_dw = Conv2dSame(in_c, in_c, 3, stride, groups=in_c, bias=False)
        self.bn1 = bn(in_c)
        self.conv_pw = Conv2dSame(in_c, out_c, 1, 1, bias=False)
        self.bn2 = bn(out_c)
        self.has_skip = stride == 1 and in_c == out_c

    def forward(self, x):
        s = x
        x = F.relu(self.bn1(self.conv_dw(x)))
        x = self.bn2(self.conv_pw(x))
        return x + s if self.has_skip else x


class IrBlock(nn.Module):
    def __init__(self, in_c, exp_c, out_c, stride):
        super().__init__()
        self.conv_pw = Conv2dSame(in_c, exp_c, 1, 1, bias=False)
        self.bn1 = bn(exp_c)
        self.conv_dw = Conv2dSame(exp_c, exp_c, 3, stride, groups=exp_c, bias=False)
        self.bn2 = bn(exp_c)
        self.conv_pwl = Conv2dSame(exp_c, out_c, 1, 1, bias=False)
        self.bn3 = bn(out_c)
        self.has_skip = stride == 1 and in_c == out_c

    def forward(self, x):
        s = x
        x = F.relu(self.bn1(self.conv_pw(x)))
        x = F.relu(self.bn2(self.conv_dw(x)))
        x = self.bn3(self.conv_pwl(x))
        return x + s if self.has_skip else x


class CnBlock(nn.Module):
    def __init__(self, in_c, out_c, stride):
        super().__init__()
        self.conv = Conv2dSame(in_c, out_c, 1, stride, bias=False)
        self.bn1 = bn(out_c)

    def forward(self, x):
        return F.relu(self.bn1(self.conv(x)))


class MobileNetV3FeaturesTorch(nn.Module):
    def __init__(self, stages):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 16, 3, 2, bias=False)
        self.bn1 = bn(16)
        blocks = nn.ModuleList()
        in_c = 16
        for stage in stages:
            mods = nn.ModuleList()
            for btype, exp_c, out_c, stride in stage:
                if btype == "ds":
                    mods.append(DsBlock(in_c, out_c, stride))
                elif btype == "ir":
                    mods.append(IrBlock(in_c, exp_c, out_c, stride))
                else:
                    mods.append(CnBlock(in_c, out_c, stride))
                in_c = out_c
            blocks.append(mods)
        self.blocks = blocks
        self.out_chs = in_c

    def forward(self, x):
        x = F.relu(self.bn1(self.conv_stem(x)))
        feats = []
        for stage in self.blocks:
            for b in stage:
                x = b(x)
            feats.append(x)
        return feats


class SmirkEncoderTorch(nn.Module):
    """pose/shape/expression encoders with SMIRK checkpoint naming."""

    def __init__(self, small_stages, large_stages, n_shape=300, n_exp=50):
        super().__init__()

        class Sub(nn.Module):
            def __init__(self, stages, head_name, head_dim):
                super().__init__()
                self.encoder = MobileNetV3FeaturesTorch(stages)
                setattr(
                    self,
                    head_name,
                    nn.Sequential(nn.Linear(self.encoder.out_chs, head_dim)),
                )
                self.head_name = head_name

            def forward(self, img):
                f = self.encoder(img)[-1]
                f = F.adaptive_avg_pool2d(f, (1, 1)).flatten(1)
                return getattr(self, self.head_name)(f)

        self.pose_encoder = Sub(small_stages, "pose_cam_layers", 6)
        self.shape_encoder = Sub(large_stages, "shape_layers", n_shape)
        self.expression_encoder = Sub(large_stages, "expression_layers", n_exp + 5)
        self.n_exp = n_exp

    def forward(self, img):
        pose_cam = self.pose_encoder(img)
        shape = self.shape_encoder(img)
        p = self.expression_encoder(img)
        n = self.n_exp
        return {
            "pose_params": pose_cam[..., :3],
            "cam": pose_cam[..., 3:],
            "shape_params": shape,
            "expression_params": p[..., :n],
            "eyelid_params": torch.clamp(p[..., n : n + 2], 0, 1),
            "jaw_params": torch.cat(
                [
                    F.relu(p[..., n + 2].unsqueeze(-1)),
                    torch.clamp(p[..., n + 3 : n + 5], -0.2, 0.2),
                ],
                dim=-1,
            ),
        }


# ----------------------------- UNet generator -----------------------------


def _block(in_c, feat, name):
    return nn.Sequential(
        OrderedDict(
            [
                (name + "conv1", nn.Conv2d(in_c, feat, 3, padding=1, bias=False)),
                (name + "norm1", nn.BatchNorm2d(feat)),
                (name + "relu1", nn.ReLU(inplace=True)),
                (name + "conv2", nn.Conv2d(feat, feat, 3, padding=1, bias=False)),
                (name + "norm2", nn.BatchNorm2d(feat)),
                (name + "relu2", nn.ReLU(inplace=True)),
            ]
        )
    )


class ResnetBlockTorch(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(1),
            nn.Conv2d(dim, dim, 3, bias=False),
            nn.BatchNorm2d(dim),
            nn.ReLU(True),
            nn.ReflectionPad2d(1),
            nn.Conv2d(dim, dim, 3, bias=False),
            nn.BatchNorm2d(dim),
        )

    def forward(self, x):
        return x + self.conv_block(x)


class SmirkGeneratorTorch(nn.Module):
    def __init__(self, in_channels=6, out_channels=3, init_features=32, res_blocks=5):
        super().__init__()
        f = init_features
        self.encoder1 = _block(in_channels, f, "enc1")
        self.pool1 = nn.MaxPool2d(2, 2)
        self.encoder2 = _block(f, f * 2, "enc2")
        self.pool2 = nn.MaxPool2d(2, 2)
        self.encoder3 = _block(f * 2, f * 4, "enc3")
        self.pool3 = nn.MaxPool2d(2, 2)
        self.encoder4 = _block(f * 4, f * 8, "enc4")
        self.pool4 = nn.MaxPool2d(2, 2)
        self.bottleneck = _block(f * 8, f * 16, "bottleneck")
        self.resnet_blocks = nn.ModuleList(
            [ResnetBlockTorch(f * 16) for _ in range(res_blocks)]
        )
        self.upconv4 = nn.ConvTranspose2d(f * 16, f * 8, 2, 2)
        self.decoder4 = _block(f * 16, f * 8, "dec4")
        self.upconv3 = nn.ConvTranspose2d(f * 8, f * 4, 2, 2)
        self.decoder3 = _block(f * 8, f * 4, "dec3")
        self.upconv2 = nn.ConvTranspose2d(f * 4, f * 2, 2, 2)
        self.decoder2 = _block(f * 4, f * 2, "dec2")
        self.upconv1 = nn.ConvTranspose2d(f * 2, f, 2, 2)
        self.decoder1 = _block(f * 2, f, "dec1")
        self.conv = nn.Conv2d(f, out_channels, 1)

    def forward(self, x):
        e1 = self.encoder1(x)
        e2 = self.encoder2(self.pool1(e1))
        e3 = self.encoder3(self.pool2(e2))
        e4 = self.encoder4(self.pool3(e3))
        b = self.bottleneck(self.pool4(e4))
        for rb in self.resnet_blocks:
            b = rb(b)
        d4 = self.decoder4(torch.cat([self.upconv4(b), e4], dim=1))
        d3 = self.decoder3(torch.cat([self.upconv3(d4), e3], dim=1))
        d2 = self.decoder2(torch.cat([self.upconv2(d3), e2], dim=1))
        d1 = self.decoder1(torch.cat([self.upconv1(d2), e1], dim=1))
        return torch.sigmoid(self.conv(d1))


def randomize_bn_stats(model, gen):
    """Give BN layers nontrivial running stats so eval parity is meaningful."""
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d,)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.1
            )
            m.running_var.copy_(
                1.0 + 0.3 * torch.rand(m.running_var.shape, generator=gen)
            )
            m.weight.data.copy_(
                1.0 + 0.2 * torch.randn(m.weight.shape, generator=gen)
            )
            m.bias.data.copy_(0.1 * torch.randn(m.bias.shape, generator=gen))
