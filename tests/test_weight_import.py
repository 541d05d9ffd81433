"""Numerical parity of the flax ResNet vs a torch oracle with shared weights.

Builds a minimal torch ResNet (same architecture family as torchvision's),
exports its state_dict, imports into the flax backbone via weight_import, and
compares forward activations — catching padding/stride/BN-layout mistakes
that would silently corrupt checkpoint imports.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from erd_tpu.models import ResNet
from erd_tpu.models.weight_import import load_torchvision_resnet


class TorchBottleneck(tnn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU(inplace=True)
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchResNet50(tnn.Module):
    def __init__(self, stage_blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = 64
        for s, (planes, nb, stride) in enumerate(
                zip((64, 128, 256, 512), stage_blocks, (1, 2, 2, 2))):
            blocks = []
            for b in range(nb):
                blocks.append(TorchBottleneck(inp, planes,
                                              stride if b == 0 else 1))
                inp = planes * 4
            setattr(self, f'layer{s + 1}', tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in range(4):
            x = getattr(self, f'layer{s + 1}')(x)
            outs.append(x)
        return outs


@pytest.mark.parametrize('h,w', [(64, 64), (70, 94)])  # odd sizes stress pads
def test_resnet50_parity_with_torch(h, w):
    torch.manual_seed(0)
    tm = TorchResNet50()
    tm.eval()
    # randomize BN stats so frozen-stat parity is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    net = ResNet(depth=50)
    x = np.random.RandomState(1).randn(1, h, w, 3).astype(np.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables, n = load_torchvision_resnet(variables, state, scope='')
    assert n == len([k for k in state if 'num_batches' not in k])

    outs = jax.jit(net.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tm(torch.as_tensor(x).permute(0, 3, 1, 2))
    for got, want in zip(outs, t_outs):
        want = want.permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape
        # XLA-CPU vs torch conv accumulation order => ~1e-3 relative noise.
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2,
                                   atol=2e-2)
        denom = np.maximum(np.abs(want).mean(), 1e-3)
        assert np.abs(np.asarray(got) - want).mean() / denom < 2e-3


# ---------------------------------------------------------------------------
# Full mmdet GFL checkpoint import: backbone+neck+head key layout + forward
# parity of the composed detector (VERDICT r1 #1.ii).
# ---------------------------------------------------------------------------
class _CM(tnn.Module):
    """mmdet ConvModule with GN: .conv (no bias) + .gn, relu forward."""

    def __init__(self, cin, cout, k=3, stride=1, groups=32):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.gn = tnn.GroupNorm(groups, cout)

    def forward(self, x):
        return torch.relu(self.gn(self.conv(x)))


class _PlainConv(tnn.Module):
    """mmdet FPN ConvModule without norm: .conv with bias, no activation."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2)

    def forward(self, x):
        return self.conv(x)


class _Scale(tnn.Module):
    def __init__(self):
        super().__init__()
        self.scale = tnn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        return x * self.scale


class TorchFPN(tnn.Module):
    """mmdet FPN, GFL config: start_level=1, on_output extras, num_outs=5."""

    def __init__(self, in_ch=(512, 1024, 2048), out=256):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [_PlainConv(c, out, 1) for c in in_ch])
        self.fpn_convs = tnn.ModuleList(
            [_PlainConv(out, out, 3) for _ in in_ch] +
            [_PlainConv(out, out, 3, stride=2) for _ in range(2)])

    def forward(self, feats):
        lat = [l(f) for l, f in zip(self.lateral_convs, feats)]
        for i in range(len(lat) - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + tnn.functional.interpolate(
                lat[i], size=lat[i - 1].shape[-2:], mode='nearest')
        outs = [self.fpn_convs[i](lat[i]) for i in range(len(lat))]
        outs.append(self.fpn_convs[3](outs[-1]))
        outs.append(self.fpn_convs[4](outs[-1]))
        return outs


class TorchGFLHead(tnn.Module):
    def __init__(self, num_classes, ch=256, stacked=4, reg_max=16,
                 levels=5):
        super().__init__()
        self.cls_convs = tnn.ModuleList(
            [_CM(ch, ch) for _ in range(stacked)])
        self.reg_convs = tnn.ModuleList(
            [_CM(ch, ch) for _ in range(stacked)])
        self.gfl_cls = tnn.Conv2d(ch, num_classes, 3, 1, 1)
        self.gfl_reg = tnn.Conv2d(ch, 4 * (reg_max + 1), 3, 1, 1)
        self.scales = tnn.ModuleList([_Scale() for _ in range(levels)])

    def forward(self, feats):
        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            c, r = x, x
            for m in self.cls_convs:
                c = m(c)
            for m in self.reg_convs:
                r = m(r)
            cls_out.append(self.gfl_cls(c))
            reg_out.append(self.scales[lvl](self.gfl_reg(r)))
        return cls_out, reg_out


class TorchGFL(tnn.Module):
    def __init__(self, num_classes=8):
        super().__init__()
        self.backbone = TorchResNet50()
        self.neck = TorchFPN()
        self.bbox_head = TorchGFLHead(num_classes)

    def forward(self, x):
        feats = self.backbone(x)
        return self.bbox_head(self.neck(feats[1:]))


def test_full_mmdet_gfl_checkpoint_import_and_forward_parity():
    """Import a synthetic state_dict with the exact mmdet GFL key layout
    (backbone.* / neck.lateral_convs.* / neck.fpn_convs.* /
    bbox_head.{cls,reg}_convs.*.{conv,gn}.* / bbox_head.gfl_{cls,reg}.* /
    bbox_head.scales.*.scale) and assert the composed forward matches."""
    from erd_tpu.models.detectors.single_stage import GFLNet
    from erd_tpu.models.weight_import import load_mmdet_state_dict

    torch.manual_seed(3)
    C = 8
    tm = TorchGFL(num_classes=C)
    tm.eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
            if isinstance(m, (tnn.BatchNorm2d, tnn.GroupNorm)):
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)
        for s in tm.bbox_head.scales:
            s.scale.uniform_(0.5, 2.0)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    net = GFLNet(num_classes=C)
    x = np.random.RandomState(5).randn(1, 64, 96, 3).astype(np.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables, n = load_mmdet_state_dict(variables, state, strict=True)
    assert n == len([k for k in state if 'num_batches' not in k])

    cls_j, reg_j = jax.jit(net.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        cls_t, reg_t = tm(torch.as_tensor(x).permute(0, 3, 1, 2))
    for got, want in zip(list(cls_j) + list(reg_j),
                         [c.permute(0, 2, 3, 1).numpy() for c in cls_t] +
                         [r.permute(0, 2, 3, 1).numpy() for r in reg_t]):
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-2,
                                   atol=5e-2)
        denom = np.maximum(np.abs(want).mean(), 1e-3)
        assert np.abs(np.asarray(got) - want).mean() / denom < 5e-3
