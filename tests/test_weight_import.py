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
