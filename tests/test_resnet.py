"""ResNet tower tests against torch-built reference blocks."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as nn

from jcf_tpu.models.resnet import (
    avg_pool,
    batch_norm,
    conv2d,
    init_resnet50_params,
    max_pool,
    moco_params_from_state_dict,
    resnet50_features,
    _tv_bottleneck,
)

RNG = np.random.default_rng(21)


def test_conv_bn_pool_match_torch():
    x = RNG.standard_normal((2, 3, 16, 16)).astype(np.float32)
    w = (RNG.standard_normal((8, 3, 3, 3)) * 0.1).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1))
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    bn = nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(RNG.standard_normal(8).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(RNG.standard_normal(8).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(RNG.standard_normal(8).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(np.abs(RNG.standard_normal(8)).astype(np.float32) + 0.5))
    p = {
        "weight": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "running_mean": jnp.asarray(bn.running_mean.numpy()),
        "running_var": jnp.asarray(bn.running_var.numpy()),
    }
    y = RNG.standard_normal((2, 8, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(batch_norm(jnp.asarray(y), p)),
        bn(torch.from_numpy(y)).detach().numpy(),
        atol=1e-4,
    )

    np.testing.assert_allclose(
        np.asarray(avg_pool(jnp.asarray(y), 2, 2)),
        torch.nn.functional.avg_pool2d(torch.from_numpy(y), 2, 2).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(max_pool(jnp.asarray(y), 3, 2, 1)),
        torch.nn.functional.max_pool2d(torch.from_numpy(y), 3, 2, 1).numpy(),
        atol=1e-5,
    )


class TorchBottleneck(nn.Module):
    """torchvision-style bottleneck built from scratch for the test."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.standard_normal(bn.weight.shape[0]).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.standard_normal(bn.bias.shape[0]).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(0.1 * rng.standard_normal(bn.weight.shape[0]).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy((np.abs(rng.standard_normal(bn.weight.shape[0])) + 0.5).astype(np.float32)))


def _bn_params(bn):
    return {
        "weight": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "running_mean": jnp.asarray(bn.running_mean.numpy()),
        "running_var": jnp.asarray(bn.running_var.numpy()),
    }


@pytest.mark.parametrize("stride", [1, 2])
def test_tv_bottleneck_matches_torch(stride):
    tb = TorchBottleneck(16, 8, stride).eval()
    rng = np.random.default_rng(1)
    for bn in (tb.bn1, tb.bn2, tb.bn3):
        _randomize_bn(bn, rng)
    if tb.downsample is not None:
        _randomize_bn(tb.downsample[1], rng)

    p = {
        "conv1": jnp.asarray(tb.conv1.weight.detach().numpy()),
        "bn1": _bn_params(tb.bn1),
        "conv2": jnp.asarray(tb.conv2.weight.detach().numpy()),
        "bn2": _bn_params(tb.bn2),
        "conv3": jnp.asarray(tb.conv3.weight.detach().numpy()),
        "bn3": _bn_params(tb.bn3),
    }
    if tb.downsample is not None:
        p["downsample"] = {
            "conv": jnp.asarray(tb.downsample[0].weight.detach().numpy()),
            "bn": _bn_params(tb.downsample[1]),
        }

    x = RNG.standard_normal((2, 16, 8, 8)).astype(np.float32)
    ours = np.asarray(_tv_bottleneck(jnp.asarray(x), p, stride))
    theirs = tb(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_resnet50_end_to_end_shape_and_prefix_strip():
    params = init_resnet50_params(0)
    x = jnp.asarray(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32))
    feats = resnet50_features(params, x)
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()

    # moco prefix-strip: wrap a fake flat dict and reload
    import jax

    flat = {}

    def record(path, leaf):
        return leaf

    # round-trip through a fake base_encoder-prefixed state dict
    from jcf_tpu.models.resnet import RESNET50_LAYERS

    sd = {}
    sd["base_encoder.conv1.weight"] = np.asarray(params["conv1"])
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"base_encoder.bn1.{k}"] = np.asarray(params["bn1"][k])
    for si, n in enumerate(RESNET50_LAYERS, start=1):
        for b in range(n):
            blk = params["layers"][si - 1][b]
            pre = f"base_encoder.layer{si}.{b}"
            for ci in (1, 2, 3):
                sd[f"{pre}.conv{ci}.weight"] = np.asarray(blk[f"conv{ci}"])
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.bn{ci}.{k}"] = np.asarray(blk[f"bn{ci}"][k])
            if "downsample" in blk:
                sd[f"{pre}.downsample.0.weight"] = np.asarray(blk["downsample"]["conv"])
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.downsample.1.{k}"] = np.asarray(blk["downsample"]["bn"][k])
    sd["base_encoder.fc.weight"] = np.zeros((10, 2048), np.float32)  # dropped

    params2 = moco_params_from_state_dict(sd)
    feats2 = resnet50_features(params2, x)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2), atol=1e-6)
