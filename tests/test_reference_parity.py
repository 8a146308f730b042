"""Cross-framework parity: our JAX implementations vs the reference PyTorch
code imported directly from /root/reference (read-only), run on CPU.

These tests back every "behavioral contract" docstring with a live oracle:
  (a) ops.upfirdn2d / ops.bias_act   vs torch_utils/ops/{upfirdn2d,bias_act}.py
      reference paths (_upfirdn2d_ref :169, _bias_act_ref :94)
  (b) models.arcface                 vs id_loss/model_irse.py:10 Backbone
  (c) models.mtcnn nets              vs MTCNN/get_nets.py with the REAL
      in-tree weights (MTCNN/weights/{p,r,o}net.npy)
  (d) models.mapper                  vs latent_mappers.py:68 Mapper
  (e) models.mobilenet               vs mobilenet_facial.py:55 MobileNet_GDConv
  (f) models.deeplab                 vs deeplab.py:26-212 resnet101+ASPP

Reference modules are treated as UNTRUSTED third-party code: we import and
execute their nn.Module graphs for numerics only. The rosinality CUDA op
package (encoder4editing/models/stylegan2/op) compiles kernels at import
time, so it is replaced in sys.modules by a pure-torch stub implementing the
documented fused_leaky_relu math before latent_mappers is imported.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

if REF not in sys.path:
    sys.path.append(REF)  # append, not insert: never shadow our own modules


def _seed_rosinality_op_stub():
    """Pure-torch stand-in for encoder4editing.models.stylegan2.op, which
    otherwise JIT-compiles CUDA kernels at import (fused_act.py:9-16)."""
    name = "encoder4editing.models.stylegan2.op"
    if name in sys.modules:
        return
    import torch.nn.functional as F

    mod = types.ModuleType(name)

    def fused_leaky_relu(input, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            rest_dim = [1] * (input.ndim - bias.ndim - 1)
            input = input + bias.view(1, bias.shape[0], *rest_dim)
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(input, self.bias, self.negative_slope,
                                    self.scale)

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        # the rosinality native path is convolution (flipped kernel) with
        # symmetric padding — exactly ADA's _upfirdn2d_ref semantics
        from torch_utils.ops.upfirdn2d import _upfirdn2d_ref
        return _upfirdn2d_ref(input, kernel, up=up, down=down,
                              padding=[pad[0], pad[1], pad[0], pad[1]])

    mod.fused_leaky_relu = fused_leaky_relu
    mod.FusedLeakyReLU = FusedLeakyReLU
    mod.upfirdn2d = upfirdn2d
    sys.modules[name] = mod


def _seed_torchvision_stub():
    """torchvision is not installed in this image. mobilenet_facial.py only
    needs torchvision.models.mobilenet_v2 and latent_mappers.py only imports
    (and never uses) torchvision.transforms, so provide a faithful torch
    MobileNetV2 whose state_dict layout matches torchvision's exactly —
    that layout IS the checkpoint contract MobileNet_GDConv relies on."""
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401
        return
    except ImportError:
        pass
    import torch.nn as nn

    def conv_bn_relu(inp, oup, k, stride, groups=1):
        return nn.Sequential(
            nn.Conv2d(inp, oup, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(oup),
            nn.ReLU6(inplace=True),
        )

    class InvertedResidual(nn.Module):
        def __init__(self, inp, oup, stride, expand_ratio):
            super().__init__()
            hidden = int(round(inp * expand_ratio))
            self.use_res = stride == 1 and inp == oup
            layers = []
            if expand_ratio != 1:
                layers.append(conv_bn_relu(inp, hidden, 1, 1))
            layers.extend([
                conv_bn_relu(hidden, hidden, 3, stride, groups=hidden),
                nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                nn.BatchNorm2d(oup),
            ])
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class MobileNetV2(nn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            setting = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                       (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                       (6, 320, 1, 1)]
            features = [conv_bn_relu(3, 32, 3, 2)]
            inp = 32
            for t, c, n, s in setting:
                for i in range(n):
                    features.append(InvertedResidual(
                        inp, c, s if i == 0 else 1, t))
                    inp = c
            features.append(conv_bn_relu(inp, 1280, 1, 1))
            self.features = nn.Sequential(*features)
            self.classifier = nn.Sequential(nn.Dropout(0.2),
                                            nn.Linear(1280, num_classes))

        def forward(self, x):
            x = self.features(x)
            x = nn.functional.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
            return self.classifier(x)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_transforms = types.ModuleType("torchvision.transforms")

    def mobilenet_v2(pretrained=False, **kwargs):
        assert not pretrained, "stub has no pretrained weights"
        return MobileNetV2(**kwargs)

    tv_models.mobilenet_v2 = mobilenet_v2

    # AlexNet / VGG16 `features` sequentials in the torchvision layout —
    # the backbone contract criteria/lpips/networks.py taps into.
    class _AlexNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
                nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
                nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2),
            )

    class _VGG16(nn.Module):
        def __init__(self):
            super().__init__()
            layers, inp = [], 3
            for c in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                      512, 512, 512, "M", 512, 512, 512, "M"]:
                if c == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers += [nn.Conv2d(inp, c, 3, 1, 1),
                               nn.ReLU(inplace=True)]
                    inp = c
            self.features = nn.Sequential(*layers)

    # torchvision squeezenet1_1: Fire submodules named squeeze/expand1x1/
    # expand3x3, ceil-mode MaxPool(3,2) — the layout networks.py:70 taps.
    class _Fire(nn.Module):
        def __init__(self, inp, sq, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(inp, sq, 1)
            self.squeeze_activation = nn.ReLU(inplace=True)
            self.expand1x1 = nn.Conv2d(sq, e1, 1)
            self.expand1x1_activation = nn.ReLU(inplace=True)
            self.expand3x3 = nn.Conv2d(sq, e3, 3, padding=1)
            self.expand3x3_activation = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x))], 1)

    class _SqueezeNet11(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 3, 2), nn.ReLU(inplace=True),
                nn.MaxPool2d(3, 2, ceil_mode=True),
                _Fire(64, 16, 64, 64), _Fire(128, 16, 64, 64),
                nn.MaxPool2d(3, 2, ceil_mode=True),
                _Fire(128, 32, 128, 128), _Fire(256, 32, 128, 128),
                nn.MaxPool2d(3, 2, ceil_mode=True),
                _Fire(256, 48, 192, 192), _Fire(384, 48, 192, 192),
                _Fire(384, 64, 256, 256), _Fire(512, 64, 256, 256),
            )

    def alexnet(pretrained=False, weights=None, **kw):
        return _AlexNet()

    def vgg16(pretrained=False, weights=None, **kw):
        return _VGG16()

    def squeezenet1_1(pretrained=False, weights=None, **kw):
        return _SqueezeNet11()

    # torchvision-layout ResNet-50 (the MoCo backbone moco_loss.py:21 builds)
    class _Bottleneck(nn.Module):
        def __init__(self, inp, mid, stride=1):
            super().__init__()
            out = mid * 4
            self.conv1 = nn.Conv2d(inp, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            self.conv3 = nn.Conv2d(mid, out, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, out, 1, stride, bias=False),
                    nn.BatchNorm2d(out))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idt)

    class _ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            for li, (mid, n, s) in enumerate(
                    [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], 1):
                inp = 64 if li == 1 else mid * 2
                blocks = [_Bottleneck(inp, mid, s)]
                blocks += [_Bottleneck(mid * 4, mid) for _ in range(n - 1)]
                setattr(self, f"layer{li}", nn.Sequential(*blocks))
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(2048, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet50(pretrained=False, weights=None, **kw):
        return _ResNet50()

    tv_models.alexnet = alexnet
    tv_models.vgg16 = vgg16
    tv_models.squeezenet1_1 = squeezenet1_1
    tv_models.resnet50 = resnet50
    tv_models.__dict__["resnet50"] = resnet50
    tv.models = tv_models
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.transforms"] = tv_transforms


def _randomize_state_dict(module: torch.nn.Module, seed: int,
                          scale: float = 0.2):
    """Fill every tensor in the state_dict with a seeded random value so
    BN running stats / affine params are all nontrivial."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            new[k] = v  # num_batches_tracked etc.
        elif k.endswith("running_var"):
            new[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            new[k] = torch.randn(v.shape, generator=g) * scale
    module.load_state_dict(new)
    return {k: v.numpy() for k, v in new.items()}


# --------------------------------------------------------------- (a) kernels


@pytest.mark.parametrize("up,down", [(1, 1), (2, 1), (1, 2), (2, 2)])
@pytest.mark.parametrize("padding", [0, 1, (1, 0, 2, 1), (-1, 1, 0, -1)])
@pytest.mark.parametrize("flip", [False, True])
def test_upfirdn2d_vs_torch_ref(up, down, padding, flip):
    from torch_utils.ops.upfirdn2d import _upfirdn2d_ref

    from stylemc_tpu.ops.upfirdn2d import upfirdn2d, _parse_padding

    rng = np.random.RandomState(up * 8 + down * 4 + flip)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    f = rng.randn(3, 3).astype(np.float32)
    gain = 1.5

    px0, px1, py0, py1 = _parse_padding(padding)
    want = _upfirdn2d_ref(torch.from_numpy(x), torch.from_numpy(f),
                          up=up, down=down, padding=[px0, px1, py0, py1],
                          flip_filter=flip, gain=gain).numpy()
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up,
                               down=down, padding=padding, flip_filter=flip,
                               gain=gain))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_separable_and_1d_vs_torch_ref():
    from torch_utils.ops.upfirdn2d import _upfirdn2d_ref, setup_filter

    from stylemc_tpu.ops.upfirdn2d import upfirdn2d, setup_filter as our_setup

    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 9, 9).astype(np.float32)
    f_t = setup_filter([1, 3, 3, 1])  # reference normalized 1D filter
    f_j = our_setup([1, 3, 3, 1])
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(), rtol=1e-6,
                               atol=1e-7)
    # setup_filter outer-products short 1D filters (numel < 8 → dense 2D)
    assert f_t.ndim == 2
    want = _upfirdn2d_ref(torch.from_numpy(x), f_t, up=2,
                          padding=[2, 1, 2, 1], gain=4).numpy()
    got = np.asarray(upfirdn2d(jnp.asarray(x), f_j, up=2,
                               padding=(2, 1, 2, 1), gain=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_gradient_vs_torch():
    from torch_utils.ops.upfirdn2d import _upfirdn2d_ref

    from stylemc_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 6, 6).astype(np.float32)
    f = rng.randn(4, 4).astype(np.float32)
    ct = rng.randn(1, 2, 11, 11).astype(np.float32)  # cotangent

    xt = torch.from_numpy(x).requires_grad_(True)
    y = _upfirdn2d_ref(xt, torch.from_numpy(f), up=2, down=1,
                       padding=[1, 1, 1, 1])
    assert tuple(y.shape[2:]) == (11, 11)
    y.backward(torch.from_numpy(ct))
    want = xt.grad.numpy()

    def fwd(xx):
        return jnp.vdot(upfirdn2d(xx, jnp.asarray(f), up=2,
                                  padding=(1, 1, 1, 1)), jnp.asarray(ct))

    got = np.asarray(jax.grad(fwd)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid",
                                 "elu", "selu", "softplus", "swish"])
@pytest.mark.parametrize("clamp", [None, 0.5])
def test_bias_act_vs_torch_ref(act, clamp):
    from torch_utils.ops.bias_act import _bias_act_ref

    from stylemc_tpu.ops.bias_act import bias_act

    rng = np.random.RandomState(hash(act) % 1000)
    x = rng.randn(3, 5, 4).astype(np.float32)
    b = rng.randn(5).astype(np.float32)

    want = _bias_act_ref(x=torch.from_numpy(x), b=torch.from_numpy(b), dim=1,
                         act=act, alpha=None, gain=None, clamp=clamp).numpy()
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act=act,
                              clamp=clamp))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bias_act_custom_alpha_gain_vs_torch_ref():
    from torch_utils.ops.bias_act import _bias_act_ref

    from stylemc_tpu.ops.bias_act import bias_act

    rng = np.random.RandomState(7)
    x = rng.randn(2, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    want = _bias_act_ref(x=torch.from_numpy(x), b=torch.from_numpy(b), dim=1,
                         act="lrelu", alpha=0.1, gain=3.0, clamp=2.0).numpy()
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), dim=1,
                              act="lrelu", alpha=0.1, gain=3.0, clamp=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------- (b) arcface


@pytest.mark.slow
def test_arcface_vs_torch_backbone():
    from id_loss.model_irse import Backbone

    from stylemc_tpu.models.arcface import (backbone_apply,
                                            params_from_torch_state)

    # exactly the IDLoss construction (id_loss/id_loss.py:10)
    net = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    state = _randomize_state_dict(net, seed=0, scale=0.05)
    net.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 112, 112).astype(np.float32) * 0.5
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()

    params = params_from_torch_state(state)
    got = np.asarray(backbone_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


# ----------------------------------------------------------------- (c) mtcnn


REF_MTCNN_WEIGHTS = os.path.join(REF, "MTCNN", "weights")


@pytest.mark.skipif(not os.path.isdir(REF_MTCNN_WEIGHTS),
                    reason="MTCNN weights unavailable")
@pytest.mark.slow
def test_mtcnn_nets_vs_torch_real_weights():
    """P/R/O-Net outputs with the REAL bundled weights must match the
    reference torch modules (get_nets.py loads 'MTCNN/weights/*.npy'
    relative to cwd, so construct them with cwd=/root/reference)."""
    from stylemc_tpu.models.mtcnn.nets import (load_net_weights, pnet_apply,
                                               rnet_apply, onet_apply)

    cwd = os.getcwd()
    os.chdir(REF)
    try:
        from MTCNN.get_nets import PNet, RNet, ONet
        tp, tr, to = PNet().eval(), RNet().eval(), ONet().eval()
    finally:
        os.chdir(cwd)

    p_pnet = load_net_weights(os.path.join(REF_MTCNN_WEIGHTS, "pnet.npy"))
    p_rnet = load_net_weights(os.path.join(REF_MTCNN_WEIGHTS, "rnet.npy"))
    p_onet = load_net_weights(os.path.join(REF_MTCNN_WEIGHTS, "onet.npy"))
    rng = np.random.RandomState(0)

    xp = rng.randn(1, 3, 30, 40).astype(np.float32)
    with torch.no_grad():
        off_t, prob_t = tp(torch.from_numpy(xp))
    off_j, prob_j = pnet_apply(p_pnet, jnp.asarray(xp))
    np.testing.assert_allclose(np.asarray(off_j), off_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_j), prob_t.numpy(), rtol=1e-4,
                               atol=1e-5)

    xr = rng.randn(3, 3, 24, 24).astype(np.float32)
    with torch.no_grad():
        off_t, prob_t = tr(torch.from_numpy(xr))
    off_j, prob_j = rnet_apply(p_rnet, jnp.asarray(xr))
    np.testing.assert_allclose(np.asarray(off_j), off_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_j), prob_t.numpy(), rtol=1e-4,
                               atol=1e-5)

    xo = rng.randn(3, 3, 48, 48).astype(np.float32)
    with torch.no_grad():
        lm_t, off_t, prob_t = to(torch.from_numpy(xo))
    lm_j, off_j, prob_j = onet_apply(p_onet, jnp.asarray(xo))
    np.testing.assert_allclose(np.asarray(lm_j), lm_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(off_j), off_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_j), prob_t.numpy(), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_MTCNN_WEIGHTS),
                    reason="MTCNN weights unavailable")
def test_mtcnn_box_utils_vs_torch():
    """The box-geometry contract: nms / convert_to_square / calibrate_box
    on the same random boxes."""
    from MTCNN.box_utils import (nms as ref_nms,
                                 convert_to_square as ref_square,
                                 calibrate_box as ref_calibrate)

    from stylemc_tpu.models.mtcnn.detect import (nms, convert_to_square,
                                                 calibrate_box)

    rng = np.random.RandomState(0)
    xy = rng.rand(20, 2) * 80
    wh = rng.rand(20, 2) * 40 + 4
    scores = rng.rand(20, 1)
    boxes = np.concatenate([xy, xy + wh, scores], axis=1)

    assert list(nms(boxes, 0.5)) == list(ref_nms(boxes, 0.5))
    assert list(nms(boxes, 0.5, mode="min")) == \
        list(ref_nms(boxes, 0.5, mode="min"))
    # coords only: the reference zeroes the score column (box_utils.py:71
    # builds on np.zeros_like), ours preserves it; the cascade overwrites
    # it from net probs before any use either way.
    np.testing.assert_allclose(convert_to_square(boxes)[:, :4],
                               ref_square(boxes)[:, :4])
    offsets = rng.randn(20, 4) * 0.1
    np.testing.assert_allclose(calibrate_box(boxes, offsets),
                               ref_calibrate(boxes, offsets))


# ---------------------------------------------------------------- (d) mapper


def test_mapper_vs_torch():
    _seed_rosinality_op_stub()
    _seed_torchvision_stub()
    from latent_mappers import Mapper

    from stylemc_tpu.models.mapper import (mapper_apply,
                                           params_from_torch_state)

    net = Mapper()
    state = _randomize_state_dict(net, seed=3)
    net.eval()

    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 512).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(mapper_apply(params_from_torch_state(state),
                                  jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------- (e) mobilenet


@pytest.mark.slow
def test_mobilenet_gdconv_vs_torch():
    _seed_torchvision_stub()
    from mobilenet_facial import MobileNet_GDConv

    from stylemc_tpu.models.mobilenet import (mobilenet_gdconv_apply,
                                              params_from_torch_state)

    net = MobileNet_GDConv(136)
    state = _randomize_state_dict(net, seed=5, scale=0.05)
    net.eval()

    rng = np.random.RandomState(6)
    x = rng.randn(1, 3, 224, 224).astype(np.float32) * 0.5
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    # checkpoint files carry a DataParallel 'module.' prefix; exercise it
    state = {"module." + k: v for k, v in state.items()}
    got = np.asarray(mobilenet_gdconv_apply(params_from_torch_state(state),
                                            jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------- (f) deeplab


@pytest.mark.slow
def test_deeplab_vs_torch():
    import deeplab as ref_deeplab

    from stylemc_tpu.models.deeplab import (deeplab_apply,
                                            params_from_torch_state)

    # exactly the run_deeplab.get_model construction (run_deeplab.py:69-75)
    net = ref_deeplab.resnet101(pretrained=False, num_classes=19,
                                num_groups=32, weight_std=True, beta=False)
    state = _randomize_state_dict(net, seed=7, scale=0.05)
    net.eval()

    rng = np.random.RandomState(8)
    x = rng.randn(1, 3, 65, 65).astype(np.float32) * 0.5
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(deeplab_apply(params_from_torch_state(state),
                                   jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ------------------------------------------- (g) rosinality generator / disc


@pytest.mark.slow
def test_rosinality_generator_vs_torch():
    """Full-generator oracle: our ADA-layout JAX generator vs the in-tree
    rosinality torch Generator (encoder4editing/models/stylegan2/model.py
    :362-543), sharing weights via the rosinality export namespace. This
    validates modulated conv + demodulation, noise injection, blur
    up-sampling, the skip-ToRGB chain, and the style MLP end to end."""
    _seed_rosinality_op_stub()
    _seed_torchvision_stub()
    from encoder4editing.models.stylegan2.model import Generator

    from fabricate import ada_to_rosinality_state
    from stylemc_tpu.io.rosinality import config_for_rosinality
    from stylemc_tpu.models.stylegan2.generator import (
        init_generator_params, mapping, synthesis, w_to_s)

    size = 32
    cfg = config_for_rosinality(size)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in ada_to_rosinality_state(cfg, params).items()}

    net = Generator(size, 512, n_mlp=cfg.mapping_layers)
    missing, unexpected = net.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    # blur/upsample FIR kernels are derived constants the module already
    # builds in __init__ (make_kernel([1,3,3,1])) — not learned state
    assert all(k.endswith("kernel") for k in missing), missing
    net.eval()

    rng = np.random.RandomState(1)
    z = rng.randn(2, 512).astype(np.float32)

    with torch.no_grad():
        want, _ = net([torch.from_numpy(z)], input_is_latent=False,
                      randomize_noise=False)
    ws = mapping(params, cfg, jnp.asarray(z))
    got = synthesis(params, cfg, w_to_s(params, cfg, ws), noise_mode="const")
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=2e-4)

    # w-path (input_is_latent=True): skip the style MLP on both sides
    w = rng.randn(1, 512).astype(np.float32)
    with torch.no_grad():
        want_w, _ = net([torch.from_numpy(w)], input_is_latent=True,
                        randomize_noise=False)
    n_ws = ws.shape[1]
    w_b = jnp.repeat(jnp.asarray(w)[:, None], n_ws, axis=1)
    got_w = synthesis(params, cfg, w_to_s(params, cfg, w_b),
                      noise_mode="const")
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_rosinality_discriminator_vs_torch():
    _seed_rosinality_op_stub()
    _seed_torchvision_stub()
    from encoder4editing.models.stylegan2.model import Discriminator

    from stylemc_tpu.models.stylegan2.discriminator import (
        discriminator_apply, d_params_from_rosinality)

    size = 32
    net = Discriminator(size)
    state = _randomize_state_dict(net, seed=9, scale=0.1)
    net.eval()

    rng = np.random.RandomState(10)
    x = rng.randn(4, 3, size, size).astype(np.float32)  # stddev_group=4
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(discriminator_apply(
        d_params_from_rosinality(state, size), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------------ (i) LPIPS


@pytest.mark.slow
@pytest.mark.parametrize("net_type", ["alex", "vgg", "squeeze"])
def test_lpips_vs_torch(net_type):
    """criteria/lpips (encoder4editing/criteria/lpips/{lpips,networks}.py):
    z-score -> backbone taps -> unit-normalize -> squared diff -> 1x1 lin ->
    spatial mean -> sum / N. Shared random backbone+lin weights; the
    torchvision pretrained download is bypassed (weights=None)."""
    _seed_torchvision_stub()
    import torchvision.models as tvm

    e4e_root = os.path.join(REF, "encoder4editing")
    if e4e_root not in sys.path:
        sys.path.append(e4e_root)

    # bypass the pretrained-weight download inside networks.{AlexNet,VGG16,
    # SqueezeNet}
    torch.manual_seed(0)
    orig_alex, orig_vgg = tvm.alexnet, tvm.vgg16
    orig_squeeze = tvm.squeezenet1_1
    tvm.alexnet = lambda *a, **k: orig_alex(weights=None)
    tvm.vgg16 = lambda *a, **k: orig_vgg(weights=None)
    tvm.squeezenet1_1 = lambda *a, **k: orig_squeeze(weights=None)
    try:
        from criteria.lpips.networks import get_network, LinLayers
        net = get_network(net_type).eval()
    finally:
        tvm.alexnet, tvm.vgg16 = orig_alex, orig_vgg
        tvm.squeezenet1_1 = orig_squeeze
    lins = LinLayers(net.n_channels_list)
    with torch.no_grad():
        for lin in lins:
            lin[1].weight.uniform_(0.0, 1.0)

    # 65px for squeeze so a pool output is fractional and the ceil_mode=True
    # branch (networks.py:70 squeezenet1_1 MaxPool) is actually exercised.
    res = 65 if net_type == "squeeze" else 64
    x = torch.randn(2, 3, res, res) * 0.4
    y = torch.randn(2, 3, res, res) * 0.4
    with torch.no_grad():
        fx, fy = net(x), net(y)
        diff = [(a - b) ** 2 for a, b in zip(fx, fy)]
        res = [l(d).mean((2, 3), True) for d, l in zip(diff, lins)]
        ref = (torch.sum(torch.cat(res, 0)) / x.shape[0]).item()

    from stylemc_tpu.losses.lpips import lpips_loss, lpips_params_from_torch

    backbone_state = {f"features.{k}": v.numpy() for k, v in
                      net.layers.state_dict().items()}
    lin_state = {k: v.numpy() for k, v in lins.state_dict().items()}
    params = lpips_params_from_torch(backbone_state, lin_state, net_type)
    ours = float(lpips_loss(params, jnp.asarray(x.numpy()),
                            jnp.asarray(y.numpy()), net_type))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


# ------------------------------------------------------------------- (j) MoCo


@pytest.mark.slow
def test_moco_backbone_and_loss_vs_torch():
    """criteria/moco_loss.py:21-66 — the torchvision resnet50 MoCo backbone
    (fc removed), L2-normalized features, loss = mean(1 - <f(ŷ), f(y)>),
    sim_improvement = mean(<f(ŷ),f(y)> - <f(y),f(x)>). Shared random
    weights; 224px inputs so the (documented bicubic-vs-nearest) resize
    deviation is not in play."""
    _seed_torchvision_stub()
    import torchvision.models as models

    torch.manual_seed(0)
    net = models.__dict__["resnet50"]()
    net.eval()
    backbone = torch.nn.Sequential(*list(net.children())[:-1])

    def t_feats(x):
        f = backbone(x).squeeze(-1).squeeze(-1)
        return torch.nn.functional.normalize(f, dim=1)

    x = torch.randn(2, 3, 224, 224) * 0.4
    y = torch.randn(2, 3, 224, 224) * 0.4
    y_hat = y + torch.randn_like(y) * 0.05
    with torch.no_grad():
        f_x, f_y, f_hat = t_feats(x), t_feats(y), t_feats(y_hat)
        diff_target = (f_hat * f_y).sum(1)
        diff_views = (f_y * f_x).sum(1)
        ref_loss = float((1 - diff_target).mean())
        ref_sim = float((diff_target - diff_views).mean())

    from stylemc_tpu.losses.moco import moco_loss
    from stylemc_tpu.models.resnet import resnet50_from_torch_state

    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params = resnet50_from_torch_state(state)
    loss, sim = moco_loss(params, jnp.asarray(y_hat.numpy()),
                          jnp.asarray(y.numpy()), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(sim), ref_sim, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------- (k) e4e encoders


def _seed_plain_rosinality_op_stub():
    """Same CUDA-op stub as _seed_rosinality_op_stub, registered under the
    plain 'models.stylegan2.op' name the e4e-internal imports use when
    /root/reference/encoder4editing itself is on sys.path."""
    name = "models.stylegan2.op"
    if name in sys.modules:
        return
    _seed_rosinality_op_stub()
    sys.modules[name] = sys.modules["encoder4editing.models.stylegan2.op"]


@pytest.mark.slow
@pytest.mark.parametrize("which", ["gradual", "e4e_inference", "e4e_stage3"])
def test_e4e_encoders_vs_torch(which):
    """models/encoders/psp_encoders.py:58-201 — GradualStyleEncoder (FPN
    taps at body 6/20/23, 3 coarse + 4 middle + N fine heads) and
    Encoder4Editing (w0 broadcast + progressive deltas) with shared random
    weights through encoder_params_from_torch_state."""
    e4e_root = os.path.join(REF, "encoder4editing")
    if e4e_root not in sys.path:
        sys.path.append(e4e_root)
    _seed_plain_rosinality_op_stub()
    from models.encoders.psp_encoders import (GradualStyleEncoder,
                                              Encoder4Editing,
                                              ProgressiveStage)

    class Opts:
        stylegan_size = 256

    torch.manual_seed(0)
    if which == "gradual":
        net = GradualStyleEncoder(50, "ir_se", Opts()).eval()
    else:
        net = Encoder4Editing(50, "ir_se", Opts()).eval()
        if which == "e4e_stage3":
            net.progressive_stage = ProgressiveStage(3)

    x = torch.randn(2, 3, 256, 256) * 0.5
    with torch.no_grad():
        ref = net(x).numpy()

    from stylemc_tpu.models.e4e.encoders import (
        encoder_params_from_torch_state, gradual_style_encoder,
        encoder4editing)

    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params = encoder_params_from_torch_state(state, stylegan_size=256)
    xj = jnp.asarray(x.numpy())
    if which == "gradual":
        ours = gradual_style_encoder(params, xj, stylegan_size=256)
    elif which == "e4e_inference":
        ours = encoder4editing(params, xj, stylegan_size=256)
    else:
        ours = encoder4editing(params, xj, stylegan_size=256,
                               progressive_stage=3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=5e-5)


# --------------------------------------------------------------- (l) Ranger


@pytest.mark.slow
def test_ranger_trajectory_vs_torch():
    """training/ranger.py:29-163 (RAdam + Lookahead + gradient
    centralization): identical 25-step trajectories on a shared
    deterministic quadratic, torch Ranger vs our optax ranger. Covers the
    N_sma threshold switch (variance-rectified vs unrectified steps), the
    k=6 lookahead pulls, and GC on the matrix parameter."""
    e4e_root = os.path.join(REF, "encoder4editing")
    if e4e_root not in sys.path:
        sys.path.append(e4e_root)
    from training.ranger import Ranger

    import optax
    from stylemc_tpu.train.ranger import ranger as our_ranger

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    b0 = np.random.RandomState(1).randn(3).astype(np.float32)
    tgt_w = np.ones((4, 3), np.float32)
    tgt_b = -np.ones((3,), np.float32)

    # torch side
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = Ranger([tw, tb], lr=0.05)
    for _ in range(25):
        opt.zero_grad()
        loss = ((tw - torch.from_numpy(tgt_w)) ** 2).sum() + \
               ((tb - torch.from_numpy(tgt_b)) ** 2).sum()
        loss.backward()
        opt.step()

    # jax side
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt_j = our_ranger(0.05)
    state = opt_j.init(params)

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"] - tgt_w)) + \
            jnp.sum(jnp.square(p["b"] - tgt_b))

    for _ in range(25):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt_j.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    # 25 compounding fp32 steps accumulate ~1e-4 of reassociation noise
    # (torch CPU vs XLA orderings); a math mismatch (wrong N_sma branch,
    # missing GC, wrong lookahead cadence) diverges by orders of magnitude
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=0, atol=3e-4)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               tb.detach().numpy(), rtol=0, atol=3e-4)
