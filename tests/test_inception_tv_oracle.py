"""Torch-oracle for the torchvision half of metrics/inception.py.

The 'tv' variant claims to be the exact torchvision inception_v3 graph and
`params_from_torch_state` claims to consume a torchvision-layout state dict
(pytorch-fid's pt_inception weights use the same names). torchvision is not
installed in this image, so — following the suite's MobileNetV2 precedent
(test_reference_parity._seed_torchvision_stub) — the oracle is a faithful
pure-torch InceptionV3 whose state_dict layout matches torchvision's
exactly. It independently exercises the conv arithmetic, BN-eval semantics,
asymmetric 1x7/7x1 paddings, pooling placement, and the state-dict naming
end-to-end. The fid2015-specific pooling quirks are separately
torch-oracle-tested against torch.nn.functional in test_metrics.py.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from stylemc_tpu.metrics.inception import (
    inception_features, params_from_torch_state, _resize_matrix_bilinear,
)


class _Basic(nn.Module):
    """torchvision BasicConv2d: conv(no bias) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class _MixedA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _Basic(cin, 64, kernel_size=1)
        self.branch5x5_1 = _Basic(cin, 48, kernel_size=1)
        self.branch5x5_2 = _Basic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _Basic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _Basic(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class _MixedB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _Basic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _Basic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class _MixedC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _Basic(cin, 192, kernel_size=1)
        self.branch7x7_1 = _Basic(cin, c7, kernel_size=1)
        self.branch7x7_2 = _Basic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _Basic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _Basic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _Basic(c7, c7, kernel_size=(7, 1),
                                     padding=(3, 0))
        self.branch7x7dbl_3 = _Basic(c7, c7, kernel_size=(1, 7),
                                     padding=(0, 3))
        self.branch7x7dbl_4 = _Basic(c7, c7, kernel_size=(7, 1),
                                     padding=(3, 0))
        self.branch7x7dbl_5 = _Basic(c7, 192, kernel_size=(1, 7),
                                     padding=(0, 3))
        self.branch_pool = _Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _MixedD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _Basic(cin, 192, kernel_size=1)
        self.branch3x3_2 = _Basic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _Basic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _Basic(192, 192, kernel_size=(1, 7),
                                    padding=(0, 3))
        self.branch7x7x3_3 = _Basic(192, 192, kernel_size=(7, 1),
                                    padding=(3, 0))
        self.branch7x7x3_4 = _Basic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class _MixedE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = _Basic(cin, 320, kernel_size=1)
        self.branch3x3_1 = _Basic(cin, 384, kernel_size=1)
        self.branch3x3_2a = _Basic(384, 384, kernel_size=(1, 3),
                                   padding=(0, 1))
        self.branch3x3_2b = _Basic(384, 384, kernel_size=(3, 1),
                                   padding=(1, 0))
        self.branch3x3dbl_1 = _Basic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _Basic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _Basic(384, 384, kernel_size=(1, 3),
                                      padding=(0, 1))
        self.branch3x3dbl_3b = _Basic(384, 384, kernel_size=(3, 1),
                                      padding=(1, 0))
        self.branch_pool = _Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class _InceptionV3(nn.Module):
    """torchvision-layout InceptionV3 (no aux head; eval-only oracle)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.Conv2d_1a_3x3 = _Basic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _Basic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _Basic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _Basic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _Basic(80, 192, kernel_size=3)
        self.Mixed_5b = _MixedA(192, 32)
        self.Mixed_5c = _MixedA(256, 64)
        self.Mixed_5d = _MixedA(288, 64)
        self.Mixed_6a = _MixedB(288)
        self.Mixed_6b = _MixedC(768, 128)
        self.Mixed_6c = _MixedC(768, 160)
        self.Mixed_6d = _MixedC(768, 160)
        self.Mixed_6e = _MixedC(768, 192)
        self.Mixed_7a = _MixedD(768)
        self.Mixed_7b = _MixedE(1280)
        self.Mixed_7c = _MixedE(2048)
        self.fc = nn.Linear(2048, num_classes)

    def pool_features(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return torch.mean(x, dim=(2, 3))


def _randomized(seed=0):
    torch.manual_seed(seed)
    m = _InceptionV3()
    state = m.state_dict()
    for k, v in state.items():
        if v.dtype.is_floating_point and "running_var" not in k:
            state[k] = torch.randn_like(v) * 0.05
        if "running_var" in k:
            state[k] = torch.rand_like(v) * 0.5 + 0.75
    m.load_state_dict(state)
    m.eval()
    return m


@pytest.mark.slow
def test_tv_variant_matches_torch_inception_v3():
    m = _randomized(seed=0)
    state = {k: v.numpy() for k, v in m.state_dict().items()
             if "num_batches_tracked" not in k}
    params = params_from_torch_state(state)

    imgs = np.random.RandomState(1).randint(0, 255, (2, 299, 299, 3),
                                            np.uint8)
    with torch.no_grad():
        xt = torch.from_numpy(
            imgs.astype(np.float32).transpose(0, 3, 1, 2)) / 127.5 - 1.0
        feats_t = m.pool_features(xt)
        probs_t = torch.softmax(m.fc(feats_t), dim=-1)

    feats_j = np.asarray(inception_features(params, jnp.asarray(imgs),
                                            variant="tv"))
    probs_j = np.asarray(inception_features(params, jnp.asarray(imgs),
                                            return_logits=True,
                                            variant="tv"))
    np.testing.assert_allclose(feats_j, feats_t.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(probs_j, probs_t.numpy(), rtol=1e-3,
                               atol=1e-6)


def test_resize_matrix_matches_torch_bilinear():
    """The separable resize onto 299px must match torch's bilinear
    interpolation (align_corners=False) — the convention torchvision-FID
    pipelines use before the detector."""
    x = np.random.RandomState(2).rand(1, 3, 64, 48).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(299, 299), mode="bilinear",
        align_corners=False).numpy()
    ky = _resize_matrix_bilinear(64, 299)
    kx = _resize_matrix_bilinear(48, 299)
    got = np.einsum("oh,nchw->ncow", ky, x)
    got = np.einsum("ow,nchw->ncho", kx, got)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fid2015_weight_file_roundtrip(tmp_path):
    """The exact import path the docs promise for reference-comparable
    FIDs (cli/calc_metrics.py docstring; reference detector URL at
    metric_utils.py:22): a pytorch-fid pt_inception-2015-12-05 layout
    checkpoint — torchvision inception_v3 names, 1008-way fc, no aux
    head — saved as a real .pth file, loaded via io.load_state_dict_numpy
    → params_from_torch_state, and run with variant="fid2015".

    Fabricated weights (no egress in this image): the user-supplied file
    is pt_inception-2015-12-05-6726825d.pth from
    github.com/mseitzer/pytorch-fid; it carries the identical key set and
    shapes fabricated here, so this test proves the full file→features
    plumbing that file will traverse.
    """
    from stylemc_tpu.io import load_state_dict_numpy

    m = _randomized(seed=3)
    # pytorch-fid layout: 1008-way logits head (Inception-2015 classes)
    m.fc = nn.Linear(2048, 1008)
    torch.manual_seed(4)
    with torch.no_grad():
        m.fc.weight.mul_(0.05)
        m.fc.bias.zero_()
    path = tmp_path / "pt_inception-2015-12-05-fabricated.pth"
    torch.save(m.state_dict(), str(path))

    state = load_state_dict_numpy(str(path))
    params = params_from_torch_state(state)
    assert params["fc"]["weight"].shape == (1008, 2048)

    imgs = np.random.RandomState(5).randint(0, 255, (2, 299, 299, 3),
                                            np.uint8)
    feats = np.asarray(inception_features(params, jnp.asarray(imgs),
                                          variant="fid2015"))
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
    probs = np.asarray(inception_features(params, jnp.asarray(imgs),
                                          return_logits=True,
                                          variant="fid2015"))
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
