"""Differential forward parity for the prediction/objectness heads against
the ACTUAL reference ``models/modules.py`` (loaded with a ``pointnet2`` stub
— only ``GeneralSamplingModule`` touches the CUDA op, at call time).

These replace the fabricated torch look-alikes in ``test_convert_eda.py``
as oracles for:

* ``PointsObjClsModule``        (modules.py:19-49)
* ``PositionEmbeddingLearned``  (modules.py:52-67)
* ``ThreeLayerMLP`` / ``ClsAgnosticPredictHead`` (modules.py:89-178)

Each test trains the torch module for a couple of steps first so BatchNorm
running stats are non-trivial, converts the real state dict through
``eda_tpu.train.convert``'s helpers, and asserts eval-mode forward equality.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from eda_tpu.train.convert import _bn, _conv1x1, _pos_embed, _predict_head  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if "pointnet2" not in sys.modules:
        pkg = types.ModuleType("pointnet2")
        pkg.__spec__ = importlib.machinery.ModuleSpec("pointnet2", loader=None)
        pkg.__path__ = []
        sys.modules["pointnet2"] = pkg
        utils = types.ModuleType("pointnet2.pointnet2_utils")
        utils.__spec__ = importlib.machinery.ModuleSpec(
            "pointnet2.pointnet2_utils", loader=None
        )
        utils.gather_operation = None  # GeneralSamplingModule only, unused
        sys.modules["pointnet2.pointnet2_utils"] = utils
        pkg.pointnet2_utils = utils
    spec = importlib.util.spec_from_file_location(
        "_ref_modules", f"{REF}/models/modules.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_modules"] = mod
    spec.loader.exec_module(mod)
    return mod


def _warm_bn(module, make_input, steps=3):
    """Populate BatchNorm running stats with a few train-mode passes."""
    module.train()
    with torch.no_grad():
        for _ in range(steps):
            module(make_input())
    module.eval()


def test_points_obj_cls_parity(ref_modules):
    """KPS objectness head: eval forward matches after state-dict
    conversion (conv1/bn1/conv2/bn2/conv3 -> Dense/BN stack)."""
    from eda_tpu.models.layers import PointsObjClsModule

    torch.manual_seed(0)
    d, B, K = 32, 3, 40
    ref = ref_modules.PointsObjClsModule(d)
    _warm_bn(ref, lambda: torch.randn(B, d, K))

    x = np.random.default_rng(1).normal(size=(B, K, d)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy()[:, 0]

    sd = ref.state_dict()
    bn1_p, bn1_s = _bn(sd, "bn1")
    bn2_p, bn2_s = _bn(sd, "bn2")
    params = {
        "Dense_0": _conv1x1(sd, "conv1"),
        "BatchNorm_0": bn1_p,
        "Dense_1": _conv1x1(sd, "conv2"),
        "BatchNorm_1": bn2_p,
        "Dense_2": _conv1x1(sd, "conv3"),
    }
    stats = {"BatchNorm_0": bn1_s, "BatchNorm_1": bn2_s}
    got = PointsObjClsModule(d).apply(
        {"params": params, "batch_stats": stats}, jax.numpy.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("in_dim", [3, 6])
def test_position_embedding_parity(ref_modules, in_dim):
    """Learned position embedding (xyz or box input) matches the real
    reference module, not a fabricated look-alike."""
    from eda_tpu.models.layers import PositionEmbeddingLearned

    torch.manual_seed(in_dim)
    F, B, N = 24, 2, 17
    ref = ref_modules.PositionEmbeddingLearned(in_dim, F)
    _warm_bn(ref, lambda: torch.randn(B, N, in_dim))

    coords = np.random.default_rng(2).uniform(-2, 2, (B, N, in_dim)).astype(
        np.float32
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(coords)).numpy().transpose(0, 2, 1)

    sd = {"pe." + k: v for k, v in ref.state_dict().items()}
    params, stats = _pos_embed(sd, "pe")
    got = PositionEmbeddingLearned(F).apply(
        {"params": params, "batch_stats": stats},
        jax.numpy.asarray(coords),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_cls_agnostic_predict_head_parity(ref_modules):
    """center / pred_size / sem_cls_scores and the end_points keys match the
    real ClsAgnosticPredictHead (objectness/heading off, the BeaUTyDETR
    configuration, bdetr.py:120-138)."""
    from eda_tpu.models.layers import ClsAgnosticPredictHead

    torch.manual_seed(3)
    C, d, B, Q = 11, 32, 2, 9
    ref = ref_modules.ClsAgnosticPredictHead(
        C, 1, Q, seed_feat_dim=d, objectness=False, heading=False
    )
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(torch.randn(B, d, Q), torch.randn(B, Q, 3), {}, "w_")
    ref.eval()

    rng = np.random.default_rng(4)
    feats = rng.normal(size=(B, Q, d)).astype(np.float32)
    base_xyz = rng.uniform(-1, 1, (B, Q, 3)).astype(np.float32)
    end_points = {}
    with torch.no_grad():
        ref_center, ref_size = ref(
            torch.from_numpy(feats.transpose(0, 2, 1)),
            torch.from_numpy(base_xyz),
            end_points,
            "last_",
        )
    ref_sem = end_points["last_sem_cls_scores"].numpy()

    sd = {"ph." + k: v for k, v in ref.state_dict().items()}
    params, stats = _predict_head(sd, "ph")
    center, size, sem = ClsAgnosticPredictHead(C, d).apply(
        {"params": params, "batch_stats": stats},
        jax.numpy.asarray(feats),
        jax.numpy.asarray(base_xyz),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(center), ref_center.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(size), ref_size.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sem), ref_sem, atol=2e-5)
