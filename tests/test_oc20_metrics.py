"""OC20-style energy/force metrics (utils/metrics.py) vs the reference's
torch formulas (examples/util.py:187-223), re-expressed here in torch so the
reduction semantics are pinned independently of the numpy implementation."""

import numpy as np
import pytest

from geossl_tpu.utils import metrics as M

torch = pytest.importorskip("torch")
F = torch.nn.functional


@pytest.fixture()
def batch():
    rng = np.random.default_rng(0)
    B, N = 7, 12
    pred_e = rng.normal(size=B)
    e = pred_e + rng.normal(scale=0.03, size=B)
    pred_f = rng.normal(size=(B, N, 3))
    f = pred_f + rng.normal(scale=0.05, size=(B, N, 3))
    # every structure has >=1 free atom, some fixed
    masks = (rng.random((B, N)) > 0.3).astype(np.float64)
    masks[:, 0] = 1.0
    return pred_e, e, pred_f, f, masks


def test_energy_mae_is_sum_reduced(batch):
    pred_e, e, *_ = batch
    want = F.l1_loss(torch.tensor(pred_e), torch.tensor(e), reduction="sum")
    assert np.isclose(M.energy_mae(pred_e, e), float(want))


def test_force_mae_matches_reference_reduction(batch):
    _, _, pred_f, f, masks = batch
    tp, tf, tm = map(torch.tensor, (pred_f, f, masks))
    n_free = torch.sum(tm, dim=-1, keepdim=True)
    loss = F.l1_loss(tp, tf, reduction="none").sum(dim=-1)
    want = (loss / n_free).masked_select(tm.bool()).sum()
    assert np.isclose(M.force_mae(pred_f, f, masks), float(want))


def test_force_cosine_matches_reference_reduction(batch):
    _, _, pred_f, f, masks = batch
    tp, tf, tm = map(torch.tensor, (pred_f, f, masks))
    cos = F.cosine_similarity(tp, tf, dim=-1)
    n_free = torch.sum(tm, dim=-1, keepdim=True)
    want = (cos / n_free).masked_select(tm.bool()).sum()
    assert np.isclose(M.force_cosine(pred_f, f, masks), float(want))


def test_ewt_fraction(batch):
    pred_e, e, *_ = batch
    want = float(torch.mean(
        (torch.abs(torch.tensor(pred_e) - torch.tensor(e)) < 0.02).float()))
    assert np.isclose(M.energy_within_threshold(pred_e, e), want)
    assert M.energy_within_threshold(e, e) == 1.0


def test_efwt_3d_forces_matches_reference(batch):
    """For [B,N,3] forces the reference chain (sum xyz -> max over atoms)
    is coherent; pin equality against it."""
    pred_e, e, pred_f, f, _ = batch
    te = torch.abs(torch.tensor(pred_e) - torch.tensor(e)) < 0.02
    loss_f = F.l1_loss(torch.tensor(pred_f), torch.tensor(f),
                       reduction="none").sum(dim=-1)
    tf_ok = torch.abs(torch.max(loss_f, dim=-1)[0]) < 0.03
    want = float(torch.mean((te & tf_ok).float()))
    got = M.energy_force_within_threshold(pred_e, e, pred_f, f)
    assert np.isclose(got, want)


def test_efwt_2d_forces_is_per_structure_not_batch_max():
    """Documented deviation: for the reference docstring's own [B,N] shape
    its literal code maxes over the BATCH (one scalar gate for everyone);
    ours gates each structure on its own summed |dF|."""
    pred_e = np.zeros(2)
    e = np.zeros(2)
    pred_f = np.array([[0.0, 0.0], [10.0, 10.0]])  # structure 1 way off
    f = np.zeros((2, 2))
    got = M.energy_force_within_threshold(pred_e, e, pred_f, f)
    assert got == 0.5  # structure 0 passes, structure 1 fails


def test_efwt_2d_forces_gates_on_max_not_sum():
    """[B,N] input is PER-ATOM summed |dF|; the structure gate is the max
    over atoms (OC20 definition), not their sum — a structure whose every
    atom is within alpha must pass regardless of atom count."""
    pred_e = np.zeros(1)
    e = np.zeros(1)
    pred_f = np.full((1, 10), 0.02)  # each atom within alpha=0.03
    f = np.zeros((1, 10))
    assert M.energy_force_within_threshold(pred_e, e, pred_f, f) == 1.0
