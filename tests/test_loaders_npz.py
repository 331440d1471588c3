"""The preprocessed-.npz ingestion path (data/loaders.py save_npz/load_npz +
loaddataset root discovery) — the offline stand-in for the real PyG/OGB
download path (reference ogbdataset.py:29-71), exercised end to end:
round-trip fidelity, loaddataset dispatch, and a training step on the loaded
dataset."""
import numpy as np
import pytest

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import loaddataset, load_npz, save_npz, synthetic_dataset
from ocn_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def ds0():
    return synthetic_dataset("Cora", seed=0, scale=0.2)


def test_npz_round_trip(tmp_path, ds0):
    p = str(tmp_path / "Cora.npz")
    save_npz(p, ds0)
    ds1 = load_npz(p, "Cora")
    np.testing.assert_array_equal(
        np.asarray(ds0.edge_index), np.asarray(ds1.edge_index))
    np.testing.assert_allclose(
        np.asarray(ds0.x), np.asarray(ds1.x), rtol=1e-6)
    assert ds0.n_nodes == ds1.n_nodes and ds0.max_x == ds1.max_x
    for split in ("train", "valid", "test"):
        for k, v in ds0.split_edge[split].items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(ds1.split_edge[split][k]))


def test_loaddataset_prefers_npz(tmp_path, ds0):
    """loaddataset({root}/{name}.npz) dispatches to the npz file — the
    production ingestion path once scripts/convert_datasets.py has run.
    Uses an OGB-style name: those load verbatim (official split), while
    Planetoid names get a fresh random split per call (reference
    ogbdataset.py:11-27 semantics — checked separately below)."""
    p = str(tmp_path / "collab.npz")
    save_npz(p, ds0)
    ds1 = loaddataset("collab", root=str(tmp_path), seed=0)
    np.testing.assert_array_equal(
        np.asarray(ds0.edge_index), np.asarray(ds1.edge_index))
    for k, v in ds0.split_edge["test"].items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(ds1.split_edge["test"][k]))


def test_loaddataset_planetoid_resplits_npz(tmp_path, ds0):
    """Planetoid npz loads re-split per call (fresh 70/10/20, reference
    reloads per run) and rebuild the train-only symmetric adjacency."""
    p = str(tmp_path / "Cora.npz")
    save_npz(p, ds0)
    a = loaddataset("Cora", root=str(tmp_path), seed=1)
    b = loaddataset("Cora", root=str(tmp_path), seed=2)
    assert a.split_edge["train"]["edge"].shape[0] == \
        b.split_edge["train"]["edge"].shape[0]
    assert not np.array_equal(np.asarray(a.split_edge["train"]["edge"]),
                              np.asarray(b.split_edge["train"]["edge"]))


def test_training_on_npz_dataset(tmp_path, ds0):
    p = str(tmp_path / "Cora.npz")
    save_npz(p, ds0)
    ds1 = loaddataset("Cora", root=str(tmp_path), seed=0)
    cfg = Config(dataset="Cora", predictor="cn5", model="puregcn",
                 mplayers=1, hiddim=32, batch_size=128, testbs=256,
                 maskinput=True, pad_deg=16, pad_deg2=16)
    tr = Trainer(cfg, ds1)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)
    res = tr.evaluate(state)
    assert all(np.isfinite(x) for v in res.values() for x in v)
