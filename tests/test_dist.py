"""Multi-device tests on the virtual 8-CPU mesh: sharded train step and the
driver-facing dryrun entry."""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_sharded_train_step_matches_single(monkeypatch):
    """dp=4 x tp=2 sharded step produces a finite loss and updates params."""
    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.train.loop import Trainer

    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    cfg = Config(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=32, batch_size=128, testbs=128, maskinput=False,
        pad_deg=16, pad_deg2=16, count2_chunk=0,
        dp_devices=4, tp_devices=2, linkbatchsize=32,
    )
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    state, loss = tr.train_epoch(state, np.random.default_rng(0), 1)
    assert np.isfinite(loss)


def test_graft_dryrun():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_compiles():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_spmd_shard_map_step():
    """Explicit shard_map DP step runs and roughly tracks the single-device
    loss on the same batch."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ocn_tpu.config import Config
    from ocn_tpu.data.loaders import synthetic_dataset
    from ocn_tpu.parallel.mesh import make_mesh
    from ocn_tpu.parallel.spmd import make_spmd_train_step
    from ocn_tpu.train.loop import Trainer

    ds = synthetic_dataset("Cora", seed=0, scale=0.15)
    cfg = Config(
        dataset="Cora", predictor="cn5", model="puregcn", mplayers=1,
        hiddim=32, batch_size=128, testbs=128, maskinput=True,
        pad_deg=16, pad_deg2=16, linkbatchsize=32,
    )
    tr = Trainer(cfg, ds)
    mesh = make_mesh(dp=4, tp=1)
    step = make_spmd_train_step(tr, mesh)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    pos = ds.split_edge["train"]["edge"].T
    idx = rng.permutation(pos.shape[1])[:128]
    from ocn_tpu.sparse import build as B

    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, 128, rng)
    pe, ne = jnp.asarray(pos[:, idx]), jnp.asarray(neg)
    mp = jnp.maximum(tr.edge2pos[jnp.asarray(idx)].reshape(-1), 0)
    import jax

    state2, loss_spmd = step(state, pe, ne, mp, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss_spmd))
    # single-device reference on the same batch
    _, loss_single = tr.train_step(state, pe, ne, mp, jax.random.PRNGKey(0))
    assert abs(float(loss_spmd) - float(loss_single)) < 0.5


def test_node_sharded_spmm_matches_dense():
    """Node-sharded (shard_map + all_gather) SpMM equals the dense product."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocn_tpu.parallel.mesh import make_mesh
    from ocn_tpu.parallel.node_sharded import make_node_sharded_spmm, partition_graph
    from tests.test_frame import random_graph

    rng = np.random.default_rng(0)
    g, dense = random_graph(rng, n=64, p=0.12)
    mesh = make_mesh(dp=4, tp=1)
    part = partition_graph(g, 4)
    spmm_fn, pad_rows = make_node_sharded_spmm(mesh, part)
    x = rng.standard_normal((g.n_nodes, 16)).astype(np.float32)
    xp = np.zeros((pad_rows, 16), np.float32)
    xp[: g.n_nodes] = x
    xs = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P("dp", None)))
    out = np.asarray(spmm_fn(xs))[: g.n_nodes]
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_ring_spmm_matches_dense():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocn_tpu.parallel.mesh import make_mesh
    from ocn_tpu.parallel.node_sharded import make_ring_spmm, partition_graph
    from tests.test_frame import random_graph

    rng = np.random.default_rng(1)
    g, dense = random_graph(rng, n=60, p=0.15)
    mesh = make_mesh(dp=4, tp=1)
    part = partition_graph(g, 4)
    spmm_fn, pad_rows = make_ring_spmm(mesh, part)
    x = rng.standard_normal((g.n_nodes, 8)).astype(np.float32)
    xp = np.zeros((pad_rows, 8), np.float32)
    xp[: g.n_nodes] = x
    xs = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P("dp", None)))
    out = np.asarray(spmm_fn(xs))[: g.n_nodes]
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_boundary_spmm_matches_dense():
    """Boundary-only (halo all_to_all) SpMM equals the dense product and
    ships less than the full all-gather."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocn_tpu.parallel.mesh import make_mesh
    from ocn_tpu.parallel.node_sharded import (
        make_boundary_spmm, partition_graph_boundary,
    )
    from tests.test_frame import random_graph

    rng = np.random.default_rng(2)
    g, dense = random_graph(rng, n=72, p=0.10)
    mesh = make_mesh(dp=4, tp=1)
    part = partition_graph_boundary(g, 4)
    assert 0.0 < part.halo_fraction <= 1.0
    spmm_fn, pad_rows = make_boundary_spmm(mesh, part)
    x = rng.standard_normal((g.n_nodes, 8)).astype(np.float32)
    xp = np.zeros((pad_rows, 8), np.float32)
    xp[: g.n_nodes] = x
    xs = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P("dp", None)))
    out = np.asarray(spmm_fn(xs))[: g.n_nodes]
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)
