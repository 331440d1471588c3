"""Dataset layer — reference ogbdataset.py reimagined for the TPU build.

`loaddataset(name, use_valedges_as_input)` mirrors reference
ogbdataset.py:29-71: Planetoid names get a fresh random 70/10/20 split per
call (`randomsplit`, ogbdataset.py:11-27 — the driver reloads per run so each
run reshuffles, NeighborOverlap_large.py:284-286); ogbl-* names use their
official split when available.  Feature policies are preserved: ppa features
collapse to argmax integers with `max_x` (embedding path), ddi uses node-id
features (ogbdataset.py:47-52); `load` substitutes pretrained embeddings.

Data sources, in priority order:
1. a preprocessed `.npz` at `{root}/{name}.npz` (see `save_npz`) — the
   offline-friendly format (keys: edge_index, x, and for OGB the official
   split arrays);
2. torch_geometric / ogb downloads when the environment has them + network;
3. a deterministic synthetic stand-in graph with matched scale knobs
   (useful for tests/benches and the only option in air-gapped runs; a
   loud warning is printed).

Everything here is host-side NumPy; `as_graph()` lifts to device.
"""
from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Dict, Optional

import numpy as np

from ocn_tpu.sparse import build as B
from ocn_tpu.sparse.csr import Graph, graph_from_numpy

SPLIT_KEYS = (
    ("train", "edge"), ("train", "source_node"), ("train", "target_node"),
    ("valid", "edge"), ("valid", "edge_neg"),
    ("valid", "source_node"), ("valid", "target_node"), ("valid", "target_node_neg"),
    ("test", "edge"), ("test", "edge_neg"),
    ("test", "source_node"), ("test", "target_node"), ("test", "target_node_neg"),
)


@dataclasses.dataclass
class LinkDataset:
    name: str
    x: np.ndarray               # (N, F) float or (N,) int ids when max_x >= 0
    max_x: int                  # >= 0 => integer-feature embedding path
    edge_index: np.ndarray      # (2, E) train-message edges, undirected both dirs
    split_edge: Dict[str, Dict[str, np.ndarray]]
    n_nodes: int
    full_edge_index: Optional[np.ndarray] = None  # train+valid when use_valedges

    def as_graph(self) -> Graph:
        indptr, col = B.csr_from_edge_index(self.edge_index, self.n_nodes)
        return graph_from_numpy(indptr, col, self.n_nodes)

    def full_graph(self) -> Graph:
        ei = self.full_edge_index if self.full_edge_index is not None else self.edge_index
        indptr, col = B.csr_from_edge_index(ei, self.n_nodes)
        return graph_from_numpy(indptr, col, self.n_nodes)

    @property
    def num_features(self) -> int:
        return 0 if self.x.ndim == 1 else self.x.shape[1]

    def reorder_bfs(self) -> "LinkDataset":
        """Relabel nodes in BFS order from the highest-degree node.

        Neighbor gathers are the TPU step's measured bandwidth bound
        (BENCH_NOTES.md); BFS relabeling clusters each node's neighbors into
        nearby ids so the gathered x rows hit adjacent HBM regions.  Purely
        internal: edges, features and every split array are remapped
        consistently, so scores/metrics are unchanged in distribution.
        """
        n = self.n_nodes
        indptr, col = B.csr_from_edge_index(self.edge_index, n)
        indptr = np.asarray(indptr, np.int64)
        col = np.asarray(col, np.int64)
        deg = indptr[1:] - indptr[:-1]
        visited = np.zeros(n, bool)
        order_parts = []
        # level-synchronous vectorized BFS from highest-degree seeds (order
        # within a level is by node id — the locality property only needs the
        # level layering)
        for seed in np.argsort(-deg):
            if visited[seed]:
                continue
            frontier = np.asarray([seed], np.int64)
            visited[seed] = True
            while frontier.size:
                order_parts.append(frontier)
                starts, counts = indptr[frontier], deg[frontier]
                total = int(counts.sum())
                if total == 0:
                    break
                # vectorized multi-slice: positions of all frontier edges
                offs = np.repeat(starts + counts, counts)
                idx = np.arange(total) + offs - np.repeat(
                    np.cumsum(counts), counts)
                nbrs = np.unique(col[idx])
                nbrs = nbrs[~visited[nbrs]]
                visited[nbrs] = True
                frontier = nbrs
        order = np.concatenate(order_parts) if order_parts else np.arange(n)
        remap = np.empty(n, np.int64)
        remap[order] = np.arange(n)

        def m_edges(e):
            return remap[np.asarray(e, np.int64)]

        split = {}
        for part, d in self.split_edge.items():
            split[part] = {}
            for key, arr in d.items():
                split[part][key] = m_edges(arr) if "edge" in key or "node" in key else arr
        x = self.x[order]
        return dataclasses.replace(
            self,
            x=x,
            edge_index=m_edges(self.edge_index),
            split_edge=split,
            full_edge_index=(
                m_edges(self.full_edge_index)
                if self.full_edge_index is not None else None
            ),
        )


def randomsplit(
    edge_index: np.ndarray,
    n_nodes: int,
    rng: np.random.Generator,
    val_ratio: float = 0.10,
    test_ratio: float = 0.2,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Random 70/10/20 link split with negative samples for valid/test.

    Net effect of reference `randomsplit` (ogbdataset.py:11-27): PyG's
    train_test_split_edges carves test_ratio for both val and test pools, then
    half the val pool (val_ratio/test_ratio) is folded back into train.
    """
    und = edge_index[:, edge_index[0] < edge_index[1]]
    e = und.shape[1]
    perm = rng.permutation(e)
    und = und[:, perm]
    n_test = int(test_ratio * e)
    n_val = int(n_test * val_ratio / test_ratio)
    test = und[:, :n_test]
    val = und[:, n_test : n_test + n_val]
    train = und[:, n_test + n_val :]
    neg = B.negative_sampling(edge_index, n_nodes, 2 * n_test, rng)
    return {
        "train": {"edge": train.T.copy()},
        "valid": {"edge": val.T.copy(), "edge_neg": neg[:, :n_test].T.copy()},
        "test": {"edge": test.T.copy(), "edge_neg": neg[:, n_test:].T.copy()},
    }


# ---------------------------------------------------------------------------
# synthetic stand-ins (offline runs, tests, benches)
# ---------------------------------------------------------------------------

SYNTH_SCALES = {
    # (n_nodes, avg_degree, n_feat) — matched to the real datasets' scale
    "Cora": (2708, 4, 1433),
    "Citeseer": (3327, 3, 3703),
    "Pubmed": (19717, 4, 500),
    "collab": (235868, 8, 128),
    "ppa": (576289, 100, 58),
    "ddi": (4267, 500, 0),
    "citation2": (2927963, 10, 128),
}


def synthetic_edges(n: int, avg_deg: int, rng: np.random.Generator) -> np.ndarray:
    """Power-law-flavored random graph: endpoints drawn from a Zipf-tilted
    node distribution so degree skew resembles real citation graphs."""
    m = n * avg_deg // 2
    w = (1.0 / np.sqrt(1 + np.arange(n))).astype(np.float64)
    w /= w.sum()
    src = rng.choice(n, size=m, p=w)
    dst = rng.choice(n, size=m, p=w)
    keep = src != dst
    ei = np.stack([src[keep], dst[keep]])
    return B.symmetrize_edge_index(ei, n)


def sbm_dataset(
    n: int = 2000,
    blocks: int = 16,
    p_in: float = 0.08,
    p_out: float = 0.002,
    n_feat: int = 32,
    seed: int = 0,
) -> LinkDataset:
    """Stochastic-block-model graph with strong common-neighbor signal.

    The offline proxy for accuracy studies (BASELINE.md): unlike the
    Zipf-tilted stand-ins, SBM link prediction is genuinely learnable — CN
    counts separate in-block from out-of-block pairs — so convergence A/Bs
    (exact vs capped CN, dual-K split on/off) measure real Hits@K deltas.
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, blocks, size=n)
    same = labels[:, None] == labels[None, :]
    p = np.where(same, p_in, p_out)
    dense = rng.random((n, n)) < p
    dense = np.triu(dense, 1)
    dense = dense | dense.T
    ei = np.stack(np.nonzero(dense))
    split = randomsplit(ei, n, rng)
    train_ei = B.symmetrize_edge_index(split["train"]["edge"].T, n)
    x = rng.standard_normal((n, n_feat)).astype(np.float32)
    return LinkDataset(name="sbm", x=x, max_x=-1, edge_index=train_ei,
                       split_edge=split, n_nodes=n)


def synthetic_dataset(name: str, seed: int = 0, scale: float = 1.0) -> LinkDataset:
    n, deg, f = SYNTH_SCALES.get(name, (3000, 6, 64))
    n = max(64, int(n * scale))
    rng = np.random.default_rng(seed)
    ei = synthetic_edges(n, deg, rng)
    if name == "ddi":
        x = np.arange(n, dtype=np.int32)
        max_x = n
    elif name == "ppa":
        x = rng.integers(0, 58, size=n).astype(np.int32)
        max_x = 57
    else:
        x = rng.standard_normal((n, f)).astype(np.float32)
        max_x = -1
    split = randomsplit(ei, n, rng)
    train_ei = B.symmetrize_edge_index(split["train"]["edge"].T, n)
    if name == "citation2":
        # citation2 is evaluated by MRR against 1000 sampled negatives per
        # source (NeighborOverlapCitation2.py:248-259)
        for part in ("valid", "test"):
            e = split[part]["edge"]
            split[part]["source_node"] = e[:, 0].copy()
            split[part]["target_node"] = e[:, 1].copy()
            split[part]["target_node_neg"] = rng.integers(
                0, n, size=(e.shape[0], 100)
            ).astype(np.int64)
        split["train"]["source_node"] = split["train"]["edge"][:, 0].copy()
        split["train"]["target_node"] = split["train"]["edge"][:, 1].copy()
    return LinkDataset(
        name=name, x=x, max_x=max_x, edge_index=train_ei,
        split_edge=split, n_nodes=n,
    )


# ---------------------------------------------------------------------------
# npz round-trip + the public entry point
# ---------------------------------------------------------------------------

def save_npz(path: str, ds: LinkDataset) -> None:
    flat = {"x": ds.x, "max_x": ds.max_x, "edge_index": ds.edge_index,
            "n_nodes": ds.n_nodes}
    for part, key in SPLIT_KEYS:
        if part in ds.split_edge and key in ds.split_edge[part]:
            flat[f"split__{part}__{key}"] = ds.split_edge[part][key]
    np.savez_compressed(path, **flat)


def load_npz(path: str, name: str) -> LinkDataset:
    z = np.load(path)
    split: Dict[str, Dict[str, np.ndarray]] = {}
    for k in z.files:
        if k.startswith("split__"):
            _, part, key = k.split("__")
            split.setdefault(part, {})[key] = z[k]
    return LinkDataset(
        name=name, x=z["x"], max_x=int(z["max_x"]),
        edge_index=z["edge_index"], split_edge=split, n_nodes=int(z["n_nodes"]),
    )


def loaddataset(
    name: str,
    use_valedges_as_input: bool = False,
    load: Optional[str] = None,
    root: str = "dataset",
    seed: int = 0,
    allow_synthetic: bool = True,
    synthetic_scale: float = 1.0,
) -> LinkDataset:
    """Reference `loaddataset` (ogbdataset.py:29-71) with offline fallbacks."""
    planetoid = name in ("Cora", "Citeseer", "Pubmed")
    if name == "sbm":  # offline accuracy-study graph (always synthetic)
        return sbm_dataset(n=max(64, int(2000 * synthetic_scale)), seed=seed)
    npz = os.path.join(root, f"{name}.npz")
    rng = np.random.default_rng(seed)
    if os.path.exists(npz):
        ds = load_npz(npz, name)
        if planetoid:
            # fresh random split per call (reference reloads per run)
            und = ds.edge_index
            ds.split_edge = randomsplit(und, ds.n_nodes, rng)
            ds.edge_index = B.symmetrize_edge_index(
                ds.split_edge["train"]["edge"].T, ds.n_nodes
            )
    else:
        ds = _try_pyg_ogb(name, rng)
        if ds is None:
            if not allow_synthetic:
                raise FileNotFoundError(
                    f"dataset {name!r} not found at {npz} and downloads unavailable"
                )
            warnings.warn(
                f"dataset {name!r} unavailable offline - using a synthetic "
                f"stand-in graph at matched scale (results are NOT comparable "
                f"to published numbers)"
            )
            ds = synthetic_dataset(name, seed, synthetic_scale)

    if name == "ppa" and ds.x.ndim == 2:
        ds.x = np.argmax(ds.x, axis=-1).astype(np.int32)
        ds.max_x = int(ds.x.max())
    elif name == "ddi":
        ds.x = np.arange(ds.n_nodes, dtype=np.int32)
        ds.max_x = ds.n_nodes
    if load is not None:
        ds.x = np.load(load)
        ds.max_x = -1

    if use_valedges_as_input and "valid" in ds.split_edge:
        val_ei = ds.split_edge["valid"]["edge"].T
        full = np.concatenate([ds.edge_index, val_ei], axis=1)
        ds.full_edge_index = B.symmetrize_edge_index(full, ds.n_nodes)
    return ds


def _try_pyg_ogb(name: str, rng: np.random.Generator) -> Optional[LinkDataset]:
    """Best-effort load through torch_geometric / ogb when installed AND the
    raw files are already on disk (no network in the build image)."""
    try:
        if name in ("Cora", "Citeseer", "Pubmed"):
            from torch_geometric.datasets import Planetoid  # type: ignore

            dataset = Planetoid(root="dataset", name=name)
            data = dataset[0]
            ei = data.edge_index.numpy()
            n = data.x.shape[0]
            split = randomsplit(ei, n, rng)
            train_ei = B.symmetrize_edge_index(split["train"]["edge"].T, n)
            return LinkDataset(
                name=name, x=data.x.numpy(), max_x=-1, edge_index=train_ei,
                split_edge=split, n_nodes=n,
            )
        from ogb.linkproppred import PygLinkPropPredDataset  # type: ignore

        dataset = PygLinkPropPredDataset(name=f"ogbl-{name}", root="dataset")
        split = dataset.get_edge_split()
        data = dataset[0]
        n = data.num_nodes
        split_np = {
            p: {k: v.numpy() for k, v in d.items()} for p, d in split.items()
        }
        x = data.x.numpy() if data.x is not None else np.zeros((n,), np.int32)
        ei = B.symmetrize_edge_index(data.edge_index.numpy(), n)
        return LinkDataset(
            name=name, x=x, max_x=-1, edge_index=ei, split_edge=split_np, n_nodes=n,
        )
    except Exception:
        return None
