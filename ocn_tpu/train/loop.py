"""Training/eval engine — the TPU-native re-design of the reference drivers.

One jitted `train_step` replaces the reference's per-batch Python pipeline
(NeighborOverlap_large.py:28-94):

* target-link removal ("maskinput") is a scatter of zeros into the adjacency
  value array at precomputed nnz positions — no per-batch rebuild/coalesce
  (reference rebuilds + `to_symmetric()` per batch, :56-63);
* the encoder runs once per step; link scoring runs as a `lax.scan` over
  fixed-size link micro-batches *inside the same jit* — the static-shape
  equivalent of the ppa driver's `linkbatchsize` loop with its
  `h.detach()/h0.backward(h.grad)` gradient splice
  (NeighborOverlap_large_ppa.py:93-137), which autodiff-through-scan renders
  unnecessary;
* the predictor's EMA inner-product state threads through the scan carry in
  the same order the reference updates it (all positive micro-batches, then
  all negative ones);
* per-chunk dropout keys are folded from the step key.

Two optimizer groups (gnnlr / prelr) mirror the reference's two-param-group
Adam (NeighborOverlap_large.py:306-307) via optax.multi_transform.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ocn_tpu.config import Config
from ocn_tpu.data.loaders import LinkDataset
from ocn_tpu.nn.encoder import GCNEncoder
from ocn_tpu.nn.predictors import (
    FRAME_BASED, SELF_BUILDING, THREE_HOP, build_predictor)
from ocn_tpu.ops.frame import cn_frames
from ocn_tpu.sparse import build as B
from ocn_tpu.sparse.csr import Graph
from ocn_tpu.train import losses as L
from ocn_tpu.train import metrics as M


def _largest_divisor_leq(n: int, target: int) -> int:
    """Largest divisor of ``n`` that is <= ``target`` (the scan chunk size
    must divide batch_size exactly).  Warns when the best divisor collapses
    far below the target — e.g. a prime batch_size degrades to chunk 1,
    turning one scan step into thousands."""
    target = max(1, min(n, target))
    for c in range(target, 0, -1):
        if n % c == 0:
            if c * 2 <= target:
                import warnings

                warnings.warn(
                    f"batch_size {n} has no divisor near the requested link "
                    f"chunk {target}; falling back to chunk {c} "
                    f"({n // c} scan steps). Pick a batch_size divisible by "
                    "the chunk size (e.g. a multiple of 4096).",
                    RuntimeWarning, stacklevel=2,
                )
            return c
    return 1


@flax.struct.dataclass
class TrainState:
    params: Any
    ema: Any
    sched: Any
    opt_state: Any


class Trainer:
    """Drives one (dataset, config) pair; owns compiled step functions."""

    def __init__(self, cfg: Config, ds: LinkDataset):
        self.cfg = cfg
        self.ds = ds
        self.g = ds.as_graph()
        self.full_g = (
            ds.full_graph() if ds.full_edge_index is not None else self.g
        )
        self.dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        if ds.max_x >= 0:
            self.x = jnp.asarray(ds.x, jnp.int32)
        else:
            self.x = jnp.asarray(ds.x, self.dtype)

        self.encoder = GCNEncoder(
            hidden=cfg.hiddim, num_layers=cfg.mplayers, dropout=cfg.gnndp,
            ln=cfg.ln, res=cfg.res, max_x=ds.max_x, conv_fn=cfg.model,
            jk=cfg.jk, edrop=cfg.gnnedp, xdropout=cfg.xdp,
            taildropout=cfg.tdp, noinputlin=cfg.loadx, stack=cfg.encoder_stack,
            apply_adjdrop=(cfg.encoder_stack == "ts"),
        )
        if cfg.rec_k < 0 and cfg.predictor in SELF_BUILDING:
            # auto rec_k (round 5, VERDICT r4 item 2): the recursion's
            # candidate edges anchor at batch ENDPOINTS, whose degrees are
            # size-biased (neighbor-of sampling) — cover their 75th
            # percentile exactly, rounded up to a power of two, clamped to
            # [8, pad_deg].  Reproduces the A/B-validated 16 on
            # collab-class graphs (BASELINE.md: rec16 val-neutral) and
            # degrades to full width on dense graphs (ppa-class -> pad_deg).
            deg_np = np.bincount(
                np.asarray(ds.edge_index[0]), minlength=ds.n_nodes)
            ep = deg_np[np.asarray(ds.edge_index[1])]
            q = float(np.quantile(ep, 0.75)) if ep.size else 8.0
            r = 8
            while r < min(cfg.pad_deg, q):
                r *= 2
            cfg.rec_k = min(r, cfg.pad_deg)
        self.predictor = build_predictor(
            cfg.predictor, cfg.hiddim, ds.n_nodes, **cfg.predictor_kwargs()
        )
        self.frame_based = cfg.predictor in FRAME_BASED

        # precomputed A^2 for the "gather" two-hop mode (one host SpGEMM per
        # graph instead of the reference's per-batch cuSPARSE SpGEMM)
        self.adj2 = None
        self.full_adj2 = None
        self.adj3 = None
        if cfg.two_hop_mode == "gather" and (self.frame_based or cfg.predictor == "cn3"):
            self.adj2 = self._build_adj2(self.g)
            self.full_adj2 = (
                self._build_adj2(self.full_g)
                if ds.full_edge_index is not None else self.adj2
            )
            if cfg.predictor in THREE_HOP:
                # A^3 = A^2 @ A once per graph (native gc_spgemm_csr): cn6's
                # 3-hop counts become one row gather + membership per chunk
                self.adj3 = self._build_adj3(self.g, self.adj2)

        # maskinput support: train-edge -> nnz position map, once per dataset
        self.train_edges = np.asarray(ds.split_edge["train"]["edge"]).T  # (2, E)
        if cfg.maskinput:
            self.edge2pos = np.asarray(
                B.edge_to_nnz_positions(
                    np.asarray(self.g.indptr), np.asarray(self.g.col),
                    self.train_edges,
                )
            )
        else:
            self.edge2pos = None

        self._deg_np = np.asarray(self.g.deg)
        self._deg_np_by_graph = {id(self.g): self._deg_np}
        self._split = self._split_plan()
        # ELL window tables (sparse/ell.py): built lazily by the first
        # train_epoch and refreshed every cfg.ell_refresh epochs.  Train path
        # only — eval keeps the key-sampled / deterministic CSR window path.
        self._ell = None
        self._indptr_np = np.asarray(self.g.indptr)
        # frame-based predictors need both tables; the self-building family
        # (cn2/cn3/cn4) gathers from g internally — round 3 attaches the g
        # table (+ A^2 table for cn3) there too, so the recursion's huge
        # (B*resdeg, K) window gathers ride the row-gather layout.  Since
        # round 4, preedp > 0 keeps the table attached by default: DropAdj
        # runs as lane masks on the gathered windows (Config.lane_dropadj;
        # with lane_dropadj=False the value mutation detaches the table per
        # chunk — correct, just not accelerated).
        self._use_ell = bool(
            cfg.ell_tables
            and self.g.packed is not None
            and (
                (self.frame_based and self.adj2 is not None
                 and self.adj2.packed is not None)
                or (cfg.predictor in SELF_BUILDING
                    and (self.adj2 is None or self.adj2.packed is not None))
            )
        )
        self._build_steps()

    def _refresh_ell(self, rng: np.random.Generator) -> None:
        """Re-draw the frozen window offsets and rebuild both ELL tables on
        device (one (N, K) flat gather each — paid per refresh, amortized
        over an epoch of chunks).

        Node-sharded mode builds the tables on HOST and device_puts only the
        (ndev, rows_per, K) row-range shards — no device ever holds a full
        (N, K) table (the >HBM-graph contract; parallel/sharded_graph.py)."""
        from ocn_tpu.sparse import ell as ELL

        cfg = self.cfg
        sharded = cfg.graph_sharding == "node" and self.mesh is not None
        # the sharded path has no CSR-window fallback (the tables REPLACE the
        # per-device window shards), so g's table must cover the widest gather
        # against g: the dst frame reads pad_deg2_dst or pad_deg2 lanes
        # (ops/frame.py cn_frames)
        k1 = self._sharded_ell_k1() if sharded else cfg.pad_deg
        off1 = ELL.draw_offsets(self._deg_np, k1, rng)
        if self.adj2 is not None:
            deg2 = np.asarray(self.adj2.deg)
            off2 = ELL.draw_offsets(deg2, cfg.pad_deg2, rng)
        if sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ocn_tpu.parallel.sharded_graph import partition_ell

            ndev = self.mesh.shape["dp"]
            rows_per = -(-self.g.n_nodes // ndev)
            sh = NamedSharding(self.mesh, P("dp", None, None))
            t1 = ELL.build_ell_np(
                np.asarray(self.g.packed), self._indptr_np, off1, k1)
            t2 = ELL.build_ell_np(
                np.asarray(self.adj2.packed), np.asarray(self.adj2.indptr),
                off2, cfg.pad_deg2)
            self._ell = dict(
                tbl1_sh=jax.device_put(partition_ell(t1, ndev, rows_per), sh),
                tbl2_sh=jax.device_put(partition_ell(t2, ndev, rows_per), sh),
                off1_np=off1,
            )
            if self.adj3 is not None:
                k3 = self._k3_width()
                off3 = ELL.draw_offsets(
                    np.asarray(self.adj3.deg), k3, rng)
                t3 = ELL.build_ell_np(
                    np.asarray(self.adj3.packed),
                    np.asarray(self.adj3.indptr), off3, k3)
                self._ell["tbl3_sh"] = jax.device_put(
                    partition_ell(t3, ndev, rows_per), sh)
            return
        tbl1 = ELL.build_ell(
            self.g.packed, self.g.indptr, jnp.asarray(off1), cfg.pad_deg)
        self._ell = dict(
            tbl1=tbl1, off1=jnp.asarray(off1), off1_np=off1,
        )
        if self.adj2 is not None:
            self._ell["tbl2"] = ELL.build_ell(
                self.adj2.packed, self.adj2.indptr, jnp.asarray(off2),
                cfg.pad_deg2)
            self._ell["off2"] = jnp.asarray(off2)
        if self.adj3 is not None:
            # cn6's A^3 row gather (cn3_frame) reads _k3_width lanes per dst;
            # without a table it pays B*k descriptors per chunk vs B with one
            # (the same 52% descriptor economics as tbl1/tbl2).  (N, 16)
            # int32 is ~15 MB at collab scale — free next to adj3 itself.
            k3 = self._k3_width()
            off3 = ELL.draw_offsets(np.asarray(self.adj3.deg), k3, rng)
            self._ell["tbl3"] = ELL.build_ell(
                self.adj3.packed, self.adj3.indptr, jnp.asarray(off3), k3)
            self._ell["off3"] = jnp.asarray(off3)

    def _split_plan(self):
        """Static chunk counts (n_small_pos, n_small_neg) for the dual-K
        occupancy split, or None when the split is off / unsupported.

        The counts come from the host-side degree distribution: sorting each
        batch by source degree concentrates the low-degree majority into the
        leading chunks, so a STATIC boundary at the distribution quantile
        routes almost exactly the deg <= k_small edges to the small body
        (binomial batch-to-batch wobble is ~sqrt(b), i.e. a handful of edges
        against a 4096-edge chunk; boundary spill gets the standard deg/k
        reweighted cap)."""
        cfg = self.cfg
        if (
            cfg.k_small <= 0
            or cfg.k_small >= cfg.pad_deg
            or not (self.frame_based or cfg.predictor in SELF_BUILDING)
            or cfg.hoist_frames
            or (cfg.predictor in SELF_BUILDING
                and cfg.graph_sharding == "node"
                and cfg.dp_devices * cfg.tp_devices > 1)
        ):
            # THREE_HOP (cn6) joined the split in round 4 (VERDICT r3 item
            # 2): cn3_frame shares the src candidate frame, so the small
            # body just carries the third value plane at width k_small.
            # The SELF_BUILDING family (cn2/cn3/cn4) joined in round 5:
            # the outer forward takes a per-call width override (`k`), so
            # low-degree chunks run their whole outer frame build at
            # k_small — the recursion keeps rec_k either way.  (The
            # node-sharded step builder covers frame-based predictors
            # only, so the family stays unsplit there.)
            return None
        c = self._chunk()
        nchunk = cfg.batch_size // c
        deg = self._deg_np
        if cfg.small_frac >= 0:
            fp = cfg.small_frac
        else:
            fp = float(np.mean(deg[self.train_edges[0]] <= cfg.k_small))
        if cfg.small_frac_neg >= 0:
            fneg = cfg.small_frac_neg
        elif cfg.neg_mode == "randint_target":
            # negatives keep the positive sources
            fneg = fp
        else:
            fneg = float(np.mean(deg <= cfg.k_small))
        nsp = min(nchunk, int(fp * nchunk))
        nsn = min(nchunk, int(fneg * nchunk))
        if cfg.graph_sharding == "node" and cfg.dp_devices * cfg.tp_devices > 1:
            # gate on the same condition that creates self.mesh
            # (_build_steps): with graph_sharding="node" but a 1-device
            # config the REPLICATED path runs, and skipping the replicated
            # branch below would leave frame_group unaligned (round-3
            # advisor finding)
            # round-robin chunk->device interleave (prepare_batch): each
            # device must hold exactly nsp/ndev small + nbp/ndev big chunks,
            # so round each side DOWN to a multiple of ndev (shrinking only
            # moves low-degree edges to the big body — no extra capping).
            ndev = max(cfg.dp_devices, 1)
            nsp -= nsp % ndev
            nsn -= nsn % ndev
            if nsp + nsn == 0:
                return None
            return nsp, nsn
        grp = cfg.frame_group if cfg.frame_group > 1 else 1
        # both sides share the k_small body; only the combined count needs
        # whole groups — shrinking moves edges to the big body (safe: no
        # extra capping).  (A separate narrower NEGATIVE body existed as a
        # third scan body through round 4; it measured ~-2% e2e — the small
        # body is B-scaled-floor-bound, not K-scaled — and was deleted in
        # round 5.  BENCH_NOTES 2026-08-19 has the numbers.)
        while nsp + nsn > 0 and (nsp + nsn) % grp:
            if nsn >= nsp and nsn > 0:
                nsn -= 1
            else:
                nsp -= 1
        if nsp + nsn == 0:
            return None
        return nsp, nsn

    def _k3_width(self) -> int:
        """A^3 row-gather width for cn3_frame (and its ELL table): the 3-hop
        membership only needs a narrow candidate window (reference cn6 caps
        via its splitsize/deg flags; 16 covers the collab-class dst rows).
        `Config.k3` overrides (sensitivity study: BASELINE.md round 5)."""
        if self.cfg.k3 > 0:
            return self.cfg.k3
        return min(self.cfg.pad_deg2, 16)

    def _sharded_ell_k1(self) -> int:
        """Width of the sharded g-table: must cover cn1's src gather
        (pad_deg / k_small) AND the dst gather (pad_deg2_dst or pad_deg2),
        since the node-sharded path has no CSR-window fallback."""
        kd = self.cfg.pad_deg2_dst or self.cfg.pad_deg2
        return max(self.cfg.pad_deg, kd)

    def _chunk_interleave(self):
        """(cp_pos, cp_neg) column permutations (transmitted -> sorted) for
        the node-sharded dual-K split: after the degree sort, chunk t of the
        transmitted layout is chosen so device d's contiguous slice holds
        exactly nsp/ndev small chunks followed by nbp/ndev big chunks
        (counts made divisible by _split_plan's rounding).  Cached — the
        permutation depends only on (batch_size, chunk, ndev, split)."""
        if getattr(self, "_ichunk", None) is not None:
            return self._ichunk

        def perm(n_small: int) -> np.ndarray:
            c = self._chunk()
            nchunk = self.cfg.batch_size // c
            ndev = max(self.cfg.dp_devices, 1)
            nsl = n_small // ndev
            nbl = (nchunk - n_small) // ndev
            order = []
            for d in range(ndev):
                order += list(range(d * nsl, (d + 1) * nsl))
                order += list(range(n_small + d * nbl,
                                    n_small + (d + 1) * nbl))
            order = np.asarray(order, np.int64)
            return (order[:, None] * c + np.arange(c)).reshape(-1)

        nsp, nsn = self._split
        self._ichunk = (perm(nsp), perm(nsn))
        return self._ichunk

    def _build_adj2(self, g: Graph) -> Graph:
        from ocn_tpu.sparse.csr import graph_from_numpy

        # true (unpadded) nnz extent is indptr[-1]
        ip = np.asarray(g.indptr)
        col = np.asarray(g.col)[: int(ip[-1])]
        ip2, col2, val2 = B.adj2_csr(ip, col, g.n_nodes, cap=self.cfg.adj2_cap)
        # keep the host CSR for cn6's A^3 SpGEMM (the device graph below may
        # be gather-only, without col/val arrays)
        if self.cfg.predictor in THREE_HOP and g is self.g:
            self._adj2_host = (ip2, col2, val2)
        # A^2 is consumed exclusively through packed window gathers, so
        # upload only indptr/deg/packed — 4 B/entry instead of 16-20, the
        # memory plan that affords adj2_cap=1024 on ppa single-chip (VERDICT
        # r3 item 4).  The node-sharded path slices col/val host-side when
        # partitioning, so it keeps the full layout (its per-device shards
        # already divide the table).
        gather_only = self.cfg.graph_sharding != "node"
        return graph_from_numpy(ip2, col2, g.n_nodes, val2,
                                gather_only=gather_only)

    def _build_adj3(self, g: Graph, adj2: Graph) -> Graph:
        from ocn_tpu.sparse.csr import graph_from_numpy

        ip = np.asarray(g.indptr)
        col = np.asarray(g.col)[: int(ip[-1])]
        ip2, col2, val2 = self._adj2_host
        del self._adj2_host  # free ~8 B/entry of host RAM
        ip3, col3, val3 = B.spgemm_csr(
            ip2, col2[: int(ip2[-1])], val2[: int(ip2[-1])], ip, col, None,
            g.n_nodes, cap=self.cfg.adj3_cap)
        return graph_from_numpy(
            ip3, col3, g.n_nodes, val3,
            gather_only=self.cfg.graph_sharding != "node")

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int) -> TrainState:
        cfg = self.cfg
        k = jax.random.PRNGKey(seed)
        k_enc, k_pred, k_smp = jax.random.split(k, 3)
        ei0 = jnp.zeros((2, 8), jnp.int32)
        enc_vars = self.encoder.init(
            {"params": k_enc, "dropout": k_enc}, self.x, self.g, False
        )
        h0 = jnp.zeros((self.ds.n_nodes, cfg.hiddim), self.dtype)
        if self.frame_based:
            cn1, cn2 = cn_frames(
                self.g, ei0, k=cfg.pad_deg, k2=cfg.pad_deg2,
                cn2_counts=cfg.cn2_counts, exact_two_hop=cfg.exact_two_hop,
            )
            if cfg.predictor in THREE_HOP:
                from ocn_tpu.ops.frame import cn3_frame

                cn1, cn2, src = cn_frames(
                    self.g, ei0, k=cfg.pad_deg, k2=cfg.pad_deg2,
                    cn2_counts=cfg.cn2_counts, exact_two_hop=cfg.exact_two_hop,
                    with_src=True,
                )
                cn3 = cn3_frame(
                    self.g, ei0, src, k2=self._k3_width(), k3=self._k3_width(),
                    counts=cfg.cn2_counts, adj3=self.adj3,
                )
                pred_vars = self.predictor.init(
                    {"params": k_pred, "dropout": k_pred},
                    h0, self.g, cn1, cn2, cn3, ei0, False,
                )
            else:
                pred_vars = self.predictor.init(
                    {"params": k_pred, "dropout": k_pred},
                    h0, self.g, cn1, cn2, ei0, False,
                )
        else:
            pred_vars = self.predictor.init(
                {"params": k_pred, "dropout": k_pred, "sample": k_smp},
                h0, self.g, ei0, False, adj2=self.adj2,
            )
        params = {"encoder": enc_vars["params"], "predictor": pred_vars["params"]}
        ema = pred_vars.get("ema", {})
        sched = pred_vars.get("sched", {})
        tx = self._make_tx()
        return TrainState(params, ema, sched, tx.init(params))

    def _make_tx(self):
        cfg = self.cfg
        return optax.multi_transform(
            {"encoder": optax.adam(cfg.gnnlr), "predictor": optax.adam(cfg.prelr)},
            param_labels={"encoder": "encoder", "predictor": "predictor"},
        )

    # ------------------------------------------------------- chunked scoring
    def _gargs(self):
        """Graph-side jit arguments.  Passing these as arguments (not jit
        closure constants) keeps the serialized HLO free of the adjacency
        payload — adj2 ~180 MB / adj3 ~420 MB at collab scale would otherwise
        ride inside every compile upload (the cn6 HTTP 413)."""
        return {"g": self.g, "adj2": self.adj2, "adj3": self.adj3,
                "x": self.x}

    def _chunk(self) -> int:
        cfg = self.cfg
        target = cfg.linkbatchsize if cfg.linkbatchsize > 0 else 4096
        return _largest_divisor_leq(cfg.batch_size, target)

    def _score_chunk(self, params, ema, sched, h, g, edges, valid, key, training,
                     adj2=None, corr=None, y=None, k=None, gather_fn=None,
                     adj3=None):
        """Score one (2, C) chunk; returns ((C,) scores, new_ema).

        ``adj2``: precomputed A^2 Graph for the "gather" two-hop mode.
        ``corr``: (C,) maskinput self-path correction flags (1 for positive
        train edges whose (i, j) was just masked out; see ops/frame.py).
        ``y``: hoisted window table stop_gradient(h)[g.col] — turns the
        predictor's (B, K, H) row gather into contiguous CSR window slices
        (ops/frame.py _frame_matmul_multi_window).
        ``k``: candidate-frame width override (dual-K occupancy split);
        defaults to cfg.pad_deg.
        """
        cfg = self.cfg
        k = k or cfg.pad_deg
        rngs = {}
        if training:
            kd, ks, kf = jax.random.split(key, 3)
            rngs = {"dropout": kd, "sample": ks}
            frame_key = kf
        else:
            # the reference samples capped rows randomly at eval too
            # (sparsesample_reweight via adjoverlap's tstdeg,
            # utils.py:109-143); the caller passes a chunk-offset-folded
            # fixed key so eval is deterministic across calls.  None =
            # first-k window (cfg.eval_sampling=False).
            frame_key = key if cfg.eval_sampling else None
            if cfg.eval_sampling and not self.frame_based:
                # SELF_BUILDING family (cn2/cn3/cn4): its internal
                # sample_frame / gather_neighbors calls draw from the
                # "sample" stream — without it eval falls to deterministic
                # strided resampling + first-k windows, losing the
                # reference's random-at-eval tstdeg semantics (VERDICT r4
                # weak #2)
                rngs = {"sample": key}
        variables = {"params": params["predictor"], "ema": ema, "sched": sched}
        if self.frame_based:
            cn1, cn2, src = cn_frames(
                g, edges, k=k, k2=cfg.pad_deg2, key=frame_key,
                cn2_counts=cfg.cn2_counts, exact_two_hop=cfg.exact_two_hop,
                adj2=adj2, self_corr=corr, with_src=True,
                k2_dst=cfg.pad_deg2_dst, gather_fn=gather_fn,
            )
            pos = src.pos if (y is not None and cfg.cndeg <= 0) else None
            if cfg.cndeg > 0:
                # reference cnsampledeg cap on the CN sets (utils.py:265-266)
                from ocn_tpu.ops.sample import sample_frame

                cn1 = sample_frame(cn1, cfg.cndeg, frame_key)
                cn2 = sample_frame(cn2, cfg.cndeg, frame_key)
            # padded/invalid edges must not pollute batch column sums / EMA
            cn1 = cn1.with_values(cn1.val * valid[:, None])
            cn2 = cn2.with_values(cn2.val * valid[:, None])
            if cfg.predictor in THREE_HOP:
                from ocn_tpu.ops.frame import cn3_frame

                # cn3 shares the SAME candidate frame (src) as cn1/cn2
                cn3 = cn3_frame(
                    g, edges, src, k2=self._k3_width(), k3=self._k3_width(),
                    counts=cfg.cn2_counts,
                    adj3=adj3 if adj2 is not None else None,
                    gather_fn=gather_fn,
                )
                cn3 = cn3.with_values(cn3.val * valid[:, None])
                out, upd = self.predictor.apply(
                    variables, h, g, cn1, cn2, cn3, edges, training,
                    rngs=rngs, mutable=["ema"], y=y, pos=pos,
                )
            else:
                out, upd = self.predictor.apply(
                    variables, h, g, cn1, cn2, edges, training,
                    rngs=rngs, mutable=["ema"], y=y, pos=pos,
                )
        else:
            out, upd = self.predictor.apply(
                variables, h, g, edges, training,
                rngs=rngs, mutable=["ema"], adj2=adj2, k=k,
            )
        return out.reshape(-1), upd.get("ema", ema)

    def _scan_scores(self, params, ema, sched, h, g, edges, valid, key, training,
                     adj2=None, corrs=None, y=None, k=None, i0=0,
                     gather_fn=None, adj3=None, grp=None):
        """lax.scan over (nchunk, 2, C) edge chunks; returns (scores, ema).

        ``i0`` offsets the per-chunk RNG fold index so two scan bodies of the
        same step (dual-K split) draw disjoint dropout/sampling keys."""
        def body(carry, inp):
            ema_c, i = carry
            e, v, cr = inp
            out, ema_n = self._score_chunk(
                params, ema_c, sched, h, g, e, v,
                jax.random.fold_in(key, i), training, adj2=adj2, corr=cr, y=y,
                k=k, gather_fn=gather_fn, adj3=adj3,
            )
            return (ema_n, i + 1), out

        if corrs is None:
            corrs = jnp.zeros_like(valid)
        (ema_f, _), outs = jax.lax.scan(body, (ema, i0), (edges, valid, corrs))
        return outs.reshape(-1), ema_f

    def _scan_scores_grouped(self, params, ema, sched, h, g, edges, valid, key,
                             training, adj2, corrs, y=None, k=None, i0=0,
                             adj3=None, grp=None):  # THREE_HOP never routes here
        """Middle ground between the per-chunk scan and full hoisting: each
        scan step builds CN frames for `frame_group` chunks in one vectorized
        shot, then applies the predictor per chunk (column-normalization
        granularity preserved).  Compile cost grows with the group, not the
        batch."""
        cfg = self.cfg
        k = k or cfg.pad_deg
        grp = grp or cfg.frame_group
        nchunk, _, c = edges.shape
        if nchunk % grp:
            # clamp to the largest divisor of the chunk count (a frame_group
            # exceeding nchunk would reshape to zero groups)
            grp = max(d for d in range(1, min(nchunk, grp) + 1)
                      if nchunk % d == 0)
        ngroup = nchunk // grp
        gc = grp * c
        edges_g = edges.transpose(1, 0, 2).reshape(2, ngroup, gc).transpose(1, 0, 2)
        valid_g = valid.reshape(ngroup, gc)
        corrs_g = None if corrs is None else corrs.reshape(ngroup, gc)
        if corrs_g is None:
            corrs_g = jnp.zeros_like(valid_g)

        from ocn_tpu.ops.frame import CNFrame

        def body(carry, inp):
            ema_c, i = carry
            e, v, cr = inp
            frame_key = jax.random.fold_in(key, i) if training else None
            cn1, cn2, src = cn_frames(
                g, e, k=k, k2=cfg.pad_deg2, key=frame_key,
                cn2_counts=cfg.cn2_counts, exact_two_hop=cfg.exact_two_hop,
                adj2=adj2, self_corr=cr, with_src=True,
                k2_dst=cfg.pad_deg2_dst,
            )
            use_win = y is not None and cfg.cndeg <= 0
            if cfg.cndeg > 0:
                from ocn_tpu.ops.sample import sample_frame

                cn1 = sample_frame(cn1, cfg.cndeg, frame_key)
                cn2 = sample_frame(cn2, cfg.cndeg, frame_key)
            cn1 = cn1.with_values(cn1.val * v[:, None])
            cn2 = cn2.with_values(cn2.val * v[:, None])
            outs = []
            for j in range(grp):
                sl = slice(j * c, (j + 1) * c)
                rngs = {}
                if training:
                    rngs = {"dropout": jax.random.fold_in(key, i * grp + j + 1)}
                variables = {"params": params["predictor"], "ema": ema_c,
                             "sched": sched}
                out, upd = self.predictor.apply(
                    variables, h, g,
                    CNFrame(cn1.ids[sl], cn1.val[sl], g.n_nodes),
                    CNFrame(cn2.ids[sl], cn2.val[sl], g.n_nodes),
                    e[:, sl], training, rngs=rngs, mutable=["ema"],
                    y=y if use_win else None,
                    pos=src.pos[sl] if use_win else None,
                )
                ema_c = upd.get("ema", ema_c)
                outs.append(out.reshape(-1))
            return (ema_c, i + 1), jnp.concatenate(outs)

        (ema_f, _), outs = jax.lax.scan(
            body, (ema, i0), (edges_g, valid_g, corrs_g))
        return outs.reshape(-1), ema_f

    def _scan_scores_hoisted(self, params, ema, sched, h, g, edges, valid, key,
                             training, adj2, corrs, y=None, adj3=None,
                             grp=None):
        """Frame-based fast path: extract CN frames for the WHOLE batch in one
        vectorized shot (gathers/membership outside the serialized scan), then
        scan the predictor over per-chunk frame slices.  Column sums stay
        per-chunk inside the predictor, preserving the reference's
        per-linkbatch normalization semantics."""
        cfg = self.cfg
        nchunk, _, c = edges.shape
        flat = edges.transpose(1, 0, 2).reshape(2, nchunk * c)
        if training:
            key_frames, key = jax.random.split(key)
        else:
            key_frames = None
        cn1, cn2, src = cn_frames(
            g, flat, k=cfg.pad_deg, k2=cfg.pad_deg2, key=key_frames,
            cn2_counts=cfg.cn2_counts, exact_two_hop=cfg.exact_two_hop,
            adj2=adj2, self_corr=None if corrs is None else corrs.reshape(-1),
            with_src=True, k2_dst=cfg.pad_deg2_dst,
        )
        use_win = y is not None and cfg.cndeg <= 0
        if cfg.cndeg > 0:
            from ocn_tpu.ops.sample import sample_frame

            cn1 = sample_frame(cn1, cfg.cndeg, key_frames)
            cn2 = sample_frame(cn2, cfg.cndeg, key_frames)
        vflat = valid.reshape(-1)
        cn1 = cn1.with_values(cn1.val * vflat[:, None])
        cn2 = cn2.with_values(cn2.val * vflat[:, None])
        k1 = cn1.ids.shape[-1]
        ids_c = cn1.ids.reshape(nchunk, c, k1)
        v1_c = cn1.val.reshape(nchunk, c, k1)
        v2_c = cn2.val.reshape(nchunk, c, cn2.ids.shape[-1])
        pos_c = src.pos.reshape(nchunk, c, k1)

        from ocn_tpu.ops.frame import CNFrame

        def body(carry, inp):
            ema_c, i = carry
            e, ids, v1, v2, ps = inp
            rngs = {}
            if training:
                kd = jax.random.fold_in(key, i)
                rngs = {"dropout": kd}
            variables = {"params": params["predictor"], "ema": ema_c,
                         "sched": sched}
            out, upd = self.predictor.apply(
                variables,
                h, g, CNFrame(ids, v1, g.n_nodes), CNFrame(ids, v2, g.n_nodes),
                e, training, rngs=rngs, mutable=["ema"],
                y=y if use_win else None, pos=ps if use_win else None,
            )
            return (upd.get("ema", ema_c), i + 1), out.reshape(-1)

        (ema_f, _), outs = jax.lax.scan(
            body, (ema, 0), (edges, ids_c, v1_c, v2_c, pos_c))
        return outs.reshape(-1), ema_f

    def _loss(self, pos_out, neg_out):
        cfg = self.cfg
        return L.LOSSES[cfg.losstrick](
            pos_out, neg_out, num_neg=1,
            weight=cfg.lossweight, margin=cfg.lossmargin,
        )

    # ------------------------------------------------------------ train step
    def _build_steps(self):
        cfg = self.cfg
        tx = self._make_tx()

        # optional dp x tp mesh (SURVEY.md §2.7 TPU-native column): edge
        # batches sharded over "dp", predictor activations over "tp"; XLA
        # GSPMD inserts the gradient psums / activation collectives.
        mesh = None
        if cfg.dp_devices * cfg.tp_devices > 1:
            from ocn_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.dp_devices, cfg.tp_devices)
        self.mesh = mesh

        def _constrain_tp(x):
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            # hidden-dim tensor parallelism for the MLP stack
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "tp")))

        self._constrain_tp = _constrain_tp

        def masked_graph(base_g: Graph, mask_positions):
            """mask_positions: None | (P,) CSR positions | aux dict from
            prepare_batch carrying CSR positions + ELL window tables
            (sparse/ell.py).  The dict form attaches a maskinput-consistent
            ELL table: value bits cleared at the batch edges' frozen-window
            positions (computed host-side, scattered here)."""
            if mask_positions is None:
                return base_g
            if isinstance(mask_positions, dict):
                from ocn_tpu.sparse.ell import apply_ell_mask

                mp = mask_positions
                g = (base_g.mask_edges(mp["csr"])
                     if mp.get("csr") is not None else base_g)
                tbl = mp["ell1"]
                if mp.get("ell_flat") is not None:
                    tbl = apply_ell_mask(tbl, mp["ell_flat"], mp["ell_cleared"])
                return g.with_ell(tbl, mp["off1"])
            return base_g.mask_edges(mask_positions)

        def local_adj2(mask_positions, adj2):
            # A^2 needs no maskinput treatment (the self-path correction in
            # cn_frames handles it), but its window gathers ride the same
            # ELL layout when tables are on
            if isinstance(mask_positions, dict) and "ell2" in mask_positions:
                return adj2.with_ell(
                    mask_positions["ell2"], mask_positions["off2"])
            return adj2

        def local_adj3(mask_positions, adj3):
            # A^3 likewise (cn6): no mask treatment by design (third-order
            # paths through the removed edge are a vanishing fraction,
            # ops/frame.cn3_frame), but the row gather rides the ELL table
            if (adj3 is not None and isinstance(mask_positions, dict)
                    and "ell3" in mask_positions):
                return adj3.with_ell(
                    mask_positions["ell3"], mask_positions["off3"])
            return adj3

        def train_step(state: TrainState, pos, neg, mask_positions, key,
                       inv_p, inv_n, gargs):
            c = self._chunk()
            b = pos.shape[1]
            nchunk = b // c
            # one fused scan over [pos chunks ... neg chunks] — preserves the
            # reference's EMA update order (all positives, then all negatives)
            # while compiling a single scan body
            posc = pos.reshape(2, nchunk, c).transpose(1, 0, 2)
            negc = neg.reshape(2, nchunk, c).transpose(1, 0, 2)
            g = masked_graph(gargs["g"], mask_positions)
            adj2 = local_adj2(mask_positions, gargs["adj2"])
            adj3 = local_adj3(mask_positions, gargs["adj3"])
            k_enc, k_lnk = jax.random.split(key)
            split = self._split
            if split is not None and (inv_p is None or inv_n is None):
                raise ValueError(
                    "k_small > 0 requires degree-sorted batches; build step "
                    "inputs with Trainer.prepare_batch"
                )

            def corrs_for(n_pos: int, n_neg: int):
                # maskinput self-path correction applies to positive chunks
                if not (cfg.maskinput and self.adj2 is not None):
                    return None
                return jnp.concatenate(
                    [jnp.ones((n_pos, c), self.dtype),
                     jnp.zeros((n_neg, c), self.dtype)], axis=0)

            def loss_fn(params, ema):
                h = self.encoder.apply(
                    {"params": params["encoder"]}, gargs["x"], g, True,
                    rngs={"dropout": k_enc},
                )
                h = self._constrain_tp(h)
                # hoisted window table: ONE CSR-order gather per step; the
                # gradient to h flows through the frame matmuls' custom VJP,
                # not through y (see _frame_matmul_multi_window)
                y = None
                if cfg.window_table and self.frame_based and cfg.cndeg <= 0:
                    y = jax.lax.stop_gradient(h)[g.col]
                plain_frame = (
                    self.frame_based and cfg.predictor not in THREE_HOP
                )
                if cfg.hoist_frames and plain_frame:
                    scan_fn = self._scan_scores_hoisted
                elif cfg.frame_group > 1 and plain_frame:
                    scan_fn = self._scan_scores_grouped
                else:
                    scan_fn = self._scan_scores

                if split is None:
                    allc = jnp.concatenate([posc, negc], axis=0)
                    validc = jnp.ones((2 * nchunk, c), self.dtype)
                    out, ema2 = scan_fn(
                        params, ema, state.sched, h, g, allc, validc, k_lnk,
                        True, adj2=adj2, corrs=corrs_for(nchunk, nchunk),
                        y=y, adj3=adj3)
                    return self._loss(out[:b], out[b:]), ema2

                # dual-K occupancy split: batches arrive sorted by source
                # degree, so the leading chunks hold the low-degree majority
                # and run at frame width k_small; the tail runs at pad_deg.
                # EMA update order becomes [pos_s, neg_s, pos_b, neg_b] —
                # a documented deviation from the reference's all-pos-then-
                # all-neg (PARITY.md; the EMA is a running mean over
                # thousands of chunks, within-step order is noise).
                nsp, nsn = split
                nbp, nbn = nchunk - nsp, nchunk - nsn
                grp = cfg.frame_group if scan_fn is self._scan_scores_grouped else 1

                def eff_grp(n):
                    # largest divisor of the body's chunk count <= frame_group
                    return max(d for d in range(1, min(n, grp) + 1)
                               if n % d == 0)

                ema_c = ema
                pos_parts, neg_parts = [], []
                i0 = 0
                if nsp + nsn > 0:
                    small = jnp.concatenate([posc[:nsp], negc[:nsn]], axis=0)
                    out_s, ema_c = scan_fn(
                        params, ema_c, state.sched, h, g, small,
                        jnp.ones((nsp + nsn, c), self.dtype), k_lnk, True,
                        adj2=adj2, corrs=corrs_for(nsp, nsn), y=y,
                        k=cfg.k_small, adj3=adj3)
                    pos_parts.append(out_s[: nsp * c])
                    neg_parts.append(out_s[nsp * c:])
                    i0 = (nsp + nsn) // grp
                if nbp + nbn > 0:
                    big = jnp.concatenate([posc[nsp:], negc[nsn:]], axis=0)
                    out_b, ema_c = scan_fn(
                        params, ema_c, state.sched, h, g, big,
                        jnp.ones((nbp + nbn, c), self.dtype), k_lnk, True,
                        i0=i0, adj2=adj2, grp=eff_grp(nbp + nbn),
                        corrs=corrs_for(nbp, nbn), y=y, adj3=adj3)
                    pos_parts.append(out_b[: nbp * c])
                    neg_parts.append(out_b[nbp * c:])
                pos_sorted = (pos_parts[0] if len(pos_parts) == 1
                              else jnp.concatenate(pos_parts))
                neg_sorted = (neg_parts[0] if len(neg_parts) == 1
                              else jnp.concatenate(neg_parts))
                # restore original batch order so per-index pos/neg loss
                # pairing survives the degree sort
                return self._loss(pos_sorted[inv_p], neg_sorted[inv_n]), ema_c

            (loss, new_ema), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.ema
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(new_params, new_ema, state.sched, new_opt),
                loss,
            )

        if mesh is not None and cfg.graph_sharding == "node":
            # integrated node-sharded training: adjacency + A^2 + features
            # sharded over "dp" (parallel/sharded_graph.py); eval stays on
            # the replicated path below
            assert cfg.tp_devices == 1, "graph_sharding='node' uses dp only"
            from ocn_tpu.parallel.sharded_graph import (
                make_sharded_graph_train_step,
            )

            sg_step, sg_prepare = make_sharded_graph_train_step(self, mesh)

            def train_step_wrap(state, pos, neg, mask_positions, key,
                                inv_p=None, inv_n=None):
                ell1 = ell2 = ell3 = None
                if self._use_ell and self._ell is not None:
                    ell1, ell2 = self._ell["tbl1_sh"], self._ell["tbl2_sh"]
                    ell3 = self._ell.get("tbl3_sh")
                return sg_step(state, jnp.asarray(pos), jnp.asarray(neg),
                               sg_prepare(mask_positions), key,
                               inv_p, inv_n, ell1, ell2, ell3)

            self.train_step = train_step_wrap
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            edg = NamedSharding(mesh, P(None, "dp"))

            if self._split is None:

                def train_step5(state, pos, neg, mask_positions, key, gargs):
                    return train_step(state, pos, neg, mask_positions, key,
                                      None, None, gargs)

                jitted = jax.jit(
                    train_step5,
                    in_shardings=(rep, edg, edg, rep, rep, rep),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,),
                )

                def train_step_wrap(state, pos, neg, mask_positions, key,
                                    inv_p=None, inv_n=None):
                    return jitted(state, pos, neg, mask_positions, key,
                                  self._gargs())

                self.train_step = train_step_wrap
            else:
                # dual-K split on the GSPMD mesh: the scan over chunks stays
                # serialized (edges shard WITHIN each chunk over "dp"), so the
                # two scan bodies run the same program on every device; the
                # inverse permutations are replicated and GSPMD inserts the
                # gather resharding for the score reordering
                jitted = jax.jit(
                    train_step,
                    in_shardings=(rep, edg, edg, rep, rep, rep, rep, rep),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,),
                )

                def train_step_wrap(state, pos, neg, mask_positions, key,
                                    inv_p=None, inv_n=None):
                    return jitted(state, pos, neg, mask_positions, key,
                                  inv_p, inv_n, self._gargs())

                self.train_step = train_step_wrap
        else:
            jitted = jax.jit(train_step, donate_argnums=(0,))

            def train_step_wrap(state, pos, neg, mask_positions, key,
                                inv_p=None, inv_n=None):
                # graph arrays ride as ARGUMENTS: embedding them as jit
                # closure constants inflates the HLO by the full adjacency
                # payload (adj2 ~180 MB, adj3 ~420 MB at collab scale), which
                # overflows the remote-compile upload (HTTP 413 for cn6) and
                # slows every compile
                return jitted(state, pos, neg, mask_positions, key,
                              inv_p, inv_n, self._gargs())

            self.train_step = train_step_wrap

        def encode(params, x, g):
            return self.encoder.apply({"params": params["encoder"]}, x, g, False)

        _encode_jit = jax.jit(encode)
        self.encode = lambda params, g: _encode_jit(params, self.x, g)

        def make_score(kk):
            def score(params, ema, sched, h, g, adj2, adj3, edges, valid, key):
                y = None
                if cfg.window_table and self.frame_based and cfg.cndeg <= 0:
                    y = h[g.col]
                out, _ = self._score_chunk(
                    params, ema, sched, h, g, edges, valid,
                    key, False, adj2=adj2, y=y, adj3=adj3, k=kk,
                )
                return out

            return jax.jit(score)

        # per-frame-width compiled score programs (dual-K eval scores the
        # low-degree majority at k_small); adj3 rides as an argument like the
        # rest of the graph arrays (it is the largest one — see _gargs)
        self._score_jits = {}

        def score_k(params, ema, sched, h, g, adj2, edges, valid, key, k=None):
            fn = self._score_jits.get(k)
            if fn is None:
                fn = self._score_jits[k] = make_score(k)
            adj3 = self.adj3
            if (adj3 is not None and cfg.ell_eval and self._use_ell
                    and self._ell is not None and "tbl3" in self._ell):
                adj3 = adj3.with_ell(self._ell["tbl3"], self._ell["off3"])
            return fn(params, ema, sched, h, g, adj2, adj3, edges,
                      valid, key)

        self.score = (lambda params, ema, sched, h, g, adj2, edges, valid,
                      key, k=None: score_k(params, ema, sched, h, g, adj2,
                                           edges, valid, key, k))

    # ------------------------------------------------------------- epoch API
    def prepare_batch(self, pos_b: np.ndarray, neg_b: np.ndarray,
                      idx: Optional[np.ndarray] = None):
        """Host-side step-input prep shared by train_epoch and bench drivers.

        ``pos_b``/``neg_b``: (2, B) int edge arrays; ``idx``: (B,) indices
        into the train-edge list (for the maskinput position map).

        With the dual-K split active, each side is stable-sorted by source
        degree so the low-degree majority fills the leading (small-K) chunks;
        the returned inverse permutations restore original order on the
        scores, so per-index pos/neg loss pairing is exact for every loss in
        the catalog.  On the node-sharded path the degree sort composes with
        a round-robin chunk->device interleave (each device receives exactly
        nsp/ndev small + nbp/ndev big chunks; parallel/sharded_graph.py), and
        the inverse permutations map original -> transmitted positions of the
        all-gathered scores.  Returns (pos, neg, mask_positions, inv_p,
        inv_n) as device-ready arrays (None where inapplicable).
        """
        # node sharding needs dp_devices > 1; at dp=1 the Trainer runs the
        # plain single-device path (mesh is None) and must get the
        # replicated-form mask aux
        sharded = (self.cfg.graph_sharding == "node"
                   and getattr(self, "mesh", None) is not None)
        inv_p = inv_n = None
        if self._split is not None:
            ar = np.arange(pos_b.shape[1])
            sp = np.argsort(self._deg_np[pos_b[0]], kind="stable")
            sn = np.argsort(self._deg_np[neg_b[0]], kind="stable")
            if sharded:
                cp, cpn = self._chunk_interleave()
                sp, sn = sp[cp], sn[cpn]
            inv = np.empty_like(sp)
            inv[sp] = ar
            pos_b = pos_b[:, sp]
            if idx is not None:
                idx = idx[sp]
            inv_p = jnp.asarray(inv.astype(np.int32))
            invn = np.empty_like(sn)
            invn[sn] = ar
            neg_b = neg_b[:, sn]
            inv_n = jnp.asarray(invn.astype(np.int32))
        mp = mp_np = None
        if self.edge2pos is not None and idx is not None:
            mp_np = np.maximum(self.edge2pos[idx].reshape(-1), 0).astype(np.int32)
            mp = mp_np if sharded else jnp.asarray(mp_np)
        if sharded:
            # the sharded step routes mask positions host-side (sg_prepare);
            # attach the ELL flat positions of the current refresh when on
            if self._ell is not None and mp_np is not None:
                from ocn_tpu.sparse.ell import mask_ell_flat_positions

                flat, cleared = mask_ell_flat_positions(
                    pos_b, mp_np, self._indptr_np, self._ell["off1_np"],
                    self._sharded_ell_k1())
                mp = {"csr": mp_np, "ell_flat": flat, "ell_cleared": cleared}
            return (
                jnp.asarray(pos_b.astype(np.int32)),
                jnp.asarray(neg_b.astype(np.int32)),
                mp, inv_p, inv_n,
            )
        if self._ell is not None:
            # aux dict form: CSR mask positions + the current refresh's ELL
            # window tables (+ the batch edges' positions inside the frozen
            # windows, computed host-side — sparse/ell.py).  train_step's
            # masked_graph consumes the dict; shape/structure is stable
            # across refreshes so the step never recompiles.
            from ocn_tpu.sparse.ell import mask_ell_flat_positions

            aux = {
                "csr": mp,
                "ell1": self._ell["tbl1"], "off1": self._ell["off1"],
            }
            if "tbl2" in self._ell:  # absent for cn2/cn4 (no A^2 graph)
                aux["ell2"] = self._ell["tbl2"]
                aux["off2"] = self._ell["off2"]
            if "tbl3" in self._ell:  # cn6's A^3 table
                aux["ell3"] = self._ell["tbl3"]
                aux["off3"] = self._ell["off3"]
            if mp_np is not None:
                flat, cleared = mask_ell_flat_positions(
                    pos_b, mp_np, self._indptr_np, self._ell["off1_np"],
                    self.cfg.pad_deg)
                aux["ell_flat"] = jnp.asarray(flat)
                aux["ell_cleared"] = jnp.asarray(cleared)
            mp = aux
        return (
            jnp.asarray(pos_b.astype(np.int32)),
            jnp.asarray(neg_b.astype(np.int32)),
            mp, inv_p, inv_n,
        )

    def train_epoch(self, state: TrainState, rng: np.random.Generator,
                    epoch: int) -> Tuple[TrainState, float]:
        cfg = self.cfg
        if self._use_ell and (
            self._ell is None or (epoch - 1) % max(cfg.ell_refresh, 1) == 0
        ):
            # derived, stream-neutral rng: the main `rng` stream stays
            # byte-identical to an ell_tables=False run (clean A/Bs, and the
            # per-run batch/negative sequence is independent of this feature)
            self._refresh_ell(np.random.default_rng(
                (epoch * 0x9E3779B1 + 0x85EBCA77) & 0xFFFFFFFF))
        pos = self.train_edges  # (2, E)
        e = pos.shape[1]
        perm = rng.permutation(e)
        if cfg.neg_mode == "randint_target":
            # citation2 driver: negatives keep the positive sources, targets
            # are uniform node ids (NeighborOverlapCitation2.py:181-182)
            neg = np.stack([pos[0], rng.integers(0, self.ds.n_nodes, size=e)])
        else:
            neg = B.negative_sampling(self.ds.edge_index, self.ds.n_nodes, e, rng)
        if cfg.increasealpha and self.sched_has_alpha(state):
            # reference ramp max(0, min((epoch-5)*0.1, 1)) (NeighborOverlap_large.py:310)
            a = max(0.0, min((epoch - 5) * 0.1, 1.0))
            state = dataclasses.replace(
                state, sched=self._set_alpha(state.sched, a))
        losses = []
        bs = cfg.batch_size
        if e < bs and not getattr(self, "_warned_zero_batches", False):
            # loud failure instead of silently never training: the
            # drop-tail train iterator (reference PermIterator,
            # utils.py:20-30) runs ZERO batches when batch_size exceeds the
            # train-edge count — easy to hit with the generic preset
            # fallback (registry-only predictors have no README command) on
            # small graphs / synthetic_scale
            import warnings

            warnings.warn(
                f"batch_size {bs} > {e} train edges: the drop-tail train "
                f"iterator runs ZERO batches per epoch (reference "
                f"PermIterator semantics) — nothing will train.  Reduce "
                f"batch_size (<= {e}).", RuntimeWarning, stacklevel=2)
            self._warned_zero_batches = True
        key = jax.random.PRNGKey(rng.integers(2**31))
        # train-mode PermIterator drops the ragged tail (utils.py:20-30)
        for i, start in enumerate(range(0, e - bs + 1, bs)):
            idx = perm[start : start + bs]
            if cfg.sort_batch and self._split is None:
                # cluster the batch's neighbor gathers by source id; pos/neg
                # share the permutation so per-index loss pairing survives
                # (the dual-K split's degree sort supersedes this)
                idx = idx[np.argsort(pos[0, idx], kind="stable")]
            pe, ne, mask_positions, inv_p, inv_n = self.prepare_batch(
                pos[:, idx], neg[:, idx], idx)
            ki = jax.random.fold_in(key, i)
            if self.mesh is not None and self._split is None:
                # the unsplit mesh step has a fixed 5-arg sharding signature
                state, loss = self.train_step(state, pe, ne, mask_positions, ki)
            else:
                state, loss = self.train_step(
                    state, pe, ne, mask_positions, ki, inv_p, inv_n)
            losses.append(loss)
        mean_loss = float(np.mean([np.asarray(l) for l in losses])) if losses else 0.0
        return state, mean_loss

    def sched_has_alpha(self, state: TrainState) -> bool:
        return bool(state.sched)

    @staticmethod
    def _set_alpha(sched, value):
        return jax.tree_util.tree_map(lambda _: jnp.asarray(value, jnp.float32), sched)

    def _sharded_scorers(self):
        """Lazy (encode, score, encode_full, score_full, use_ell) bundle for
        node-sharded eval (parallel/sharded_graph.py): the adjacency, A^2 and
        window/ELL tables stay sharded through scoring; only the (n_nodes, H)
        hidden states are gathered whole (VERDICT r2 item 1c — a >HBM graph
        can now be evaluated, not just trained)."""
        if getattr(self, "_sh_eval", None) is None:
            from ocn_tpu.parallel.sharded_graph import (
                make_sharded_encode, make_sharded_score)

            use_ell = bool(self.cfg.ell_eval and self._use_ell)
            if use_ell and self._ell is None:
                # eval before any training epoch: build the epoch-1 tables
                self._refresh_ell(np.random.default_rng(
                    (1 * 0x9E3779B1 + 0x85EBCA77) & 0xFFFFFFFF))
            enc = make_sharded_encode(self, self.mesh, self.g, self.x)
            sc = make_sharded_score(self, self.mesh, self.g, self.adj2,
                                    use_ell, adj3=self.adj3)
            enc_full = sc_full = None
            if (self.cfg.use_valedges_as_input
                    and self.ds.full_edge_index is not None):
                # the full (train+valid) graph has its own edge set; the
                # train ELL tables do not apply (same rule as _eval_graphs)
                enc_full = make_sharded_encode(
                    self, self.mesh, self.full_g, self.x)
                # adj3 stays the train-graph A^3 on the full-graph pass (the
                # replicated score_k does the same; full-graph A^3 is never
                # built)
                sc_full = make_sharded_score(
                    self, self.mesh, self.full_g, self.full_adj2, False,
                    adj3=self.adj3)
            self._sh_eval = (enc, sc, enc_full, sc_full, use_ell)
        return self._sh_eval

    def _sharded_scores(self, state: TrainState, h, edges: np.ndarray,
                        scorer, use_ell: bool) -> np.ndarray:
        """_score_split body for the node-sharded scorer: fixed-shape (2, bs)
        slices with bs a multiple of ndev * chunk, tail padded + masked."""
        cfg = self.cfg
        unit = self.mesh.shape["dp"] * self._chunk()
        bs = max(unit, (cfg.testbs // unit) * unit)
        ell1 = ell2 = ell3 = None
        if use_ell:
            ell1, ell2 = self._ell["tbl1_sh"], self._ell["tbl2_sh"]
            ell3 = self._ell.get("tbl3_sh")
        out = []
        n = edges.shape[0]
        eval_key = jax.random.PRNGKey(cfg.seed)
        for start in range(0, n, bs):
            chunk = np.asarray(edges[start : start + bs]).T
            c = chunk.shape[1]
            pad = bs - c
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((2, pad), chunk.dtype)], axis=1)
            valid = np.zeros((bs,), np.float32)
            valid[:c] = 1.0
            s = scorer(
                state.params, state.ema, state.sched, h,
                jnp.asarray(chunk.astype(np.int32)), jnp.asarray(valid),
                jax.random.fold_in(eval_key, start), ell1, ell2, ell3)
            out.append(np.asarray(s[:c]))
        return np.concatenate(out) if out else np.zeros((0,))

    def _graph_deg_np(self, g) -> np.ndarray:
        """Host degree array of ``g`` (cached per graph object — g is either
        self.g or self.full_g)."""
        d = self._deg_np_by_graph.get(id(g))
        if d is None:
            d = np.asarray(g.deg)
            self._deg_np_by_graph[id(g)] = d
        return d

    def _score_split(self, state: TrainState, h, g, edges: np.ndarray,
                     adj2=None) -> np.ndarray:
        """Eval-mode PermIterator keeps the ragged tail (utils.py:20-30); the
        tail chunk is padded and masked so batch column sums see only real
        edges."""
        if self.cfg.graph_sharding == "node" and self.mesh is not None:
            _, sc, _, sc_full, use_ell = self._sharded_scorers()
            if g is self.full_g and sc_full is not None:
                return self._sharded_scores(state, h, edges, sc_full, False)
            return self._sharded_scores(state, h, edges, sc, use_ell)
        cfg = self.cfg
        n = edges.shape[0]
        use_dual = (
            cfg.dual_k_eval and 0 < cfg.k_small < cfg.pad_deg
            and (self.frame_based or cfg.predictor in SELF_BUILDING)
            and n > cfg.testbs
        )
        if not use_dual:
            return self._score_batches(state, h, g, edges, adj2)
        # dual-K at eval (VERDICT r2 item 7): degree-sort the split once,
        # score full testbs batches of deg<=k_small sources at frame width
        # k_small (exact — no extra capping; the boundary remainder rides the
        # big body), inverse-permute the scores.  Pairing-free: eval consumes
        # scores only.
        edges = np.asarray(edges)
        # degree of the graph actually being scored: evaluate() passes
        # full_g (train+valid edges) for the test split under
        # use_valedges_as_input, where a source whose degree crosses k_small
        # once valid edges are added must NOT be routed to the small body —
        # that would cap and reweight it at width k_small, contradicting the
        # "only exact-fit edges go small" invariant (round-3 advisor finding)
        gdeg = self._graph_deg_np(g)
        if cfg.predictor in SELF_BUILDING:
            # the family's outer width caps BOTH endpoint windows (its
            # k_frame covers src and dst gathers, unlike cn5's separate
            # k/k2), so the exact-fit invariant needs max of both degrees
            deg = np.maximum(gdeg[edges[:, 0]], gdeg[edges[:, 1]])
        else:
            deg = gdeg[edges[:, 0]]
        sp = np.argsort(deg, kind="stable")
        split_at = (int(np.sum(deg <= cfg.k_small)) // cfg.testbs) * cfg.testbs
        se = edges[sp]
        out = np.concatenate([
            self._score_batches(state, h, g, se[:split_at], adj2,
                                k=cfg.k_small, fold0=1),
            self._score_batches(state, h, g, se[split_at:], adj2, fold0=2),
        ])
        inv = np.empty(n, np.int64)
        inv[sp] = np.arange(n)
        return out[inv]

    def _score_batches(self, state: TrainState, h, g, edges: np.ndarray,
                       adj2=None, k=None, fold0: int = 0) -> np.ndarray:
        """Score (n, 2) edges in fixed (2, testbs) batches (tail padded and
        value-masked) at frame width ``k`` (None = pad_deg)."""
        bs = self.cfg.testbs
        out = []
        n = edges.shape[0]
        eval_key = jax.random.PRNGKey(self.cfg.seed)
        if fold0:
            # disjoint key stream per dual-K eval body (fold0=0 keeps the
            # original single-body stream byte-identical)
            eval_key = jax.random.fold_in(eval_key, fold0)
        for start in range(0, n, bs):
            chunk = np.asarray(edges[start : start + bs]).T  # (2, c)
            c = chunk.shape[1]
            pad = bs - c
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((2, pad), chunk.dtype)], axis=1)
            valid = np.zeros((bs,), np.float32)
            valid[:c] = 1.0
            s = self.score(
                state.params, state.ema, state.sched, h, g, adj2,
                jnp.asarray(chunk), jnp.asarray(valid),
                jax.random.fold_in(eval_key, start), k,
            )
            out.append(np.asarray(s[:c]))
        return np.concatenate(out) if out else np.zeros((0,))

    def evaluate(self, state: TrainState) -> Dict[str, Tuple[float, float, float]]:
        """Reference test() (NeighborOverlap_large.py:97-180): score train /
        valid / test positives against the valid/test negatives, Hits@K for
        K in {20, 50, 100}; `use_valedges_as_input` re-encodes with the full
        adjacency for the test split."""
        se = self.ds.split_edge
        h = self._eval_encode(state, full=False)
        g_eval, a2_eval = self._eval_graphs()
        pos_train = self._score_split(state, h, g_eval, se["train"]["edge"], a2_eval)
        pos_valid = self._score_split(state, h, g_eval, se["valid"]["edge"], a2_eval)
        neg_valid = self._score_split(state, h, g_eval, se["valid"]["edge_neg"], a2_eval)
        if self.cfg.use_valedges_as_input:
            h = self._eval_encode(state, full=True)
            # full-graph adjacency has its own (bigger) edge set; the train
            # ELL tables do not apply
            g_test, a2_test = self.full_g, self.full_adj2
        else:
            g_test, a2_test = g_eval, a2_eval
        pos_test = self._score_split(state, h, g_test, se["test"]["edge"], a2_test)
        neg_test = self._score_split(state, h, g_test, se["test"]["edge_neg"], a2_test)
        results = {}
        for k in (20, 50, 100):
            results[f"Hits@{k}"] = (
                M.hits_at_k(pos_train, neg_valid, k),
                M.hits_at_k(pos_valid, neg_valid, k),
                M.hits_at_k(pos_test, neg_test, k),
            )
        return results

    def _eval_graphs(self):
        """(g, adj2) for eval scoring — with the current refresh's ELL window
        tables attached when available (`Config.ell_eval`): rows with degree
        <= pad_deg score bit-identically (tests/test_ell.py), capped rows use
        the frozen window sample instead of a per-chunk random one (same
        estimator, PARITY.md §7; accuracy A/Bs in BASELINE.md).  Measured
        +42% eval throughput on chip — 104.2k vs 73.6k edges/s
        (BENCH_NOTES 2026-08-20)."""
        if (self.cfg.ell_eval and self._use_ell and self._ell is not None
                and "tbl1" in self._ell):  # sharded mode holds shards instead
            g = self.g.with_ell(self._ell["tbl1"], self._ell["off1"])
            a2 = (self.adj2.with_ell(self._ell["tbl2"], self._ell["off2"])
                  if "tbl2" in self._ell else self.adj2)
            return g, a2
        return self.g, self.adj2

    def _eval_encode(self, state: TrainState, full: bool):
        """Eval-mode hidden states — via the sharded encoder (halo-exchange
        SpMM on graph shards + one h all_gather) when node-sharded."""
        if self.cfg.graph_sharding == "node" and self.mesh is not None:
            enc, _, enc_full, _, _ = self._sharded_scorers()
            if full and enc_full is not None:
                return enc_full(state.params["encoder"])
            return enc(state.params["encoder"])
        g = self.full_g if full else self.g
        return self.encode(state.params, g)

    def evaluate_mrr(self, state: TrainState) -> Dict[str, float]:
        """citation2-style MRR eval (NeighborOverlapCitation2.py:235-259)."""
        se = self.ds.split_edge
        h = self._eval_encode(state, full=False)
        g_eval, a2_eval = self._eval_graphs()
        out = {}
        for part in ("valid", "test"):
            src = se[part]["source_node"]
            tgt = se[part]["target_node"]
            negs = se[part]["target_node_neg"]  # (n, num_neg)
            pos = self._score_split(state, h, g_eval, np.stack([src, tgt], 1), a2_eval)
            n, m = negs.shape
            flat = np.stack([np.repeat(src, m), negs.reshape(-1)], 1)
            neg = self._score_split(state, h, g_eval, flat, a2_eval).reshape(n, m)
            out[part] = M.mrr(pos, neg)
        return out
