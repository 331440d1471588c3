"""Incomplete-graph CN predictors: cn2 / cn4 (and the recursion machinery).

Reference `IncompleteCN1Predictor` (cn2, model.py:843-1147) and its
memory-tuned twin `IncompleteCN1PredictorSaveMemory` (cn4, model.py:1532-1886
— identical math with manual `del`/`empty_cache` interleaving, which XLA's
liveness analysis makes moot, so cn4 is an alias here).

Mechanism (model.py:888-1131): besides the hard CN set, take the residual
sets res1 = N(i)\\N(j) and res2 = N(j)\\N(i) (degree-capped to
trainresdeg/testresdeg).  Each residual entry (e, k) is a *potential* CN if
the missing edge (j_e, k) (resp. (i_e, k)) existed; score those candidate
edges with this same predictor at depth-1 under stop_gradient
(model.py:926-946), convert scores to probabilities with the Bayes-odds
clamp (model.py:884-886)

    p0 = sigmoid(scale * (prob - offset));   p = alpha2 * pt*p0 / (pt*p0 + 1-p0)

(optionally a learnable per-edge pt via `ptlin(xij)`, model.py:947-950),
weight the residual entries by those probabilities, run the cn5-style
orthogonalization of res2 against column-normalized res1 on their (disjoint)
union pattern (model.py:960-1117), and add both aggregates to the hard-CN
aggregate.  The static recursion depth unrolls at trace time; `splitsize`
chunking (model.py:936-946) is unnecessary under XLA and subsumed by the
static caps.

Because the residual patterns are disjoint, the reference's Hadamard inner
product between res2 and normalized-res1 is identically zero — the EMA state
only decays.  This is preserved bit-for-bit.

`alpha2` (the ramp set by `--increasealpha` through `setalpha`,
model.py:1133-1135) lives in the mutable "sched" collection so the train loop
can overwrite it per epoch.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ocn_tpu.nn.mlp import CNAggMLP, HeadMLP, XLin, XijMLP
from ocn_tpu.ops.frame import (
    CNFrame,
    _rowwise_membership,
    cn_residual_frames,
    gather_neighbors,
)
from ocn_tpu.ops.ortho import colnorm_plain, colnorm_quirk
from ocn_tpu.ops.sample import sample_frame
from ocn_tpu.sparse.csr import Graph


class IncompleteCNPredictor(nn.Module):
    """cn2/cn4.  Builds its own CN/residual frames from (g, tar_ei)."""

    hidden: int
    out: int = 1
    dropout: float = 0.3
    edrop: float = 0.0
    ln: bool = False
    cndeg: int = -1
    use_xlin: bool = False
    tailact: bool = False
    twolayerlin: bool = False
    beta_init: float = 1.0
    alpha_init: float = 1.0
    scale: float = 5.0
    offset: float = 3.0
    trainresdeg: int = 8
    testresdeg: int = 128
    pt: float = 0.5
    learnablept: bool = False
    depth: int = 1
    k: int = 32  # candidate-frame width (neighbor cap)
    # frame width for the RECURSIVE scorer (0 = same as k).  The depth-1
    # stop-gradient re-scoring of B*resdeg potential edges dominates the
    # family's cost (each residual entry pays a full forward's gathers +
    # membership); a narrower recursion frame caps its adjacency sample with
    # the standard deg/k reweighting — the same estimator family as the
    # reference's trndeg/tstdeg/cndeg caps (utils.py:109-143).
    rec_k: int = 0
    higher_order: bool = False  # cn3: also complete the 2-hop CN order
    # The reference scores the recursion under torch.no_grad with the module
    # still in TRAIN mode (model.py:926-946): DropAdj and every MLP dropout
    # stay ACTIVE inside the recursive scorer (and, for cn3, its EMA buffer
    # steps on each recursive call).  True reproduces that; False scores the
    # recursion deterministically (eval-mode semantics).
    recursion_train_mode: bool = True
    # DropAdj implementation (VERDICT r3 item 6): True applies edrop as
    # Bernoulli LANE masks on the gathered windows (ops/frame.py
    # gather_neighbors drop=), which keeps the packed/ELL gather layout
    # attached — with value-mutation DropAdj (Graph.drop_edges) every
    # preedp>0 chunk detaches the ELL tables and the family falls off the
    # row-gather fast path (~5.7x, BENCH_NOTES r3).  Same marginal
    # estimator; correlation-only deviation documented in PARITY.md.  False
    # (or an unpacked graph) restores the value-mutation path.
    lane_drop: bool = True

    def setup(self):
        self.beta = self.param(
            "beta", nn.initializers.constant(self.beta_init), (1,))
        self.alpha = self.param("alpha", nn.initializers.ones, (3,))  # parity
        self.alpha2 = self.variable(
            "sched", "alpha2", lambda: jnp.asarray(self.alpha_init, jnp.float32))
        self.ema = self.variable("ema", "innerprod", lambda: jnp.zeros(()))
        self.nvar = self.variable("ema", "n", lambda: jnp.zeros((), jnp.int32))
        self.xijlin = XijMLP(self.hidden, self.dropout, self.ln, self.tailact)
        self.xlin = XLin(self.hidden, self.dropout, self.ln)
        self.xcnlin = CNAggMLP(self.hidden, self.dropout, self.ln, False)
        self.head = HeadMLP(
            self.hidden, self.out, self.dropout, self.ln, self.twolayerlin)
        if self.learnablept:
            self.ptlin1 = nn.Dense(self.hidden)
            self.ptlin2 = nn.Dense(1)

    def __call__(
        self,
        x: jax.Array,
        g: Graph,
        tar_ei: jax.Array,
        training: bool = False,
        depth: Optional[int] = None,
        adj2: Optional[Graph] = None,
        k: Optional[int] = None,
    ) -> jax.Array:
        """``k``: outer candidate-frame width override (dual-K occupancy
        split routes low-degree chunks here at k_small); recursion depth
        keeps rec_k regardless."""
        if self.higher_order:
            return self._forward_higher_order(
                x, g, tar_ei, training, depth, adj2, k)
        return self._forward_1hop(x, g, tar_ei, training, depth, k)

    def _forward_1hop(
        self,
        x: jax.Array,
        g: Graph,
        tar_ei: jax.Array,
        training: bool = False,
        depth: Optional[int] = None,
        k: Optional[int] = None,
    ) -> jax.Array:
        depth = self.depth if depth is None else depth
        det = not training
        # recursive calls (depth < self.depth) may run at a narrower frame
        k_frame = (k or self.k) if depth == self.depth else (self.rec_k or self.k)

        drop = None
        if training and self.edrop > 1e-6:
            dk = self.make_rng("dropout")
            if self.lane_drop and g.packed is not None:
                drop = (dk, self.edrop)
            else:
                g = g.drop_edges(dk, self.edrop)
        # the "sample" stream is drawn whenever provided — at eval the
        # Trainer passes a chunk-folded FIXED key (cfg.eval_sampling), so the
        # family samples capped rows randomly at eval like the reference's
        # tstdeg sparsesample_reweight (utils.py:109-143) while staying
        # deterministic across eval calls
        sample_key = (
            self.make_rng("sample") if self.has_rng("sample") else None
        )

        xij_raw = x[tar_ei[0]] * x[tar_ei[1]]
        xij = self.xijlin(xij_raw, det)
        x_aug = x + (self.xlin(x, det) if self.use_xlin else 0.0)

        resdeg = self.trainresdeg if training else self.testresdeg
        kk = jax.random.split(sample_key, 4) if sample_key is not None else [None] * 4
        cn, res1, res2 = cn_residual_frames(g, tar_ei, k_frame, kk[0], drop=drop)
        if self.cndeg > 0:
            cn = sample_frame(cn, self.cndeg, kk[1])
        xcn = cn.matmul(x_aug)

        if depth > 0:
            if resdeg > 0:
                res1 = sample_frame(res1, resdeg, kk[2])
                res2 = sample_frame(res2, resdeg, kk[3])

            # --- recursive scoring of potential CN edges (model.py:924-946)
            def score_residual(res: CNFrame, anchor: jax.Array) -> jax.Array:
                b, r = res.ids.shape
                # torch.no_grad => stop_gradient, but the module stays in
                # train mode: dropouts/DropAdj remain active in the recursive
                # scorer (reference model.py:926-946).  Depth-1 recursion
                # rides the blocked depth-0 scorer (shared anchor windows).
                rec_train = training and self.recursion_train_mode
                if depth - 1 == 0 and self._blockable(g, res):
                    return jax.lax.stop_gradient(self._blocked_depth0(
                        x, g, anchor, res.ids, rec_train, None,
                        valid=res.mask))
                cand = jnp.minimum(res.ids, g.n_nodes - 1).reshape(-1)
                anchors = jnp.broadcast_to(anchor[:, None], (b, r)).reshape(-1)
                ei = jnp.stack([anchors, cand])
                prob = self(x, g, ei, training=rec_train, depth=depth - 1)
                return jax.lax.stop_gradient(prob.reshape(b, r))

            prob1 = score_residual(res1, tar_ei[1])  # missing edge (j, k)
            prob2 = score_residual(res2, tar_ei[0])  # missing edge (i, k)

            def clampprob(prob, pt):
                p0 = jax.nn.sigmoid(self.scale * (prob - self.offset))
                return self.alpha2.value * pt * p0 / (pt * p0 + 1 - p0)

            if self.learnablept:
                pt = nn.sigmoid(self.ptlin2(nn.relu(self.ptlin1(xij))))
                prob1, prob2 = clampprob(prob1, pt), clampprob(prob2, pt)
            else:
                prob1 = clampprob(prob1, self.pt)
                prob2 = clampprob(prob2, self.pt)
            res1 = res1.with_values(res1.val * prob1 * res1.mask)
            res2 = res2.with_values(res2.val * prob2 * res2.mask)

            # --- orthogonalization of res2 against ncn(res1) on the disjoint
            # union pattern (model.py:960-1117); batch inner product == 0.
            ncn1 = colnorm_quirk(res1, 0.0)
            if training and not self.is_initializing():
                new_n = self.nvar.value + 1
                self.ema.value = (1.0 - 1.0 / new_n) * self.ema.value
                self.nvar.value = new_n
            inner = self.ema.value
            scale = jnp.max(jnp.abs(ncn1.val))
            nip = jnp.where(scale > 0, inner / scale, inner)
            union = CNFrame(
                ids=jnp.concatenate([res2.ids, res1.ids], axis=-1),
                val=jnp.concatenate([res2.val, -nip * ncn1.val], axis=-1),
                n_nodes=g.n_nodes,
            )
            ocn2 = colnorm_plain(union)
            xcn = xcn + ocn2.matmul(x_aug) + ncn1.matmul(x_aug)

        z = self.xcnlin(xcn, det)
        return self.head(z * self.beta + xij, det)

    def _score_res(self, x, g, res: CNFrame, anchor, training, depth, adj2, xij):
        """Recursive scoring + Bayes-odds clamp of one residual frame
        (model.py:924-957): potential edges (anchor_e, k) scored at depth-1
        under stop_gradient, clamped, and multiplied into the residual
        weights.  Depth-1 recursion routes through the blocked depth-0
        scorer (anchor windows shared across the R candidate copies)."""
        b, r = res.ids.shape
        rec_train = training and self.recursion_train_mode
        if depth - 1 == 0 and self._blockable(g, res):
            prob = jax.lax.stop_gradient(
                self._blocked_depth0(x, g, anchor, res.ids, rec_train, adj2,
                                     valid=res.mask))
        else:
            cand = jnp.minimum(res.ids, g.n_nodes - 1).reshape(-1)
            anchors = jnp.broadcast_to(anchor[:, None], (b, r)).reshape(-1)
            ei = jnp.stack([anchors, cand])
            prob = jax.lax.stop_gradient(
                self(x, g, ei, training=rec_train, depth=depth - 1, adj2=adj2)
            ).reshape(b, r)
        if self.learnablept:
            pt = nn.sigmoid(self.ptlin2(nn.relu(self.ptlin1(xij))))
        else:
            pt = self.pt
        p0 = jax.nn.sigmoid(self.scale * (prob - self.offset))
        prob = self.alpha2.value * pt * p0 / (pt * p0 + 1 - p0)
        return res.with_values(res.val * prob * res.mask)

    def _blockable(self, g: Graph, res: CNFrame) -> bool:
        """Route a depth-1 recursion block through the blocked scorer.

        Gated off for cndeg>0 (sample_frame would desync the shared ids)
        and for LARGE blocks on a graph without ELL tables: the CSR-window
        blocked eval at (B, testresdeg=128, K=64) materializes ~GB-scale
        intermediates and OOMs a single chip (measured, bench_r5_cn3_eval),
        where the ELL layout fits; the generic per-edge path (pre-round-5
        behavior) handles the no-ELL fallback at its old speed."""
        if self.cndeg > 0:
            return False
        k_frame = self.rec_k or self.k
        return g.ell is not None or res.ids.size * k_frame <= 2 ** 22

    def _blocked_depth0(self, x, g, anchors, cand_ids, training, adj2,
                        valid=None):
        """Depth-0 recursive scoring of a (B, R) candidate block, sharing
        each anchor's neighbor window across its R candidate edges.

        The generic path scores the B*R potential edges (anchor_b,
        cand_{b,r}) as one flat forward whose src-side window N(anchor) is
        gathered R times (anchors repeat R-fold): the frame ids, the colnorm
        id array and the (B*R, K, H) aggregate feature gather — the three
        dominant costs of a recursion body (scripts/profile_cn3.py: colnorm
        17.5 ms + matmul 13.6 ms of a 33.6 ms body) — are all R-fold
        redundant.  This blocked equivalent gathers each anchor window ONCE
        ((B, K) descriptors instead of (B*R, K)) and carries candidates as a
        middle axis; column sums pre-reduce over R before the segment-sum
        (linearity — exact reassociation).

        Parity: with ELL tables (production) the per-node window is frozen,
        so the shared window IS the window every generic copy would read —
        identical estimator.  Without ELL, capped anchor rows share one
        window-offset draw across their R copies (correlation-only
        deviation, same class as PARITY.md §9).  DropAdj lane masks are
        drawn at (B, R, K), so per-edge mask independence is preserved
        exactly.  EMA, Bayes clamp, MLP shapes and the fill=1 quirk mirror
        the generic depth-0 forward (reference model.py:926-946 recursion,
        1247-1409 GS).  Gated to cndeg<=0 (sample_frame would desync the
        shared ids); depth>=2 recursion falls back to the generic path.
        """
        det = not training
        b, r = cand_ids.shape
        n = g.n_nodes
        k_frame = self.rec_k or self.k
        cand = jnp.minimum(cand_ids, n - 1)

        drop_p = self.edrop if (training and self.edrop > 1e-6) else 0.0
        dk = self.make_rng("dropout") if drop_p > 0 else None
        lane = drop_p > 0 and self.lane_drop and g.packed is not None
        if drop_p > 0 and not lane:
            g = g.drop_edges(dk, drop_p)
        sample_key = (
            self.make_rng("sample") if self.has_rng("sample") else None
        )
        kk = (jax.random.split(sample_key, 3) if sample_key is not None
              else [None] * 3)

        xij = self.xijlin(x[anchors][:, None, :] * x[cand], det)
        x_aug = x + (self.xlin(x, det) if self.use_xlin else 0.0)

        src = gather_neighbors(g, anchors, k_frame, kk[0])
        srcw = jnp.broadcast_to(src.w[:, None, :], (b, r, k_frame))
        if lane:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dk, 0), 1.0 - drop_p, (b, r, k_frame))
            srcw = jnp.where(keep, srcw * (1.0 / (1.0 - drop_p)), 0.0)
        dstf = gather_neighbors(
            g, cand.reshape(-1), k_frame, kk[1],
            drop=None if not lane else (jax.random.fold_in(dk, 1), drop_p))
        in_dst = _rowwise_membership(
            src.ids[:, None, :], dstf.ids.reshape(b, r, k_frame),
            dstf.w.reshape(b, r, k_frame))
        cn_val = jnp.where(in_dst != 0, srcw, 0.0)  # (B, R, K)
        if valid is not None:
            # exclude PADDED candidate rows from the recursive call's
            # cross-row state (colsums / EMA / scale): the reference scores
            # exactly the real candidates; phantom sentinel edges must not
            # pollute the shared buffers.  Their per-row scores are masked
            # by the caller either way.
            cn_val = cn_val * valid[:, :, None]
        xg = x_aug[jnp.minimum(src.ids, n - 1)]     # (B, K, H): ONE gather

        def agg(val):
            return jnp.einsum(
                "brk,bkh->brh", val, xg,
                preferred_element_type=jnp.float32).astype(x.dtype)

        if not self.higher_order:
            z = self.xcnlin(agg(cn_val), det)
            return self.head(z * self.beta + xij, det).reshape(b, r)

        a2 = gather_neighbors(adj2, cand.reshape(-1), k_frame, kk[2])
        in_a2 = _rowwise_membership(
            src.ids[:, None, :], a2.ids.reshape(b, r, k_frame),
            a2.w.reshape(b, r, k_frame))
        cn22_val = jnp.where(in_a2 != 0, srcw, 0.0)
        if valid is not None:
            cn22_val = cn22_val * valid[:, :, None]

        ids_flat = src.ids.reshape(-1)

        def colsum(val_brk):
            # pre-reduce over the candidate axis: colsum is linear, and the
            # R copies of one anchor share their id row
            pre = val_brk.sum(axis=1).reshape(-1)
            return jax.ops.segment_sum(pre, ids_flat, num_segments=n + 1)

        s1 = colsum(cn_val)
        s_rep = jnp.where(s1 == 0, 1.0, s1)
        inv1 = jnp.where(s_rep != 1, 1.0 / s_rep, 1.0)  # fill=1 quirk
        ncn1_val = cn_val * inv1[ids_flat].reshape(b, 1, k_frame)
        ema_v = self.ema.value
        if training and not self.is_initializing():
            new_n = self.nvar.value + 1
            bet = 1.0 / new_n.astype(jnp.float32)
            ema_v = (1.0 - bet) * self.ema.value + bet * jnp.sum(
                cn22_val * ncn1_val)
            self.ema.value = ema_v
            self.nvar.value = new_n
        scale = jnp.max(jnp.abs(ncn1_val))
        nip = jnp.where(scale > 0, ema_v / scale, ema_v)
        mask_u = (cn22_val != 0) | (ncn1_val != 0)
        val_o = jnp.where(mask_u, cn22_val - nip * ncn1_val, 0.0)
        s2 = colsum(val_o)
        inv2 = 1.0 / jnp.where(s2 == 0, 1.0, s2)
        ncn22_val = val_o * inv2[ids_flat].reshape(b, 1, k_frame)

        z = (self.xcnlin(agg(ncn1_val), det) * self.beta
             + self.xcnlin(agg(ncn22_val), det) * self.beta)
        return self.head(z + xij, det).reshape(b, r)

    def _forward_higher_order(
        self,
        x: jax.Array,
        g: Graph,
        tar_ei: jax.Array,
        training: bool = False,
        depth: Optional[int] = None,
        adj2: Optional[Graph] = None,
        k: Optional[int] = None,
    ) -> jax.Array:
        """cn3 (reference IncompleteCN1Predictorhighorder, model.py:1150-1522).

        Differences from cn2, all preserved:
        * also builds the 2-hop CN set cn22 = N(i) /\\ N2(j) with residuals
          against the (precomputed, row-capped) A^2 (model.py:1214-1240; the
          reference recomputes A^2 internally, :1211-1212);
        * ncn1 uses empty_fill = 1 (model.py:1253 `inv_col_sum[...] = 1`);
        * cn22 is Gram-Schmidt-projected against ncn1 and renormalized
          (:1247-1409);
        * residual completion is applied to BOTH orders, *without*
          orthogonalizing the residuals (:1416-1493);
        * head: lin(xcnlin(xcn_1hop)*beta + xcnlin(xcn_2hop)*beta + xij),
          same xcnlin for both (:1497-1504).
        """
        assert adj2 is not None, "cn3 requires the precomputed A^2 graph"
        depth = self.depth if depth is None else depth
        det = not training
        k_frame = (k or self.k) if depth == self.depth else (self.rec_k or self.k)

        drop = None
        if training and self.edrop > 1e-6:
            dk = self.make_rng("dropout")
            if self.lane_drop and g.packed is not None:
                drop = (dk, self.edrop)
            else:
                g = g.drop_edges(dk, self.edrop)
        # the "sample" stream is drawn whenever provided — at eval the
        # Trainer passes a chunk-folded FIXED key (cfg.eval_sampling), so the
        # family samples capped rows randomly at eval like the reference's
        # tstdeg sparsesample_reweight (utils.py:109-143) while staying
        # deterministic across eval calls
        sample_key = (
            self.make_rng("sample") if self.has_rng("sample") else None
        )
        kk = jax.random.split(sample_key, 6) if sample_key is not None else [None] * 6

        xij_raw = x[tar_ei[0]] * x[tar_ei[1]]
        xij = self.xijlin(xij_raw, det)
        x_aug = x + (self.xlin(x, det) if self.use_xlin else 0.0)
        resdeg = self.trainresdeg if training else self.testresdeg

        # 1-hop CN + residuals (src/dst frames).  The 2-hop frames are built
        # on the SAME src window (with_src) rather than a second independent
        # gather (pre-round-5): with one id array per src-side frame the
        # Gram-Schmidt `cn22 - nip*ncn1` is lane-aligned (== column-aligned,
        # the reference's union semantics, model.py:1247-1409) even on
        # capped rows — the old two-gather layout misaligned lanes whenever
        # caps bound — and one frame_index powers both colnorms plus a
        # single shared (B,K,H) matmul gather.  Deviation note: the 1-hop
        # and 2-hop candidate SAMPLES are now correlated (the reference
        # samples per adjoverlap call); correlation-only, PARITY.md.
        cn, res1, res2, srcf = cn_residual_frames(
            g, tar_ei, k_frame, kk[0], drop=drop, with_src=True)
        # candidates vs the A^2 row of j (adj2 takes no DropAdj, like the
        # value-mutation path which only drops g).  The A^2 row keeps the
        # FULL width at the outer depth even under a dual-K `k` override:
        # A^2 rows are fat regardless of the source's 1-hop degree, so
        # narrowing them with the small body would cap the 2-hop candidate
        # set extra (cn5's split keeps k2=pad_deg2 for the same reason).
        k_a2 = (self.k if depth == self.depth else k_frame)
        a2row = gather_neighbors(adj2, tar_ei[1], k_a2, kk[2])
        in_a2 = _rowwise_membership(srcf.ids, a2row.ids, a2row.w)
        in_src = _rowwise_membership(a2row.ids, srcf.ids, srcf.w)
        cn22 = CNFrame(srcf.ids, jnp.where(in_a2 != 0, srcf.w, 0.0), g.n_nodes)
        cn2res1 = CNFrame(srcf.ids, jnp.where(in_a2 == 0, srcf.w, 0.0), g.n_nodes)
        cn2res2 = CNFrame(
            a2row.ids, jnp.where(in_src == 0, (a2row.w != 0) * 1.0, 0.0), g.n_nodes
        )
        share_src = self.cndeg <= 0
        if self.cndeg > 0:
            cn = sample_frame(cn, self.cndeg, kk[3])
            cn22 = sample_frame(cn22, self.cndeg, kk[3])

        # ncn1 with fill=1 (model.py:1253), EMA + Gram-Schmidt of cn22
        from ocn_tpu.ops.frame import frame_index, matmul_shared

        fidx_s = frame_index(srcf.ids, g.n_nodes) if share_src else None
        ncn1 = colnorm_quirk(cn, 1.0, fidx_s)
        if training and not self.is_initializing():
            new_n = self.nvar.value + 1
            b = 1.0 / new_n.astype(jnp.float32)
            self.ema.value = (1.0 - b) * self.ema.value + b * cn22.inner(ncn1)
            self.nvar.value = new_n
        inner = self.ema.value
        scale = jnp.max(jnp.abs(ncn1.val))
        nip = jnp.where(scale > 0, inner / scale, inner)
        ncn22 = colnorm_plain(cn22.with_values(
            jnp.where(cn22.mask | ncn1.mask, cn22.val - nip * ncn1.val, 0.0)),
            fidx_s)

        if share_src:
            xcn_1, xcn_2 = matmul_shared([ncn1, ncn22], x_aug, fidx_s)
        else:
            xcn_1 = ncn1.matmul(x_aug)
            xcn_2 = ncn22.matmul(x_aug)

        if depth > 0:
            if resdeg > 0:
                res1 = sample_frame(res1, resdeg, kk[4])
                res2 = sample_frame(res2, resdeg, kk[4])
                cn2res1 = sample_frame(cn2res1, resdeg, kk[5])
                cn2res2 = sample_frame(cn2res2, resdeg, kk[5])
            res1 = self._score_res(x, g, res1, tar_ei[1], training, depth, adj2, xij)
            res2 = self._score_res(x, g, res2, tar_ei[0], training, depth, adj2, xij)
            cn2res1 = self._score_res(x, g, cn2res1, tar_ei[1], training, depth, adj2, xij)
            cn2res2 = self._score_res(x, g, cn2res2, tar_ei[0], training, depth, adj2, xij)
            xcn_1 = xcn_1 + res1.matmul(x_aug) + res2.matmul(x_aug)
            xcn_2 = xcn_2 + cn2res1.matmul(x_aug) + cn2res2.matmul(x_aug)

        z = self.xcnlin(xcn_1, det) * self.beta + self.xcnlin(xcn_2, det) * self.beta
        return self.head(z + xij, det)
