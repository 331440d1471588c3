"""Single dataclass config replacing the reference's ~45 argparse flags
duplicated across five drivers (reference NeighborOverlap_large.py:183-250 is
the canonical list; SURVEY.md §2.6).  Field names keep the flag names so the
README commands translate 1:1; `presets()` encodes the per-dataset README
commands (README.md:24-98).
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Config:
    # data
    dataset: str = "collab"
    use_valedges_as_input: bool = False
    load: Optional[str] = None
    # schedule
    epochs: int = 40
    runs: int = 3
    batch_size: int = 8192
    testbs: int = 8192
    linkbatchsize: int = -1          # <=0: auto (micro-batch inside the jitted step)
    maskinput: bool = False
    # encoder
    model: str = "gcn"
    mplayers: int = 1
    hiddim: int = 32
    ln: bool = False
    res: bool = False
    jk: bool = False
    gnndp: float = 0.3
    gnnedp: float = 0.3
    xdp: float = 0.3
    tdp: float = 0.3
    gnnlr: float = 3e-4
    encoder_stack: str = "ts"        # "ts" (GCN) | "ho" (GCN2/GCN3 pygho stack)
    # predictor
    predictor: str = "cn5"
    nnlayers: int = 3
    lnnn: bool = False
    predp: float = 0.3
    preedp: float = 0.3
    prelr: float = 3e-4
    beta: float = 1.0
    alpha: float = 1.0
    use_xlin: bool = False
    tailact: bool = False
    twolayerlin: bool = False
    increasealpha: bool = False
    splitsize: int = -1              # parity flag; XLA scan chunking supersedes it
    # incomplete-CN family
    probscale: float = 5.0
    proboffset: float = 3.0
    pt: float = 0.5
    learnpt: bool = False
    trndeg: int = -1
    tstdeg: int = -1
    cndeg: int = -1
    depth: int = 1
    cnprob: float = 0.0
    recursion_train_mode: bool = True  # cn2/cn3/cn4: score the stop-gradient
                                     # recursion with dropouts ACTIVE in train
                                     # mode, like the reference's torch.no_grad
                                     # under module.train() (model.py:926-946);
                                     # False = eval-mode (deterministic)
                                     # recursive scoring
    # higher-order
    adj2byblock: bool = False        # parity flag; candidate-frame SDDMM replaces it
    sum: float = 1.0                 # cn7/cn8 empty-column fill (`--sum`)
    polyfirst: int = 0
    polysecond: int = 0
    # artifacts
    save_gemb: bool = False
    savex: bool = False
    loadx: bool = False
    savemod: bool = False
    loadmod: bool = False
    checkpoint_dir: Optional[str] = None
    # PLNLP
    losstrick: str = "simple"
    lossmargin: float = 0.0
    lossweight: float = 1.0
    # TPU-native knobs (no reference counterpart)
    pad_deg: int = 64                # candidate-frame width K (neighbor cap)
    pad_deg2: int = 64               # cap for dst/candidate neighbor lists (K2)
    pad_deg2_dst: int = 0            # separate cap for the dst frame N(j) in
                                     # "gather" two-hop mode (only the cn1
                                     # membership reads it there; 96% of
                                     # collab edge destinations have degree
                                     # <= 16 while A^2 rows are fat, so a
                                     # smaller dst cap removes mostly-padding
                                     # gathers/compares).  0 = use pad_deg2.
    count2_chunk: int = 4096         # edge chunk for on-the-fly A^2 counts
    two_hop_mode: str = "gather"     # "gather": precomputed row-capped A^2;
                                     # "sddmm": on-the-fly exact counts
    hoist_frames: bool = False       # build CN frames for the whole batch
                                     # outside the link scan (faster steps,
                                     # much slower XLA compile at batch 65536)
    frame_group: int = 1             # link chunks whose frames are built in
                                     # one vectorized shot per scan step
                                     # (predictor + column norms stay
                                     # per-chunk); bounded-compile middle
                                     # ground between per-chunk and hoisted
    adj2_cap: int = 1024             # A^2 row cap for the host SpGEMM
    adj3_cap: int = 256              # A^3 row cap (cn6 "gather" fast path)
    window_table: bool = False       # hoist y = stop_grad(h)[g.col] and read
                                     # frame rows as contiguous CSR window
                                     # slices via the Pallas window-DMA
                                     # kernel (one 36 KB copy per window).
                                     # The kernel microbenches 2.4x faster
                                     # than the XLA random gather (1.9 vs
                                     # 4.5 ms per 4096x64 chunk) but loses
                                     # ~8% END TO END (same-day A/B on chip:
                                     # 67.8k vs 74.0k edges/s) — the hoisted
                                     # y-table build (one E-row gather per
                                     # step) + the (B, J, H) HBM round-trip
                                     # of the kernel output eat the win — so
                                     # it is OFF by default and kept as the
                                     # opt-in hand-written reference point.
                                     # On CPU the XLA fallback is
                                     # bit-identical (tests cover it).
    cn2_counts: bool = False         # True => pygho-stack path-count values
    neg_mode: str = "uniform"        # "uniform": PyG negative_sampling non-
                                     # edges; "randint_target": keep sources,
                                     # uniform targets (citation2 driver,
                                     # NeighborOverlapCitation2.py:181-182)
    exact_two_hop: bool = False      # SPD.py exactly-distance-2 semantics
    reorder: str = "bfs"             # node relabeling for gather locality:
                                     # "bfs" (+9% measured on chip) | "none";
                                     # metrics are relabel-invariant
    k_small: int = 0                 # dual-K occupancy split: when > 0, each
                                     # training batch is sorted by source
                                     # degree (host-side, pairing restored by
                                     # inverse permutation before the loss)
                                     # and the link scan runs as TWO bodies —
                                     # low-degree chunks at frame width
                                     # k_small, the tail at pad_deg.  At K=64
                                     # the collab pos-src frames are only 29%
                                     # occupied and negative frames 8.6%
                                     # (BENCH_NOTES.md), so most frame math is
                                     # padding; k_small=16 fits 66% of pos
                                     # sources / 97% of neg sources exactly.
                                     # Edges that spill a small chunk get the
                                     # framework's standard deg/k reweighted
                                     # cap (unbiased; reference concedes caps
                                     # via cndeg, utils.py:109-143). 0 = off.
    small_frac: float = -1.0         # fraction of positive chunks in the
                                     # small body; < 0 = auto from the train-
                                     # edge source-degree distribution
    small_frac_neg: float = -1.0     # same for negative chunks; < 0 = auto
                                     # from the node-degree distribution
    k_neg: int = 0                   # separate frame width for the NEGATIVE
                                     # small body (third scan body): uniform
                                     # negatives are degree-distributed like
                                     # the node population (86% of collab
                                     # nodes have deg <= 8 vs 39% of train-
                                     # edge sources), so negatives fit a far
                                     # narrower frame than positives.
                                     # 0 = negatives share k_small's body.
    ell_tables: bool = True          # ELL window-table gathers (sparse/
                                     # ell.py): per-node neighbor windows
                                     # frozen per refresh in (N, K) row-
                                     # gatherable tables — TPU gathers are
                                     # descriptor-rate-bound, so row gathers
                                     # are ~6x cheaper than the flat window
                                     # gathers they replace (BENCH_NOTES.md
                                     # round 2).  Train path only; requires
                                     # the packed col|val layout + gather
                                     # two-hop mode.
    ell_refresh: int = 1             # rebuild the ELL window sample every
                                     # this many epochs (re-draws the capped
                                     # rows' window offsets)
    ell_eval: bool = True            # score eval splits through the same ELL
                                     # tables (uncapped rows bit-identical;
                                     # capped rows use the frozen window —
                                     # measured +42% eval throughput)
    rec_k: int = 0                   # incomplete-CN family (cn2/cn3/cn4):
                                     # frame width for the RECURSIVE scorer
                                     # (the depth-1 stop-gradient re-scoring
                                     # of B*resdeg potential edges — the
                                     # dominant cost of the family).  A
                                     # narrower width caps the recursion's
                                     # adjacency sample with the standard
                                     # deg/k reweighting — the same estimator
                                     # family as the reference's trndeg/
                                     # tstdeg/cndeg caps (utils.py:109-143).
                                     # 0 = full pad_deg width (exact
                                     # reference semantics).
    dual_k_eval: bool = True         # score eval splits with the dual-K
                                     # split too (k_small > 0): each split is
                                     # degree-sorted once, full testbs batches
                                     # of deg<=k_small sources score at frame
                                     # width k_small (no extra capping — only
                                     # exact-fit edges go small; the boundary
                                     # remainder rides the big body), scores
                                     # inverse-permuted back.  Pairing-free
                                     # at eval (scores only).  Batch
                                     # composition changes like any batch
                                     # permutation (PARITY.md §6).
    eval_sampling: bool = True       # sample degree-capped rows randomly at
                                     # eval time too (the reference's
                                     # sparsesample_reweight is random in
                                     # train AND eval, utils.py:109-143); the
                                     # key is a fixed fold of the chunk
                                     # offset, so eval stays deterministic
                                     # across calls.  False = deterministic
                                     # first-k window (biased when rows
                                     # exceed pad_deg; only exact when
                                     # pad_deg >= max degree).
    sort_batch: bool = False         # sort each training batch by source id
                                     # (pairing-preserving); measured neutral
                                     # on chip (87.1k vs 87.2k edges/s) - the
                                     # K=64 windows already give intra-row
                                     # contiguity - so off by default
    dtype: str = "float32"           # "bfloat16" for MXU-friendly training
    platform: str = ""               # "" = default backend; "cpu" forces CPU
    profile_dir: str = ""            # write a jax.profiler trace of epoch 1
                                     # here (open with xprof/tensorboard)
    seed: int = 0
    data_root: str = "dataset"
    synthetic_scale: float = 1.0
    dp_devices: int = 1              # data-parallel mesh size (edge-batch DP)
    graph_sharding: str = "replicated"  # "node": shard adjacency, A^2 and
                                     # features over the dp axis with halo-
                                     # exchange SpMM + owner-gather CN frames
                                     # (parallel/sharded_graph.py); >HBM
                                     # graphs.  "replicated": GSPMD mesh path
    tp_devices: int = 1              # tensor-parallel mesh size (hidden shard)

    def predictor_kwargs(self) -> dict:
        return dict(
            dropout=self.predp, edrop=self.preedp, ln=self.lnnn,
            cndeg=self.cndeg, use_xlin=self.use_xlin, tailact=self.tailact,
            twolayerlin=self.twolayerlin, beta=self.beta, alpha=self.alpha,
            probscale=self.probscale, proboffset=self.proboffset, pt=self.pt,
            learnpt=self.learnpt, trndeg=self.trndeg, tstdeg=self.tstdeg,
            depth=self.depth, sum=self.sum, polyfirst=self.polyfirst,
            polysecond=self.polysecond, k=self.pad_deg, rec_k=self.rec_k,
            recursion_train_mode=self.recursion_train_mode,
        )


# per-dataset presets replicating the README commands (README.md:24-98)
_PRESETS = {
    # README.md:27 — Cora OCN
    ("Cora", "cn5"): dict(
        mplayers=1, hiddim=256, ln=True, lnnn=True, res=True, maskinput=True,
        jk=True, gnndp=0.05, xdp=0.7, tdp=0.3, gnnedp=0.0, predp=0.05,
        preedp=0.4, gnnlr=0.0043, prelr=0.0024, batch_size=1152,
        model="puregcn", predictor="cn5", testbs=8192, epochs=100, runs=10,
    ),
    # README.md:31 — Citeseer OCN
    ("Citeseer", "cn5"): dict(
        mplayers=1, hiddim=256, ln=True, lnnn=True, res=True, maskinput=True,
        jk=True, gnndp=0.5, xdp=0.7, tdp=0.3, gnnedp=0.0, predp=0.05,
        preedp=0.4, gnnlr=0.0085, prelr=0.0078, batch_size=384,
        model="puregcn", predictor="cn5", testbs=4096, epochs=100, runs=10,
    ),
    # README.md:35 — Pubmed OCN
    ("Pubmed", "cn5"): dict(
        mplayers=1, hiddim=256, ln=True, lnnn=True, res=True, maskinput=True,
        gnndp=0.13, xdp=0.41, tdp=0.0, gnnedp=0.0, predp=0.10, preedp=0.4,
        gnnlr=0.0097, prelr=0.0029, batch_size=2048, model="puregcn",
        predictor="cn5", testbs=8192, epochs=100, runs=10,
    ),
    # README.md:41 — collab OCN
    ("collab", "cn5"): dict(
        predictor="cn5", dataset="collab", epochs=100, runs=10, hiddim=256,
        mplayers=3, gnndp=0.25, ln=True, model="gcn", testbs=131072,
        maskinput=True, jk=True, use_valedges_as_input=True, res=True,
        use_xlin=True, tailact=True, batch_size=65536, gnnlr=0.001,
        prelr=0.001, predp=0.3, preedp=0.3, xdp=0.25, tdp=0.05, gnnedp=0.25,
        # dual-K occupancy split: +54% edges/s, Hits@K within noise
        # (results/parity_sbm.jsonl lb256 A/B; BENCH_NOTES.md round-1 3rd cont.)
        k_small=16,
    ),
    # README.md:47 — ppa OCN
    ("ppa", "cn5"): dict(
        predictor="cn5", dataset="ppa", epochs=40, runs=10, hiddim=64,
        mplayers=1, gnndp=0.1, model="gcn", maskinput=True, use_xlin=True,
        tailact=True, batch_size=16384, testbs=8192, gnnlr=0.001, prelr=0.001,
        predp=0.1, preedp=0.0, xdp=0.1, tdp=0.1, gnnedp=0.1, probscale=4.3,
        proboffset=2.8, alpha=1.0, encoder_stack="ho", linkbatchsize=512,
        cn2_counts=True,
        # memory plan for N=576k / E~60M directed (VERDICT r2 item 2): the
        # A^2 window table is the largest per-graph array — cap 1024 on a
        # degree-100 graph costs ~2.4 GB packed and starves the blocked SpMM;
        # cap 256 fits (accuracy sensitivity rows: results/parity_deg100,
        # BASELINE.md).  The (E, H) SpMM message tensor is bounded by the
        # edge-blocked path in ops/spmm.py automatically.
        adj2_cap=256,
        # dual-K occupancy split: +54% edges/s, Hits@K within noise
        # (results/parity_sbm.jsonl lb256 A/B; BENCH_NOTES.md round-1 3rd cont.)
        k_small=16,
    ),
    # README.md:53 — citation2 OCN
    ("citation2", "cn5"): dict(
        predictor="cn5", dataset="citation2", epochs=20, runs=10, hiddim=64,
        mplayers=3, gnndp=0.3, model="puregcn", maskinput=True,
        batch_size=32768, linkbatchsize=2048, testbs=8192, gnnlr=0.001,
        prelr=0.001, predp=0.3, preedp=0.3, encoder_stack="ho",
        cn2_counts=True, neg_mode="randint_target",
    ),
    # README.md:59 — ddi OCN (the README's `--alpha 7.18--probscale` typo is
    # resolved as alpha=7.18, probscale left default; SURVEY.md §5 defects)
    ("ddi", "cn5"): dict(
        predictor="cn5", dataset="ddi", epochs=100, runs=10, hiddim=224,
        mplayers=3, gnndp=0.05, ln=True, model="puresum", testbs=24576,
        maskinput=True, use_xlin=True, twolayerlin=True, res=True,
        batch_size=24576, gnnlr=0.0021, prelr=0.0013, predp=0.05, preedp=0.05,
        xdp=0.05, tdp=0.05, gnnedp=0.05, alpha=7.18, adj2byblock=True,
    ),
    # README.md:66-98 — OCNP (cn7) variants
    ("Cora", "cn7"): dict(
        mplayers=1, hiddim=256, ln=True, lnnn=True, res=True, maskinput=True,
        jk=True, gnndp=0.05, xdp=0.7, tdp=0.3, gnnedp=0.0, predp=0.05,
        preedp=0.4, gnnlr=0.0043, prelr=0.0024, batch_size=1152,
        model="puregcn", predictor="cn7", testbs=8192, epochs=100, runs=10,
    ),
    ("Citeseer", "cn7"): dict(
        mplayers=3, hiddim=256, ln=True, lnnn=True, res=True, maskinput=True,
        jk=True, gnndp=0.5, xdp=0.7, tdp=0.3, gnnedp=0.0, predp=0.05,
        preedp=0.4, gnnlr=0.0085, prelr=0.0078, batch_size=384,
        model="puremean", predictor="cn7", testbs=4096, epochs=100, runs=10,
    ),
    # SPD.py equivalent: citation2 with exactly-distance-2 cn2 (SPD.py:65-95)
    ("citation2", "spd"): dict(
        predictor="cn5", dataset="citation2", epochs=20, runs=10, hiddim=64,
        mplayers=3, gnndp=0.3, model="puregcn", maskinput=True,
        batch_size=32768, linkbatchsize=2048, testbs=8192, gnnlr=0.001,
        prelr=0.001, predp=0.3, preedp=0.3, encoder_stack="ho",
        cn2_counts=True, exact_two_hop=True, two_hop_mode="sddmm",
        neg_mode="randint_target",
    ),
    # PLNLP.py equivalent: collab with a ranking loss (PLNLP.py:155-191)
    ("collab", "plnlp"): dict(
        predictor="cn5", dataset="collab", epochs=100, runs=10, hiddim=256,
        mplayers=3, gnndp=0.25, ln=True, model="gcn", testbs=131072,
        maskinput=True, jk=True, use_valedges_as_input=True, res=True,
        use_xlin=True, tailact=True, batch_size=65536, gnnlr=0.001,
        prelr=0.001, predp=0.3, preedp=0.3, xdp=0.25, tdp=0.05, gnnedp=0.25,
        # dual-K occupancy split: +54% edges/s, Hits@K within noise
        # (results/parity_sbm.jsonl lb256 A/B; BENCH_NOTES.md round-1 3rd cont.)
        k_small=16,
        losstrick="auc_loss",
    ),
    ("collab", "cn7"): dict(
        predictor="cn7", dataset="collab", epochs=100, runs=10, hiddim=256,
        mplayers=3, gnndp=0.25, ln=True, model="gin", testbs=131072,
        maskinput=True, use_valedges_as_input=True, res=True, use_xlin=True,
        tailact=True, batch_size=65536, gnnlr=0.001, prelr=0.001, predp=0.3,
        preedp=0.3, xdp=0.25, tdp=0.05, gnnedp=0.25, jk=True,
        # dual-K occupancy split: +54% edges/s, Hits@K within noise
        # (results/parity_sbm.jsonl lb256 A/B; BENCH_NOTES.md round-1 3rd cont.)
        k_small=16,
    ),
}


def presets(dataset: str, predictor: str = "cn5", **overrides) -> Config:
    """Look up the README preset for (dataset, predictor).

    ``predictor`` may also be a driver alias ("spd", "plnlp") whose preset
    pins its own real predictor key.
    """
    base = dict(_PRESETS.get((dataset, predictor), {}))
    base.setdefault("dataset", dataset)
    if "predictor" not in base:
        base["predictor"] = predictor
    base["dataset"] = dataset
    base.update(overrides)
    return Config(**base)
