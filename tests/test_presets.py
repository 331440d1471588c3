"""Preset fidelity pins (VERDICT round-3 item 1).

One frozen dict per reference README command (/root/reference/README.md:24-98
— 7 OCN + 7 OCNP commands), transcribed directly from the README text, NOT
derived from config.py.  For every command we assert that
``presets(dataset, predictor)`` reproduces the reference's *entire* flag
surface field-for-field: the flags the command pins take the frozen values,
and every other reference flag takes the reference argparse default
(NeighborOverlap_large.py:183-250).

TPU-native knobs (k_small, adj2_cap, ...) must live in an explicitly separate
overlay: structural tests assert the README layer never contains an overlay
field, the overlay never contains a reference flag, and
``presets(..., tpu_overlay=False)`` differs from the default only on overlay
fields.
"""
from __future__ import annotations

import dataclasses

import pytest

from ocn_tpu import config as C
from ocn_tpu.config import Config, presets

# the reference argparse defaults (NeighborOverlap_large.py:183-250); the
# ppa/citation2 drivers (NeighborOverlap_large_ppa.py:310-377,
# NeighborOverlapCitation2.py:268-338) differ only on `--sum` default 0 and
# add `--linkbatchsize` default 8192 — irrelevant here because every README
# command for those drivers pins both explicitly.
REF_DEFAULTS = dict(
    use_valedges_as_input=False, epochs=40, runs=3, batch_size=8192,
    testbs=8192, maskinput=False, mplayers=1, nnlayers=3, hiddim=32,
    ln=False, lnnn=False, res=False, jk=False, gnndp=0.3, xdp=0.3, tdp=0.3,
    gnnedp=0.3, predp=0.3, preedp=0.3, gnnlr=0.0003, prelr=0.0003, beta=1.0,
    alpha=1.0, use_xlin=False, tailact=False, twolayerlin=False,
    increasealpha=False, splitsize=-1, probscale=5.0, proboffset=3.0, pt=0.5,
    learnpt=False, trndeg=-1, tstdeg=-1, cndeg=-1, depth=1, cnprob=0.0,
    adj2byblock=False, sum=1.0, polyfirst=0, polysecond=0,
)

# README.md:27 — Cora OCN
CORA_CN5 = dict(
    xdp=0.7, tdp=0.3, pt=0.75, gnnedp=0.0, preedp=0.4, predp=0.05,
    gnndp=0.05, probscale=4.3, proboffset=2.8, alpha=1.0, gnnlr=0.0043,
    prelr=0.0024, batch_size=1152, ln=True, lnnn=True, predictor="cn5",
    epochs=100, runs=10, model="puregcn", hiddim=256, mplayers=1,
    testbs=8192, maskinput=True, jk=True, use_xlin=True, tailact=True,
    sum=0.0,
)
# README.md:32 — Citeseer OCN
CITESEER_CN5 = dict(
    predictor="cn5", epochs=100, runs=10, batch_size=384, testbs=4096,
    use_xlin=True, maskinput=True, lnnn=True, res=True, jk=True,
    model="puremean", mplayers=3, nnlayers=1, hiddim=64, gnndp=0.12,
    xdp=0.73, tdp=0.88, gnnedp=0.07, predp=0.19, preedp=0.66, gnnlr=0.0009,
    prelr=0.00096, beta=4.36, alpha=2.48, probscale=6.19, proboffset=9.69,
    pt=0.042, cnprob=0.94, sum=27.29,
)
# README.md:37 — Pubmed OCN
PUBMED_CN5 = dict(
    xdp=0.3, tdp=0.0, pt=0.5, gnnedp=0.0, preedp=0.0, predp=0.05, gnndp=0.1,
    probscale=5.3, proboffset=0.5, alpha=0.3, gnnlr=0.0097, prelr=0.002,
    batch_size=2048, ln=True, lnnn=True, predictor="cn5", epochs=200,
    runs=10, model="puregcn", hiddim=256, mplayers=1, testbs=8192,
    maskinput=True, jk=True, use_xlin=True, tailact=True, sum=1.0,
)
# README.md:42 — collab OCN
COLLAB_CN5 = dict(
    use_valedges_as_input=True, epochs=200, runs=10, batch_size=65536,
    testbs=65536, maskinput=True, mplayers=1, nnlayers=3, hiddim=256,
    ln=True, lnnn=True, jk=True, gnndp=0.05, xdp=0.7, tdp=0.3, gnnedp=0.0,
    predp=0.05, preedp=0.4, gnnlr=0.0043, prelr=0.0024, beta=1.0, alpha=1.0,
    use_xlin=True, tailact=True, probscale=4.3, proboffset=2.8, pt=0.75,
    predictor="cn5", depth=1, model="gin",
)
# README.md:47 — ppa OCN (NeighborOverlap_large_ppa.py driver)
PPA_CN5 = dict(
    sum=0.0, epochs=20, runs=10, batch_size=16384, linkbatchsize=2048,
    testbs=2048, maskinput=True, mplayers=1, nnlayers=3, hiddim=64, ln=True,
    lnnn=True, jk=True, gnndp=0.0, xdp=0.0, tdp=0.0, gnnedp=0.0, predp=0.0,
    preedp=0.0, gnnlr=0.0013, prelr=0.0013, beta=1.0, alpha=1.0,
    use_xlin=True, tailact=True, probscale=4.3, proboffset=2.8, pt=0.75,
    predictor="cn5", depth=1, model="gcn", cnprob=0.0,
)
# README.md:53 — citation2 OCN (NeighborOverlapCitation2.py driver)
CITATION2_CN5 = dict(
    predictor="cn5", epochs=20, runs=10, batch_size=16384, testbs=2048,
    linkbatchsize=2048, use_xlin=True, ln=True, res=True, jk=True,
    tailact=True, model="gcn", mplayers=5, nnlayers=3, hiddim=32, depth=3,
    gnndp=0.28, xdp=0.5, tdp=0.28, gnnedp=0.20, predp=0.10, preedp=0.12,
    gnnlr=0.00023, prelr=0.0008, beta=0.23, alpha=1.33, probscale=2.64,
    proboffset=4.5, pt=0.34, cnprob=0.78, sum=1.0,
)
# README.md:59 — ddi OCN.  The README's `--alpha 7.18--probscale 4.31` typo
# (argparse would reject the literal command) is resolved as alpha=7.18,
# probscale=4.31 (SURVEY.md §5 known defects).
DDI_CN5 = dict(
    predictor="cn5", epochs=100, runs=10, batch_size=32768, testbs=32768,
    use_xlin=True, adj2byblock=True, maskinput=True, lnnn=True, res=True,
    learnpt=True, model="puregcn", mplayers=3, nnlayers=3, hiddim=64,
    gnndp=0.25, xdp=0.13, tdp=0.38, gnnedp=0.51, predp=0.10, preedp=0.13,
    gnnlr=0.0009, prelr=0.00083, beta=0.33, alpha=7.18, probscale=4.31,
    proboffset=4.11, pt=0.73, cnprob=0.93, sum=2.74,
)
# README.md:66 — Cora OCNP: Cora OCN flags with cn7, batch 1024, 200 epochs
CORA_CN7 = {**CORA_CN5, "predictor": "cn7", "batch_size": 1024, "epochs": 200}
# README.md:71/:76/:86/:92/:98 — OCNP commands identical to the OCN command
CITESEER_CN7 = {**CITESEER_CN5, "predictor": "cn7"}
PUBMED_CN7 = {**PUBMED_CN5, "predictor": "cn7"}
# README.md:81 — collab OCNP (own flag set: no --jk, has --res)
COLLAB_CN7 = dict(
    xdp=0.25, tdp=0.05, pt=0.1, gnnedp=0.25, preedp=0.0, predp=0.3,
    gnndp=0.1, probscale=2.5, proboffset=6.0, alpha=1.05, gnnlr=0.0082,
    prelr=0.0037, batch_size=65536, ln=True, lnnn=True, predictor="cn7",
    epochs=100, runs=10, model="gin", hiddim=256, mplayers=1, testbs=131072,
    maskinput=True, use_valedges_as_input=True, res=True, use_xlin=True,
    tailact=True,
)
PPA_CN7 = {**PPA_CN5, "predictor": "cn7"}
CITATION2_CN7 = {**CITATION2_CN5, "predictor": "cn7"}
DDI_CN7 = {**DDI_CN5, "predictor": "cn7"}

COMMANDS = {
    ("Cora", "cn5"): CORA_CN5,
    ("Citeseer", "cn5"): CITESEER_CN5,
    ("Pubmed", "cn5"): PUBMED_CN5,
    ("collab", "cn5"): COLLAB_CN5,
    ("ppa", "cn5"): PPA_CN5,
    ("citation2", "cn5"): CITATION2_CN5,
    ("ddi", "cn5"): DDI_CN5,
    ("Cora", "cn7"): CORA_CN7,
    ("Citeseer", "cn7"): CITESEER_CN7,
    ("Pubmed", "cn7"): PUBMED_CN7,
    ("collab", "cn7"): COLLAB_CN7,
    ("ppa", "cn7"): PPA_CN7,
    ("citation2", "cn7"): CITATION2_CN7,
    ("ddi", "cn7"): DDI_CN7,
}


@pytest.mark.parametrize("key", sorted(COMMANDS), ids="-".join)
def test_readme_command_field_for_field(key):
    dataset, predictor = key
    expected = {**REF_DEFAULTS, **COMMANDS[key]}
    cfg = presets(dataset, predictor)
    assert cfg.dataset == dataset
    mismatches = {
        f: (getattr(cfg, f), want)
        for f, want in expected.items()
        if getattr(cfg, f) != want
    }
    assert not mismatches, (
        f"{key}: preset diverges from the README command on "
        f"{{field: (got, want)}} = {mismatches}")
    # linkbatchsize is a reference flag only for the pygho drivers; the
    # large-driver commands leave it at the TPU auto value (-1)
    if "linkbatchsize" in COMMANDS[key]:
        assert cfg.linkbatchsize == COMMANDS[key]["linkbatchsize"]


def test_driver_stack_fidelity():
    """ppa/citation2 commands run the reference's pygho drivers: GCN2/GCN3
    encoder stack, path-count cn2 values, citation2's randint-target
    negatives (NeighborOverlapCitation2.py:181-182)."""
    for predictor in ("cn5", "cn7"):
        ppa = presets("ppa", predictor)
        assert ppa.encoder_stack == "ho" and ppa.cn2_counts
        assert ppa.neg_mode == "uniform"
        c2 = presets("citation2", predictor)
        assert c2.encoder_stack == "ho" and c2.cn2_counts
        assert c2.neg_mode == "randint_target"
    for key, want_stack in ((("Cora", "cn5"), "ts"),
                            (("collab", "cn7"), "ts"),
                            (("ddi", "cn5"), "ts")):
        assert presets(*key).encoder_stack == want_stack
    spd = presets("citation2", "spd")
    assert spd.predictor == "cn5" and spd.exact_two_hop
    assert spd.neg_mode == "randint_target"
    pl = presets("collab", "plnlp")
    assert pl.predictor == "cn5" and pl.losstrick == "auc_loss"


def test_overlay_separation_structural():
    """README layer holds only reference flags; TPU overlay holds only
    TPU-native fields (allowlist); driver overlay holds only stack fields."""
    # model/predictor have no argparse default (choices-only); losstrick is
    # the PLNLP driver's flag (PLNLP.py:351)
    ref_fields = set(REF_DEFAULTS) | {"linkbatchsize", "predictor",
                                      "dataset", "losstrick", "model"}
    for key, d in C._README_PRESETS.items():
        bad = set(d) - ref_fields
        assert not bad, f"{key}: non-reference fields in README layer: {bad}"
        assert not set(d) & C._TPU_OVERLAY_FIELDS, key
    for key, d in C._TPU_OVERLAYS.items():
        bad = set(d) - C._TPU_OVERLAY_FIELDS
        assert not bad, f"{key}: reference flags hiding in TPU overlay: {bad}"
    driver_fields = {"encoder_stack", "cn2_counts", "neg_mode",
                     "exact_two_hop"}
    for key, d in C._DRIVER_OVERLAYS.items():
        bad = set(d) - driver_fields
        assert not bad, f"{key}: non-stack fields in driver overlay: {bad}"


@pytest.mark.parametrize("key", sorted(COMMANDS), ids="-".join)
def test_tpu_overlay_strippable(key):
    """presets(tpu_overlay=False) differs from the default preset only on
    TPU-overlay fields."""
    with_ov = dataclasses.asdict(presets(*key))
    without = dataclasses.asdict(presets(*key, tpu_overlay=False))
    diff = {f for f in with_ov if with_ov[f] != without[f]}
    assert diff <= C._TPU_OVERLAY_FIELDS, diff
    # and the stripped config's overlay fields sit at Config defaults
    base = Config()
    for f in C._TPU_OVERLAY_FIELDS:
        assert without[f] == getattr(base, f), f


def test_all_fourteen_commands_have_presets():
    assert set(COMMANDS) <= set(C._README_PRESETS)


@pytest.mark.parametrize("key", sorted(set(C._README_PRESETS)), ids="-".join)
def test_preset_constructs_and_steps(key):
    """Every preset (14 README commands + 2 driver aliases) must construct a
    Trainer on its stand-in graph and take one finite training step at tiny
    scale — integration smoke over the full flag surface (learnpt,
    twolayerlin, puremean/gin encoders, ho stack, randint negatives, SPD)."""
    import jax
    import numpy as np

    from ocn_tpu.data.loaders import loaddataset
    from ocn_tpu.sparse import build as B
    from ocn_tpu.train.loop import Trainer

    dataset, predictor = key
    # one explicit step, not train_epoch: the large stand-ins have 10^5+
    # train edges per epoch and the smoke only needs construction + a
    # compiled step (the full matrix at train_epoch granularity measured
    # 56 min on this 2-core host)
    scale = {"citation2": 0.004, "ppa": 0.01, "collab": 0.02,
             "Pubmed": 0.05}.get(dataset, 0.1)
    cfg = presets(dataset, predictor,
                  batch_size=128, testbs=128, linkbatchsize=64,
                  epochs=1, runs=1, pad_deg=16, pad_deg2=16, adj2_cap=64,
                  adj3_cap=64, synthetic_scale=scale, platform="cpu")
    ds = loaddataset(dataset, use_valedges_as_input=cfg.use_valedges_as_input,
                     synthetic_scale=cfg.synthetic_scale, seed=0)
    tr = Trainer(cfg, ds)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    pos = np.asarray(ds.split_edge["train"]["edge"]).T
    neg = B.negative_sampling(ds.edge_index, ds.n_nodes, pos.shape[1], rng)
    idx = rng.permutation(pos.shape[1])[: cfg.batch_size]
    pe, ne, mp, inv_p, inv_n = tr.prepare_batch(
        pos[:, idx], neg[:, idx], idx)
    state, loss = tr.train_step(
        state, pe, ne, mp, jax.random.PRNGKey(0), inv_p, inv_n)
    assert np.isfinite(np.asarray(loss)), key
