"""Predictor registry — mirrors `predictor_dict` (reference model.py:3718-3730).

| key | reference class                           | ocn_tpu class        |
|-----|-------------------------------------------|----------------------|
| cn1 | CNLinkPredictor                           | CN1Predictor         |
| cn2 | IncompleteCN1Predictor                    | IncompleteCNPredictor|
| cn3 | IncompleteCN1Predictorhighorder           | IncompleteCNPredictor(higher_order=True) |
| cn4 | IncompleteCN1PredictorSaveMemory          | IncompleteCNPredictor (alias: the save-memory rewrite is XLA's job) |
| cn5 | CNLinkPredictorOringin (OCN)              | OCNPredictor         |
| cn6 | CNLinkPredictor3hopCNs                    | OCN3HopPredictor     |
| cn7 | CNLinkPredictorbaselearn (OCNP)           | OCNPPredictor        |
| cn8 | CNLinkPredictorbaselearnablation          | OCNPPredictor(normalize_cn1=False) |
| cn9 | CNLinkPredictorbaselearnablationwithoutx  | CN9Predictor         |

`build_predictor` maps CLI-style kwargs onto the right class.  Each entry
declares whether the predictor consumes prebuilt CN frames (cn1/5/6/7/8/9) or
builds its own from (graph, tar_ei) like the incomplete family — the same
split as the reference's two `multidomainforward` signatures
(model.py:2252-2259 vs model.py:888-895).
"""
from __future__ import annotations

from typing import Any, Dict

from ocn_tpu.nn.predictors.cn_incomplete import IncompleteCNPredictor
from ocn_tpu.nn.predictors.cn_ortho import CN1Predictor, OCNPredictor
from ocn_tpu.nn.predictors.cn_poly import CN9Predictor, OCNPPredictor

PREDICTOR_NAMES = ("cn1", "cn2", "cn3", "cn4", "cn5", "cn6", "cn7", "cn8", "cn9")

# predictors that take prebuilt (cn1, cn2[, cn3]) frames from the driver
FRAME_BASED = {"cn1", "cn5", "cn6", "cn7", "cn8", "cn9"}
# predictors that need 3-hop frames as well
THREE_HOP = {"cn6"}
# predictors that build everything internally from (g, tar_ei)
SELF_BUILDING = {"cn2", "cn3", "cn4"}


def build_predictor(name: str, hidden: int, n_nodes: int, **kw: Any):
    """Instantiate a predictor module from CLI-style kwargs.

    Accepted kwargs follow the reference flag surface (§2.6 of SURVEY.md):
    dropout (predp), edrop (preedp), ln (lnnn), cndeg, use_xlin, tailact,
    twolayerlin, beta, and for the incomplete family: depth, probscale,
    proboffset, pt, learnpt, trndeg, tstdeg, alpha; for the poly family:
    sum (empty_fill), polyfirst, polysecond; frame width k.
    """
    common = dict(
        hidden=hidden,
        out=kw.get("out", 1),
        dropout=kw.get("dropout", 0.3),
        edrop=kw.get("edrop", 0.0),
        ln=kw.get("ln", False),
        cndeg=kw.get("cndeg", -1),
        use_xlin=kw.get("use_xlin", False),
        tailact=kw.get("tailact", False),
        twolayerlin=kw.get("twolayerlin", False),
        beta_init=kw.get("beta", 1.0),
    )
    if name == "cn5":
        return OCNPredictor(**common)
    if name == "cn1":
        return CN1Predictor(n_nodes=n_nodes, **common)
    if name in ("cn7", "cn8"):
        return OCNPPredictor(
            empty_fill=kw.get("sum", 1.0),
            poly_first=kw.get("polyfirst", 0),
            poly_second=kw.get("polysecond", 0),
            normalize_cn1=(name == "cn7"),
            **common,
        )
    if name == "cn9":
        return CN9Predictor(
            n_nodes=n_nodes,
            empty_fill=kw.get("sum", 1.0),
            poly_first=kw.get("polyfirst", 0),
            poly_second=kw.get("polysecond", 0),
            **common,
        )
    if name in ("cn2", "cn3", "cn4"):
        return IncompleteCNPredictor(
            higher_order=(name == "cn3"),
            alpha_init=kw.get("alpha", 1.0),
            scale=kw.get("probscale", 5.0),
            offset=kw.get("proboffset", 3.0),
            trainresdeg=kw.get("trndeg", 8) if kw.get("trndeg", -1) > 0 else 8,
            testresdeg=kw.get("tstdeg", 128) if kw.get("tstdeg", -1) > 0 else 128,
            pt=kw.get("pt", 0.5),
            learnablept=kw.get("learnpt", False),
            depth=kw.get("depth", 1),
            k=kw.get("k", 32),
            rec_k=kw.get("rec_k", 0),
            recursion_train_mode=kw.get("recursion_train_mode", True),
            lane_drop=kw.get("lane_dropadj", True),
            **common,
        )
    if name == "cn6":
        from ocn_tpu.nn.predictors.cn_3hop import OCN3HopPredictor

        return OCN3HopPredictor(**common)
    raise KeyError(f"unknown predictor {name!r}; choose from {PREDICTOR_NAMES}")
