"""Parity of the full cn5 forward against a dense PyTorch oracle.

BASELINE.md requires per-layer `allclose` against the reference math.  The
oracle below re-derives reference model.py:2252-2440 with *dense* torch
tensors (no torch_sparse in this image) and runs the same MLPs with weights
copied from the flax module, eval mode (dropout off), so any deviation in the
normalization / Gram-Schmidt / aggregation / head wiring shows up.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ocn_tpu.nn.predictors.cn_ortho import OCNPredictor
from ocn_tpu.ops.frame import cn_frames
from tests.test_frame import frame_to_dense, random_graph


def torch_mlp_from_flax(params, names, ln=False):
    """Build [Linear, (LayerNorm)] list from flax Dense_i / LayerNorm_i."""
    layers = {}
    for name, p in params.items():
        if name.startswith("Dense"):
            lin = torch.nn.Linear(*np.asarray(p["kernel"]).shape)
            with torch.no_grad():
                lin.weight.copy_(torch.tensor(np.asarray(p["kernel"]).T))
                lin.bias.copy_(torch.tensor(np.asarray(p["bias"])))
            layers[name] = lin
        elif name.startswith("LayerNorm"):
            n = np.asarray(p["scale"]).shape[0]
            m = torch.nn.LayerNorm(n, eps=1e-5)
            with torch.no_grad():
                m.weight.copy_(torch.tensor(np.asarray(p["scale"])))
                m.bias.copy_(torch.tensor(np.asarray(p["bias"])))
            layers[name] = m
    return layers


def run_cnagg(layers, x, ln):
    x = torch.relu(layers["Dense_0"](x))
    x = layers["Dense_1"](x)
    if ln:
        x = layers["LayerNorm_0"](x)
    x = torch.relu(x)
    return layers["Dense_2"](x)


def run_xij(layers, x, ln, tailact):
    x = layers["Dense_0"](x)
    if ln:
        x = layers["LayerNorm_0"](x)
    x = torch.relu(x)
    return x if tailact else layers["Dense_1"](x)


def run_head(layers, x, ln, twolayer):
    x = layers["Dense_0"](x)
    if ln:
        x = layers["LayerNorm_0"](x)
    x = torch.relu(x)
    if twolayer:
        x = layers["Dense_1"](x)
        if ln:
            x = layers["LayerNorm_1"](x)
        x = torch.relu(x)
        return layers["Dense_2"](x)
    return layers["Dense_1"](x)


@pytest.mark.parametrize("ln,tailact,twolayer", [(False, False, False), (True, True, True)])
def test_cn5_forward_parity(rng, ln, tailact, twolayer):
    g, dense = random_graph(rng, n=40, p=0.2)
    h = rng.standard_normal((g.n_nodes, 16)).astype(np.float32)
    edges = rng.integers(0, g.n_nodes, size=(2, 12))
    cn1, cn2 = cn_frames(g, jnp.asarray(edges), k=g.n_nodes)

    model = OCNPredictor(hidden=16, ln=ln, tailact=tailact, twolayerlin=twolayer)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(h), g, cn1, cn2, jnp.asarray(edges), False,
    )
    # non-trivial stored EMA so the Gram-Schmidt projection actually fires
    variables = dict(variables)
    variables["ema"] = {"innerprod": jnp.asarray(0.7), "n": jnp.asarray(3, jnp.int32)}
    got = np.asarray(
        model.apply(variables, jnp.asarray(h), g, cn1, cn2, jnp.asarray(edges), False)
    ).reshape(-1)

    # ---- dense torch oracle of reference model.py:2252-2440 (eval mode) ----
    d1 = torch.tensor(frame_to_dense(cn1), dtype=torch.float32)
    d2 = torch.tensor(frame_to_dense(cn2), dtype=torch.float32)
    ht = torch.tensor(h)

    col_sum = d1.sum(0)
    col_sum = torch.where(col_sum == 0, torch.ones_like(col_sum), col_sum)
    inv = 1.0 / col_sum
    inv = torch.where(col_sum != 1, inv, torch.zeros_like(inv))
    nd1 = d1 * inv

    inner = torch.tensor(0.7)  # eval: the stored EMA buffer value
    scale = nd1.abs().max()
    nip = inner / scale if float(scale) > 0 else inner
    od2 = d2 - nip * nd1
    cs2 = od2.sum(0)
    od2 = od2 / torch.where(cs2 == 0, torch.ones_like(cs2), cs2)

    xcn1 = nd1 @ ht
    xcn2 = od2 @ ht

    p = variables["params"]
    amlp1 = torch_mlp_from_flax(p["CNAggMLP_0"], None, ln)
    amlp2 = torch_mlp_from_flax(p["CNAggMLP_1"], None, ln)
    xmlp = torch_mlp_from_flax(p["XijMLP_0"], None, ln)
    hmlp = torch_mlp_from_flax(p["HeadMLP_0"], None, ln)
    beta = float(np.asarray(p["beta"])[0])
    alpha = torch.sigmoid(torch.tensor(np.asarray(p["alpha"]))).cumprod(-1)

    xij = run_xij(xmlp, ht[edges[0]] * ht[edges[1]], ln, tailact)
    a1 = run_cnagg(amlp1, xcn1, ln)
    a2 = run_cnagg(amlp2, xcn2, ln)
    want = run_head(
        hmlp, alpha[0] * a1 + alpha[1] * a2 + beta * xij, ln, twolayer
    ).detach().numpy().reshape(-1)

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cn7_forward_parity(rng):
    """cn7/OCNP forward vs dense torch oracle (reference model.py:3102-3226):
    quirk-normalized cn1 (fill=args.sum), identity Chebyshev basis, *raw* cn2
    (its normalization computed-then-discarded)."""
    from ocn_tpu.nn.predictors.cn_poly import OCNPPredictor

    g, dense = random_graph(rng, n=35, p=0.2)
    h = rng.standard_normal((g.n_nodes, 16)).astype(np.float32)
    edges = rng.integers(0, g.n_nodes, size=(2, 10))
    cn1, cn2 = cn_frames(g, jnp.asarray(edges), k=g.n_nodes)
    empty_fill = 0.7

    model = OCNPPredictor(hidden=16, empty_fill=empty_fill)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(h), g, cn1, cn2, jnp.asarray(edges), False,
    )
    got = np.asarray(model.apply(
        variables, jnp.asarray(h), g, cn1, cn2, jnp.asarray(edges), False
    )).reshape(-1)

    d1 = torch.tensor(frame_to_dense(cn1), dtype=torch.float32)
    d2 = torch.tensor(frame_to_dense(cn2), dtype=torch.float32)
    ht = torch.tensor(h)
    cs = d1.sum(0)
    cs = torch.where(cs == 0, torch.ones_like(cs), cs)
    inv = torch.where(cs != 1, 1.0 / cs, torch.full_like(cs, empty_fill))
    nd1 = d1 * inv  # basis T0 == identity diag
    xcn1 = nd1 @ ht
    xcn2 = d2 @ ht  # raw cn2 (normalization discarded, model.py:3180-3189)

    p = variables["params"]
    amlp1 = torch_mlp_from_flax(p["CNAggMLP_0"], None, False)
    amlp2 = torch_mlp_from_flax(p["CNAggMLP_1"], None, False)
    xmlp = torch_mlp_from_flax(p["XijMLP_0"], None, False)
    hmlp = torch_mlp_from_flax(p["HeadMLP_0"], None, False)
    beta = float(np.asarray(p["beta"])[0])
    alpha = torch.sigmoid(torch.tensor(np.asarray(p["alpha"]))).cumprod(-1)
    xij = run_xij(xmlp, ht[edges[0]] * ht[edges[1]], False, False)
    a1 = run_cnagg(amlp1, xcn1, False)
    a2 = run_cnagg(amlp2, xcn2, False)
    want = run_head(
        hmlp, alpha[0] * a1 + alpha[1] * a2 + beta * xij, False, False
    ).detach().numpy().reshape(-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_encoder_puregcn_parity(rng):
    """Full GCNEncoder (puregcn, 2 layers, residual) vs dense torch oracle
    with copied input-Linear weights (reference GCN forward, model.py:308-323)."""
    from ocn_tpu.nn.encoder import GCNEncoder

    g, dense = random_graph(rng, n=30, p=0.2)
    x = rng.standard_normal((g.n_nodes, 12)).astype(np.float32)
    enc = GCNEncoder(hidden=16, num_layers=2, dropout=0.0, res=True,
                     conv_fn="puregcn", xdropout=0.0, taildropout=0.0)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), g, False,
    )
    got = np.asarray(enc.apply(variables, jnp.asarray(x), g, False))

    p = variables["params"]["Dense_0"]
    w = np.asarray(p["kernel"])
    b = np.asarray(p["bias"])
    ht = torch.tensor(x) @ torch.tensor(w) + torch.tensor(b)
    norm = 1.0 / np.sqrt(1 + dense.sum(1, keepdims=True))
    dn = torch.tensor(dense, dtype=torch.float32)
    nt = torch.tensor(norm, dtype=torch.float32)
    for _ in range(2):
        xn = nt * ht
        conv = nt * (dn @ xn + xn)
        ht = conv + ht  # residual (dims match)
    np.testing.assert_allclose(got, ht.numpy(), rtol=2e-4, atol=2e-4)


def test_loss_catalog_matches_torch_formulas(rng):
    """Every PLNLP loss equals its torch re-derivation (PLNLP.py:28-86)."""
    import jax.numpy as jnp

    from ocn_tpu.train import losses as L

    pos = rng.standard_normal(12).astype(np.float32)
    neg = rng.standard_normal(12).astype(np.float32)
    pt, nt = torch.tensor(pos).reshape(-1, 1), torch.tensor(neg).reshape(-1, 1)
    want = {
        "auc_loss": torch.square(1 - (pt - nt)).sum(),
        "hinge_auc_loss": torch.square(torch.clamp(1 - (pt - nt), min=0)).sum(),
        "weighted_auc_loss": (2.0 * torch.square(1 - (pt - nt))).sum(),
        "adaptive_auc_loss": torch.square(0.5 - (pt - nt)).sum(),
        "weighted_hinge_auc_loss": (2.0 * torch.square(
            torch.clamp(2.0 - (pt - nt), min=0))).sum(),
        "adaptive_hinge_auc_loss": torch.square(
            torch.clamp(2.0 - (pt - nt), min=0)).sum(),
        "log_rank_loss": -torch.log(torch.sigmoid(pt - nt) + 1e-15).mean(),
        "ce_loss": (-torch.log(torch.sigmoid(pt) + 1e-15).mean()
                    - torch.log(1 - torch.sigmoid(nt) + 1e-15).mean()),
        "info_nce_loss": -torch.log(
            torch.exp(pt) / (torch.exp(pt) + torch.exp(nt)) + 1e-15).mean(),
        "simple": (-torch.nn.functional.logsigmoid(pt).mean()
                   - torch.nn.functional.logsigmoid(-nt).mean()),
    }
    jp, jn = jnp.asarray(pos), jnp.asarray(neg)
    for name, w in want.items():
        got = float(L.LOSSES[name](jp, jn, num_neg=1, weight=2.0, margin=0.5))
        np.testing.assert_allclose(got, float(w), rtol=1e-5, err_msg=name)
