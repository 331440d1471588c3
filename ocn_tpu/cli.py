"""Unified CLI — replaces the reference's five copy-pasted argparse drivers
(NeighborOverlap_large.py / _ppa / Citation2 / PLNLP.py / SPD.py; SURVEY.md
§2.5-2.6).  One flag surface, per-dataset presets, all predictors, all losses.

Examples (mirroring README.md:27 and :41):
    python -m ocn_tpu.cli --dataset Cora --predictor cn5 --preset
    python -m ocn_tpu.cli --dataset collab --predictor cn5 --preset --epochs 3

Run `python -m ocn_tpu.cli --help` for every flag.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Optional

import numpy as np

from ocn_tpu.config import Config, presets
from ocn_tpu.data.loaders import loaddataset
from ocn_tpu.nn.conv import CONV_NAMES
from ocn_tpu.nn.predictors import PREDICTOR_NAMES
from ocn_tpu.train.loop import Trainer
from ocn_tpu.train.losses import LOSSES
from ocn_tpu.utils.logging import MetricLogger


def parseargs(argv=None) -> Config:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", action="store_true",
                   help="start from the README preset for (dataset, predictor)")
    defaults = Config()
    for f in dataclasses.fields(Config):
        name = f.name
        if f.type == "bool" or isinstance(f.default, bool):
            # BooleanOptionalAction gives --X / --no-X so preset-True
            # booleans (e.g. collab maskinput) can be disabled from the
            # command line — the reference's store_true flags could not
            p.add_argument(f"--{name}", action=argparse.BooleanOptionalAction,
                           default=None)
        elif name == "model":
            p.add_argument("--model", choices=CONV_NAMES, default=None)
        elif name == "predictor":
            p.add_argument("--predictor", choices=PREDICTOR_NAMES, default=None)
        elif name == "losstrick":
            p.add_argument("--losstrick", choices=sorted(LOSSES), default=None)
        else:
            typ = type(f.default) if f.default is not None else str
            p.add_argument(f"--{name}", type=typ, default=None)
    args = p.parse_args(argv)
    overrides = {
        k: v for k, v in vars(args).items() if k != "preset" and v is not None
    }
    if args.preset:
        return presets(
            overrides.pop("dataset", defaults.dataset),
            overrides.pop("predictor", "cn5"),
            **overrides,
        )
    base = dataclasses.asdict(defaults)
    base.update(overrides)
    return Config(**base)


HEADLINE = {  # best-by-validation headline metric per dataset
    "collab": "Hits@50", "ppa": "Hits@100", "ddi": "Hits@20",
    "Cora": "Hits@100", "Citeseer": "Hits@100", "Pubmed": "Hits@100",
    "citation2": "MRR",
}


def run(cfg: Config) -> dict:
    """Full multi-run training with best-by-validation tracking — the engine
    of reference main() (NeighborOverlap_large.py:253-364)."""
    if cfg.platform:
        # must happen before any backend initialization; the build image's
        # sitecustomize pins JAX_PLATFORMS=axon, so env vars are not enough
        import jax

        jax.config.update("jax_platforms", cfg.platform)
    logger = MetricLogger(f"rec/{cfg.model}_{cfg.predictor}")
    logger.text("hyperparams", json.dumps(dataclasses.asdict(cfg)))
    planetoid = cfg.dataset in ("Cora", "Citeseer", "Pubmed")
    headline = HEADLINE.get(cfg.dataset, "Hits@100")
    mrr_mode = cfg.dataset == "citation2"
    ds = loaddataset(cfg.dataset, cfg.use_valedges_as_input, cfg.load,
                     root=cfg.data_root, seed=cfg.seed,
                     synthetic_scale=cfg.synthetic_scale)
    if cfg.reorder == "bfs":
        ds = ds.reorder_bfs()
    ret = []
    for run_i in range(cfg.runs):
        if planetoid:  # fresh random split per run (reference :284-286)
            ds = loaddataset(cfg.dataset, cfg.use_valedges_as_input, cfg.load,
                             root=cfg.data_root, seed=cfg.seed + run_i,
                             synthetic_scale=cfg.synthetic_scale)
            if cfg.reorder == "bfs":
                ds = ds.reorder_bfs()
        tr = Trainer(cfg, ds)
        state = tr.init_state(cfg.seed + run_i)
        if cfg.loadmod and cfg.checkpoint_dir:
            # resume full TrainState (reference --loadmod only restored
            # weights; orbax restores optimizer/EMA state too)
            from ocn_tpu.train.checkpoint import load_state
            state, step0 = load_state(cfg.checkpoint_dir, state)
            print(f"resumed from {cfg.checkpoint_dir} step {step0}", flush=True)
        rng = np.random.default_rng(cfg.seed + run_i)
        best = None
        for epoch in range(1, cfg.epochs + 1):
            t1 = time.time()
            if cfg.profile_dir and epoch == 1 and run_i == 0:
                # device-level tracing (SURVEY.md §5: the reference only has
                # wall-clock prints; here one epoch gets a full xprof trace)
                import jax

                with jax.profiler.trace(cfg.profile_dir):
                    state, loss = tr.train_epoch(state, rng, epoch)
            else:
                state, loss = tr.train_epoch(state, rng, epoch)
            ttrain = time.time() - t1
            t1 = time.time()
            if mrr_mode:
                res = tr.evaluate_mrr(state)
                results = {"MRR": (res["valid"], res["valid"], res["test"])}
            else:
                results = tr.evaluate(state)
            ttest = time.time() - t1
            print(f"trn time {ttrain:.2f} s  test time {ttest:.2f} s", flush=True)
            if best is None:
                best = {k: list(v) for k, v in results.items()}
            for key, (trn, val, tst) in results.items():
                logger.scalars(f"{key}_{run_i}",
                               {"trn": trn, "val": val, "tst": tst}, epoch)
                if val > best[key][1]:
                    best[key] = [trn, val, tst]
                    # best-by-validation artifact saves (reference
                    # NeighborOverlap_large.py:334-340)
                    if cfg.savemod and cfg.checkpoint_dir:
                        from ocn_tpu.train.checkpoint import save_state
                        save_state(cfg.checkpoint_dir, state, epoch)
                    if cfg.save_gemb:
                        from ocn_tpu.train.checkpoint import save_embeddings
                        h_best = tr.encode(state.params, tr.g)
                        save_embeddings(
                            f"gemb/{cfg.dataset}_{cfg.model}_{cfg.predictor}"
                            f"_{cfg.hiddim}.npy", h_best)
                    if cfg.savex:
                        from ocn_tpu.train.checkpoint import save_embeddings
                        emb = state.params["encoder"].get("Embed_0", {}).get("embedding")
                        if emb is not None:
                            save_embeddings(
                                f"gemb/{cfg.dataset}_{cfg.model}_{cfg.predictor}"
                                f"_{cfg.hiddim}_{run_i}.npy", emb)
                print(
                    f"{key}  Run: {run_i + 1:02d}, Epoch: {epoch:02d}, "
                    f"Loss: {loss:.4f}, Train: {100 * trn:.2f}%, "
                    f"Valid: {100 * val:.2f}%, Test: {100 * tst:.2f}%",
                    flush=True,
                )
        print(f"best {best}")
        ret.append(best[headline][-2:])
    ret = np.array(ret)
    summary = {
        "val_mean": float(ret[:, 0].mean()), "val_std": float(ret[:, 0].std()),
        "tst_mean": float(ret[:, 1].mean()), "tst_std": float(ret[:, 1].std()),
        "headline": headline,
    }
    print(
        f"Final result: val {summary['val_mean']:.4f} {summary['val_std']:.4f} "
        f"tst {summary['tst_mean']:.4f} {summary['tst_std']:.4f}"
    )
    return summary


def main(argv=None):
    cfg = parseargs(argv)
    print(cfg, flush=True)
    return run(cfg)


if __name__ == "__main__":
    main()
