"""Random-search HPO driver (ocn_tpu/train/hpo.py; SURVEY.md §5)."""
import json
import os

import numpy as np

from ocn_tpu.config import Config
from ocn_tpu.train.hpo import DEFAULT_SPACE, random_search, sample


def test_sample_respects_space():
    rng = np.random.default_rng(0)
    for _ in range(50):
        s = sample(DEFAULT_SPACE, rng)
        assert 1e-4 <= s["gnnlr"] <= 3e-2
        assert s["gnndp"] in (0.0, 0.05, 0.1, 0.25, 0.5)
        # every sampled key must be a real Config field
        cfg = Config(**{**{}, **s})
        assert cfg.gnnlr == s["gnnlr"]


def test_random_search_tracks_best_and_logs(tmp_path):
    calls = []

    def objective(cfg):
        calls.append(cfg)
        # deterministic fake metric keyed on a sampled knob
        v = 1.0 - abs(cfg.gnndp - 0.25)
        return {"val_mean": v, "val_std": 0.0, "tst_mean": v / 2,
                "tst_std": 0.0}

    base = Config(dataset="Cora", predictor="cn5")
    best = random_search(base, trials=5, seed=1, out_dir=str(tmp_path),
                         objective=objective)
    assert len(calls) == 5
    path = os.path.join(str(tmp_path), "hpo_Cora_cn5.jsonl")
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 5
    assert best["val_mean"] == max(r["val_mean"] for r in recs)
    # reproducibility: same seed -> same samples
    calls2 = []

    def obj2(cfg):
        calls2.append(cfg)
        return {"val_mean": 0.0, "val_std": 0.0, "tst_mean": 0.0,
                "tst_std": 0.0}

    random_search(base, trials=5, seed=1, out_dir=str(tmp_path),
                  objective=obj2)
    assert [c.gnnlr for c in calls] == [c.gnnlr for c in calls2]
