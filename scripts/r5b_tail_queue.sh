#!/bin/bash
# Round-5 continuation tail queue: the wider-cap response arm for the
# Pubmed exact>capped flag (BASELINE.md round 5), then the cn3 clean-seed
# rerun.  Sequential — 2-core host.
cd /root/repo
python -u scripts/accuracy_parity.py --graph Pubmed --predictor cn5 \
  --epochs 25 --eval_every 5 --runs 3 --scale 0.5 \
  --variants capped128_ell \
  --out results/parity_pubmed_half.jsonl > results/parity_pubmed_c128.log 2>&1
echo PUBMED_C128_DONE >> results/r5b_queue.log
bash scripts/r5_cn3_cleanseed.sh >> results/r5b_queue.log 2>&1
echo TAIL_DONE >> results/r5b_queue.log
