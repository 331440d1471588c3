#!/bin/bash
# Post-cora tail: Pubmed A/B at scale 0.5 (both arms share the scale so the
# comparison is valid; the scale-1.0 capped rows remain the production-shape
# absolutes), then the cn3 clean-seed rerun.
cd /root/repo
python -u scripts/accuracy_parity.py --graph Pubmed --predictor cn5 \
  --epochs 25 --eval_every 5 --runs 3 --scale 0.5 \
  --variants capped_ell,exact \
  --out results/parity_pubmed_half.jsonl > results/parity_pubmed_half.log 2>&1
echo PUBMED_HALF_DONE >> results/r5_cpu_queue.log
bash scripts/r5_cn3_cleanseed.sh >> results/r5_cpu_queue.log 2>&1
