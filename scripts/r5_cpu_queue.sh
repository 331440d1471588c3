#!/bin/bash
# Round-5 CPU study queue (runs after the cn6 x3 study): sequential so the
# 2-core host is never oversubscribed.
#  1. cn3 rec16 test-gap to 8 seeds (VERDICT r4 item 2, second half)
#  2. cn1/cn8/cn9 first convergence rows (item 5)
#  3. Pubmed faithful-preset-shape rows (item 5) — capped_ell first (cheap),
#     then the exact arm (pricey; epochs 25 budget)
cd /root/repo

python -u scripts/accuracy_parity.py --graph sbm --predictor cn3 --epochs 20 \
  --eval_every 4 --runs 8 --variants capped_t32,rec16_t32 \
  --out results/parity_sbm.jsonl > results/parity_sbm_cn3_8seed.log 2>&1

for P in cn1 cn8 cn9; do
  python -u scripts/accuracy_parity.py --graph sbm --predictor $P --epochs 30 \
    --eval_every 3 --runs 3 --variants exact,capped_ell \
    --out results/parity_sbm.jsonl > results/parity_sbm_${P}.log 2>&1
done

python -u scripts/accuracy_parity.py --graph Pubmed --predictor cn5 \
  --epochs 25 --eval_every 5 --runs 3 --variants capped_ell \
  --out results/parity_pubmed.jsonl > results/parity_pubmed_capped.log 2>&1

python -u scripts/accuracy_parity.py --graph Pubmed --predictor cn5 \
  --epochs 25 --eval_every 5 --runs 3 --variants exact \
  --out results/parity_pubmed.jsonl > results/parity_pubmed_exact.log 2>&1

echo QUEUE_DONE
