#!/bin/bash
# Rerun cn3's capped_t32/rec16_t32 seeds 0-2 under the round-5 code so the
# 8-seed table is single-code-version (seeds 3-7 already ran post-refactor).
cd /root/repo
python - <<'PY'
import json
rows = [json.loads(l) for l in open('results/parity_sbm.jsonl') if l.strip()]
def stale(r):
    return (r.get('predictor') == 'cn3' and r['variant'] in
            ('capped_t32', 'rec16_t32') and r['run'] < 3)
keep = [r for r in rows if not stale(r)]
print(f"purging {len(rows)-len(keep)} pre-refactor cn3 rows")
import os
with open('results/parity_sbm.jsonl.tmp', 'w') as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
os.replace('results/parity_sbm.jsonl.tmp', 'results/parity_sbm.jsonl')
PY
python -u scripts/accuracy_parity.py --graph sbm --predictor cn3 --epochs 20 \
  --eval_every 4 --runs 3 --variants rec16_t32,capped_t32 \
  --out results/parity_sbm.jsonl >> results/parity_sbm_cn3_8seed.log 2>&1
echo CN3_CLEANSEED_DONE
