#!/bin/bash
# Interleaved scaling campaign: 4 rounds x levels (8,2,4,1) at n=16M.
cd /root/repo
for i in 1 2 3 4; do
  for c in 8 2 4 1; do
    python scripts/scaling_trial.py $c 16000000 800000 /root/repo/.trials_campaign.jsonl 2>/dev/null | tail -1
  done
done
echo CAMPAIGN_DONE
