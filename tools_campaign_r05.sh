#!/bin/bash
# Round-5 artifact campaign: every TPU/quiet-host measurement, SEQUENTIAL
# and ALONE (CLAUDE.md: concurrent CPU load skews timings).  Each step
# logs to /tmp/campaign_r05/<name>.err; artifacts land in the repo root.
set -x
cd /root/repo
mkdir -p /tmp/campaign_r05

# 0. ARMS matrix, interleaved windows (~45 min)
timeout 5400 python bench.py --model E --batch 512 \
    --arms-ab host xla_bz fused_bz dev_hash dev_all \
    > ARMS_r05.json 2> /tmp/campaign_r05/arms.err

# 1. Smoke: headline bench still healthy under the new defaults (~3 min)
timeout 1800 python bench.py --smoke \
    > /tmp/campaign_r05/smoke.json 2> /tmp/campaign_r05/smoke.err

# 2. Naive-TPU baseline arm, e2e + device-step, 3 batch cells (~25 min)
timeout 5400 python -m recom_tpu.tools.naive_tpu --model E \
    --batches 128 512 2048 --sanity --device-arm --out NAIVE_r05.json \
    2> /tmp/campaign_r05/naive.err

# 3. Embedding-only bandwidth, f32 + bf16 (~10 min)
( timeout 2700 python bench.py --embedding-only --table-dtype float32 \
    2>/tmp/campaign_r05/embbw_f32.err;
  timeout 2700 python bench.py --embedding-only --table-dtype bfloat16 \
    2>/tmp/campaign_r05/embbw_bf16.err ) > EMBBW_r05.json

# 4. Full-model bandwidth attribution (~20 min)
timeout 5400 python -m recom_tpu.tools.bw_breakdown --model E --batch 512 \
    --out BWBRK_r05.json > /tmp/campaign_r05/bwbrk.out \
    2> /tmp/campaign_r05/bwbrk.err

# 5. Ragged pooling L-rung microbench (~15 min)
timeout 3600 python -m recom_tpu.tools.ragged_bench --out RAGGED_r05.json \
    > /tmp/campaign_r05/ragged.out 2> /tmp/campaign_r05/ragged.err

# 6. AE sweep, models E and F, naive arm at every cell (~2 h)
timeout 14400 python -m recom_tpu.tools.ae_sweep --models E F \
    --naive-arm --out AE_SWEEP_r05.json \
    > /tmp/campaign_r05/ae.out 2> /tmp/campaign_r05/ae.err

# 7. Workers throughput sweep, E and F (~40 min)
timeout 7200 python -m recom_tpu.tools.ae_sweep --models E F \
    --workers-sweep --out THROUGHPUT_r05.json \
    > /tmp/campaign_r05/tp.out 2> /tmp/campaign_r05/tp.err

echo CAMPAIGN_TPU_DONE

# 8. Quiet-host CPU measurements (still alone: they time the same core)
timeout 1800 python -m recom_tpu.tools.hostdip --out HOSTDIP_r05.json \
    > /tmp/campaign_r05/hostdip.out 2> /tmp/campaign_r05/hostdip.err

XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 3600 \
    python -m recom_tpu.tools.scaling --artifact SCALING_r05.json \
    --chunks 2 > /tmp/campaign_r05/scaling.out \
    2> /tmp/campaign_r05/scaling.err

timeout 1800 python -m recom_tpu.tools.overlap_evidence \
    --out OVERLAP_r05.json > /tmp/campaign_r05/overlap.out \
    2> /tmp/campaign_r05/overlap.err

echo CAMPAIGN_ALL_DONE
