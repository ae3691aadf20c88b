#!/bin/bash
# Chip-work queue: run the tunnel-blocked round-3 items in priority order.
# Each step bounded; logs to /tmp/chipq/*.log. Run from /root/repo:
#   mkdir -p /tmp/chipq && bash scripts/chip_queue.sh
# (poll the tunnel first: a 120 s-bounded `python -c "import jax; jax.devices()"`
# hangs while the outage lasts).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

# 0. quick sanity: chip visible
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. tiny-e2e PNG drive (bf16 + int8 through the public API) ~ fast
timeout 1200 python scripts/drive_e2e.py > /tmp/chipq/drive_e2e.log 2>&1

# 2. sd3 --with-t5 bench (fast T5 init now; bound generous for 1024^2 compiles)
timeout 3000 python bench.py --config sd3 --with-t5 > /tmp/chipq/sd3_t5.log 2>&1

# 3. int8 SD3 trace for further levers
timeout 1800 python tools/trace_sd3.py --int8 > /tmp/chipq/trace_sd3_int8.log 2>&1

# 4. re-confirm headline serving numbers after this session's edits
timeout 1800 python bench.py --config sd15 > /tmp/chipq/sd15_int8.log 2>&1
timeout 2400 python bench.py --config sd3 > /tmp/chipq/sd3_int8.log 2>&1
# 5. int8 VAE measurement (opt-in flag, landed end of r3, unmeasured)
timeout 1800 python bench.py --config sd15 --int8-vae > /tmp/chipq/sd15_int8vae.log 2>&1
timeout 2400 python bench.py --config sd3 --int8-vae > /tmp/chipq/sd3_int8vae.log 2>&1
# 6. SD3 attention block_q sweep (3.71 ms/site vs 3.17 floor)
timeout 2400 python tools/attn_sd3_probe.py --sweep > /tmp/chipq/attn_sweep.log 2>&1
# 7. SD1.5 fused GEGLU->int8 epilogue (lax.erf in Mosaic): compile + measure;
#    flip the default on (and drop the env gate) if it compiles and wins
PD_SD15_FUSED_GEGLU=1 timeout 1800 python bench.py --config sd15 > /tmp/chipq/sd15_geglu.log 2>&1
# 8. re-gate int8 quality after the fused epilogue wiring (per-row scales
#    replace per-tensor at the gelu/attn-out sites — expected to only
#    tighten, but the acceptance bound must be re-demonstrated)
timeout 3600 python scripts/int8_quality.py --stack sd3 --n 96 > /tmp/chipq/quality_sd3.log 2>&1
timeout 3600 python scripts/int8_quality.py --stack sd15 --n 256 > /tmp/chipq/quality_sd15.log 2>&1
# 8b. train-step trace (BASELINE 5 currently has a number but no trace/
#     SoL story — tools/trace_train.py mirrors the bench config exactly)
timeout 2400 python tools/trace_train.py > /tmp/chipq/trace_train.log 2>&1
# 9. int8 conv XSHIFT variant (in-kernel im2col — kills the 3x HBM x3
#    traffic; bit-exact vs im2col, tests/test_int8_conv.py): probe both
#    variants, then an end-to-end bench with the variant flipped on
timeout 2400 python tools/int8_probe.py > /tmp/chipq/int8_probe_xshift.log 2>&1
PD_INT8_CONV_XSHIFT=1 timeout 1800 python bench.py --config sd15 > /tmp/chipq/sd15_xshift.log 2>&1
echo QUEUE_DONE
