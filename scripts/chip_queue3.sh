#!/bin/bash
# Post-outage chip queue, priority-ordered for limited wall clock.
# SUPERSEDED by scripts/chip_queue4.sh (this queue never ran; r3 tunnel outage).
# Run: mkdir -p /tmp/chipq && bash scripts/chip_queue3.sh
# Do NOT run while a CPU pytest suite is active (host contention inflates
# TPU timings ~5x — .claude/skills/verify/SKILL.md).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p /tmp/chipq

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. Headline guard: sd15 default (int8 serving) bench after the
#    sampler-dispatch + fused-act commits touched the default path.
timeout 2400 python bench.py > /tmp/chipq/sd15_int8.log 2>&1
echo "STEP1_DONE $?" >> /tmp/chipq/queue3.status

# 2. SD3 int8 quality RE-GATE (fused GELU/attn-out row-quant epilogues
#    landed on the default int8 path AFTER the recorded PASS; same
#    protocol as the recorded run: N=96, 1024^2, 28 steps).
timeout 5400 python scripts/int8_quality.py --stack sd3 --n 96 \
  > /tmp/chipq/quality_sd3_regate.log 2>&1
echo "STEP2_DONE $?" >> /tmp/chipq/queue3.status

# 3. sd3 --with-t5: full triple-encoder bench (closes VERDICT r2 weak #9).
timeout 3600 python bench.py --config sd3 --with-t5 > /tmp/chipq/sd3_t5.log 2>&1
echo "STEP3_DONE $?" >> /tmp/chipq/queue3.status

# 4. Serving bench, recorded int8 modes (SERVING.md refresh).
timeout 2400 python scripts/bench_serving.py --int8 --reqs 4 \
  > /tmp/chipq/serve_sd15_int8.log 2>&1
echo "STEP4_DONE $?" >> /tmp/chipq/queue3.status
timeout 4800 python scripts/bench_serving.py --stack sd3 --int8 --reqs 3 \
  > /tmp/chipq/serve_sd3_int8.log 2>&1
echo "STEP5_DONE $?" >> /tmp/chipq/queue3.status

# 5. SD1.5 fused GEGLU->int8 (erf fix 30173c4): compile + measure; flip
#    the default on only if it compiles AND beats 0.9632.
PD_SD15_FUSED_GEGLU=1 timeout 2400 python bench.py > /tmp/chipq/sd15_geglu.log 2>&1
echo "STEP6_DONE $?" >> /tmp/chipq/queue3.status

# 6. int8 VAE (opt-in flag, unmeasured).
timeout 2400 python bench.py --int8-vae > /tmp/chipq/sd15_int8vae.log 2>&1
echo "STEP7_DONE $?" >> /tmp/chipq/queue3.status

# 7. SD3 attention block_q sweep (3.71 ms/site vs 3.17 floor).
timeout 2400 python tools/attn_sd3_probe.py --sweep > /tmp/chipq/attn_sweep.log 2>&1
echo "STEP8_DONE $?" >> /tmp/chipq/queue3.status

# 8. train-step trace (BASELINE 5 SoL story).
timeout 2400 python tools/trace_train.py > /tmp/chipq/trace_train.log 2>&1
echo "STEP9_DONE $?" >> /tmp/chipq/queue3.status

echo QUEUE3_DONE >> /tmp/chipq/queue3.status
