#!/bin/bash
# Follow-up chip work after scripts/chip_queue.sh: the with-t5 retry with
# the fixed T5-before-SD3 staging order, and the serving-bench runs for the
# recorded (int8) serving modes on both stacks.
#   mkdir -p /tmp/chipq && bash scripts/chip_queue2.sh
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. sd3 --with-t5 (staging order fixed: T5 encode+free BEFORE SD3 init;
#    the old order OOMed at 16 GB)
timeout 3600 python bench.py --config sd3 --with-t5 > /tmp/chipq/sd3_t5_retry.log 2>&1

# 2. serving bench, recorded int8 modes (docs/SERVING.md table refresh)
timeout 3600 python scripts/bench_serving.py --int8 --reqs 4 \
  > /tmp/chipq/serve_sd15_int8.log 2>&1
timeout 5400 python scripts/bench_serving.py --stack sd3 --int8 --reqs 3 \
  > /tmp/chipq/serve_sd3_int8.log 2>&1

echo QUEUE2_DONE
