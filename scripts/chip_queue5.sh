#!/bin/bash
# Round-5 chip queue (VERDICT r4 next #2-#5): the queue-4 tail that needs
# re-running, the HEAD train re-measure, and the annotator SoL evidence.
#
# Run: bash scripts/chip_queue5.sh            (all steps)
#      bash scripts/chip_queue5.sh <step>...  (named steps only)
# Do NOT run while a CPU pytest suite is active (host contention inflates
# TPU timings ~5x — .claude/skills/verify/SKILL.md).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
Q=/tmp/chipq/q5
mkdir -p "$Q"
STATUS="$Q/queue5.status"

run_step() {
  local name=$1 tmo=$2
  shift 2
  if [ $# -eq 0 ]; then return; fi
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "${name}_DONE $?" >> "$STATUS"
}

want() {
  [ ${#STEPS[@]} -eq 0 ] && return 0
  local s
  for s in "${STEPS[@]}"; do [ "$s" = "$1" ] && return 0; done
  return 1
}

STEPS=("$@")
: > "$STATUS"

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# --- HEAD guard with the round-5 GEGLU default flip (expect ~0.998) ---------
want sd15_head   && run_step sd15_head   2400 python bench.py

# --- BASELINE config 5 re-measure at HEAD (VERDICT next #4): the recorded
#     10.17 samples/s predates the int8 conv, fused epilogues, r3 fixes ------
want train_head  && run_step train_head  3600 python bench.py --config train

# --- UniPC bf16 companion (VERDICT next #7: int8-vs-bf16 bookkeeping) -------
want unipc_bf16  && run_step unipc_bf16  2400 python bench.py --sampler unipc --no-int8

# --- int8-VAE quality retry (q4 hit a transient remote-compile flake) -------
want int8vae_q   && run_step int8vae_q   3600 python scripts/int8_quality.py --stack sd15 --n 128 --vae-int8

# --- Annotator SoL evidence (VERDICT next #5): per-net trace + FLOP floor ---
want trace_ann   && run_step trace_ann   3600 python tools/trace_annotators.py

# --- attn_sweep anomaly recheck + int8 block_q decision (VERDICT next #6) ---
want attn_recheck && run_step attn_recheck 2400 python tools/attn_recheck.py

echo QUEUE5_DONE >> "$STATUS"
