#!/bin/bash
# Round-4 chip queue: re-measure EVERYTHING at HEAD (VERDICT r3 next #1-3,6,7).
# Supersedes scripts/chip_queue3.sh (never executed — the r3 tunnel outage).
#
# Run: bash scripts/chip_queue4.sh            (all steps)
#      bash scripts/chip_queue4.sh <step>...  (named steps only)
# Do NOT run while a CPU pytest suite is active (host contention inflates
# TPU timings ~5x — .claude/skills/verify/SKILL.md).
#
# ADVICE r3 applied: per-queue log dir (q4/), status file truncated at
# start, status markers named after the step (not positional numbers).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
Q=/tmp/chipq/q4
mkdir -p "$Q"
STATUS="$Q/queue4.status"

run_step() {
  local name=$1 tmo=$2
  shift 2
  if [ $# -eq 0 ]; then return; fi
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  echo "${name}_DONE $?" >> "$STATUS"
}

want() {
  # no args to the script = run everything; else only named steps
  [ ${#STEPS[@]} -eq 0 ] && return 0
  local s
  for s in "${STEPS[@]}"; do [ "$s" = "$1" ] && return 0; done
  return 1
}

STEPS=("$@")
: > "$STATUS"

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# --- Guards: the recorded serving numbers, re-measured at HEAD ---------------
want sd15_int8   && run_step sd15_int8   2400 python bench.py
want sd15_bf16   && run_step sd15_bf16   2400 python bench.py --no-int8

# --- SD3 re-measure at HEAD (fused-act epilogues + AdaLN row padding landed
#     AFTER the recorded 0.160; VERDICT Missing #1) --------------------------
want sd3_int8    && run_step sd3_int8    3600 python bench.py --config sd3
want sd3_bf16    && run_step sd3_bf16    3600 python bench.py --config sd3 --no-int8

# --- SD3 int8 quality RE-GATE at HEAD, same protocol (N=96, 1024^2, 28) -----
want sd3_regate  && run_step sd3_regate  5400 python scripts/int8_quality.py --stack sd3 --n 96

# --- Full triple-encoder SD3 (T5 on-chip), bf16 + int8 (VERDICT next #2) ----
want sd3_t5_int8 && run_step sd3_t5_int8 3600 python bench.py --config sd3 --with-t5
want sd3_t5_bf16 && run_step sd3_t5_bf16 3600 python bench.py --config sd3 --with-t5 --no-int8

# --- BASELINE config 2 as written: UniPC batch 4 (VERDICT next #7) ----------
want sd15_unipc  && run_step sd15_unipc  2400 python bench.py --sampler unipc

# --- BASELINE config 3 as written: full annotation pass (VERDICT next #6) ---
want annotate    && run_step annotate    2400 python bench.py --config annotate --annotator all

# --- Serving in the recorded (int8) modes (VERDICT next #3) -----------------
want serve_sd15  && run_step serve_sd15  2400 python scripts/bench_serving.py --int8 --reqs 4
want serve_sd3   && run_step serve_sd3   4800 python scripts/bench_serving.py --stack sd3 --int8 --reqs 3

# --- Levers built in r3, never measured --------------------------------------
# Fused GEGLU->int8 (erf fix 30173c4): flip default only if it compiles AND
# beats the sd15_int8 number above. (env wrapper, NOT `VAR=1 run_step`: a
# var assignment prefixed to a bash *function* call leaks past the call)
want sd15_geglu  && run_step sd15_geglu 2400 env PD_SD15_FUSED_GEGLU=1 python bench.py
# int8 VAE: perf + quality gate.
want int8vae     && run_step int8vae     2400 python bench.py --int8-vae
want int8vae_q   && run_step int8vae_q   3600 python scripts/int8_quality.py --stack sd15 --n 128 --vae-int8

# --- Perf-lab probes ----------------------------------------------------------
want attn_sweep  && run_step attn_sweep  2400 python tools/attn_sd3_probe.py --sweep
want trace_train && run_step trace_train 2400 python tools/trace_train.py

echo QUEUE4_DONE >> "$STATUS"
