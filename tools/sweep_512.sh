#!/bin/bash
# Round-5 512px operating-point sweep (VERDICT r4 #6).
# Serialized single-TPU runs; each bench.py prints one JSON line.
# Results accumulate in artifacts/round5_512/sweep.jsonl with the config.
set -u
OUT=artifacts/round5_512/sweep.jsonl
mkdir -p artifacts/round5_512
run() {
  local tag="$1"; shift
  echo "=== $tag : bench.py --mode step --hw 512 $* ===" >&2
  local line
  line=$(timeout 1500 python bench.py --mode step --hw 512 "$@" 2>/tmp/sweep_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"config\": \"$tag\", \"result\": $line}" >> "$OUT"
    echo "$tag -> $line" >&2
  else
    echo "{\"config\": \"$tag\", \"result\": null, \"error\": \"$(tail -3 /tmp/sweep_err.log | tr '\n' ' ' | tr '"' "'" | cut -c1-300)\"}" >> "$OUT"
    echo "$tag -> FAILED" >&2
  fi
}

run b4_remat_all        --batch 4 --remat
run b4_remat_decoder    --batch 4 --remat --remat_scope decoder
run b4_lpips_only       --batch 4 --remat_lpips
run b6_decoder_lpips    --batch 6 --remat --remat_scope decoder --remat_lpips
run b8_decoder_lpips    --batch 8 --remat --remat_scope decoder --remat_lpips
run b8_all_lpips        --batch 8 --remat --remat_lpips
echo "SWEEP DONE" >&2
