#!/bin/bash
# Round-5 512px sweep, phase 2: classify the phase-1 failures (OOM vs
# transient relay death) and probe the remat_lpips x remat_scope grid
# that phase 1 did not cover. Serialized single-TPU runs.
set -u
OUT=artifacts/round5_512/sweep.jsonl
mkdir -p artifacts/round5_512 /tmp/sweep512_err
run() {
  local tag="$1"; shift
  echo "=== $tag : bench.py --mode step --hw 512 $* ===" >&2
  local line
  line=$(timeout 1500 python bench.py --mode step --hw 512 "$@" 2>/tmp/sweep512_err/$tag.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"config\": \"$tag\", \"result\": $line}" >> "$OUT"
    echo "$tag -> $line" >&2
  else
    local err
    err=$(grep -oE "RESOURCE_EXHAUSTED[^\"]*|[A-Za-z]*Error: [^\"]*" /tmp/sweep512_err/$tag.log | head -1 | tr '"' "'" | cut -c1-200)
    echo "{\"config\": \"$tag\", \"result\": null, \"error\": \"$err\"}" >> "$OUT"
    echo "$tag -> FAILED ($err)" >&2
  fi
}

run b4_all_lpips      --batch 4 --remat --remat_lpips
run b6_all_lpips      --batch 6 --remat --remat_lpips
run b8_all_lpips_r2   --batch 8 --remat --remat_lpips
run b4_lpips_only_r2  --batch 4 --remat_lpips
echo "SWEEP2 DONE" >&2
