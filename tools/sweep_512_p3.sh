#!/bin/bash
# Round-5 512px sweep, phase 3. Phase 1+2 established: (a) remat_lpips is
# a throughput LOSS at 512px (76.9-78.5 vs 98.2 f/s at b4 — the VGG
# recompute costs more than the activation traffic it saves even here),
# (b) b6 OOMs by 740 MB even fully rematerialized, so HBM caps the folded
# frame count at B*T=32. Phase 3 asks: how should 32 frames be arranged
# (batch x T grid), does decoder-scope remat fit once the VGG towers are
# rematerialized, and does b5 squeeze in.
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
    err=$(grep -oE "Ran out of memory[^.]*|RESOURCE_EXHAUSTED[^\"]*|[A-Za-z]*Error: [^\"]*" /tmp/sweep512_err/$tag.log | head -1 | tr '"' "'" | cut -c1-200)
    echo "{\"config\": \"$tag\", \"result\": null, \"error\": \"$err\"}" >> "$OUT"
    echo "$tag -> FAILED ($err)" >&2
  fi
}

run b4_decoder_lpips_r2  --batch 4 --remat --remat_scope decoder --remat_lpips
run b8T4_all             --batch 8 --frames 4 --remat
run b2T16_all            --batch 2 --frames 16 --remat
run b5_all               --batch 5 --remat
echo "SWEEP3 DONE" >&2
