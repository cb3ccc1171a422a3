#!/bin/bash
# Re-measure sweep rows invalidated by round-2 code changes:
#  - BVH_Radix (all sizes >= 1e5, both dims): segment-tree quad build +
#    group_size retune landed after the matrix was produced.
#  - BarnesHut_Grid 3D >= 5e5: far_impl="local" became the grid default.
# Chunks run smallest-first so partial progress is maximally useful; each
# chunk is one subprocess (relay-wedge containment, same as run_full_sweep).
cd /root/repo
run() {  # run <timeout_s> <args...>
  local t=$1; shift
  echo "=== [$(date +%H:%M:%S)] $*"
  timeout "$t" python -m nbody_tpu.bench.sweep --tiers abhf \
    --results-dir artifacts/results "$@" || echo "  CHUNK FAILED/TIMEOUT ($?)"
}
for n in 100000 200000; do
  for d in 2 3; do
    run 600 --sizes $n --dims $d --accuracy off --methods BVH_Radix --run-id r2fp2
  done
done
run 900  --sizes 500000  --dims 3 --accuracy off --methods BarnesHut_Grid --run-id r2fp2
run 1200 --sizes 1000000 --dims 3 --accuracy off --methods BarnesHut_Grid --run-id r2fp2
for n in 500000 1000000; do
  for d in 2 3; do
    run 1200 --sizes $n --dims $d --accuracy off --methods BVH_Radix --run-id r2fp2
  done
done
run 1800 --sizes 2000000 --dims 3 --accuracy off --methods BarnesHut_Grid --run-id r2fp2
run 2400 --sizes 5000000 --dims 3 --accuracy off --methods BarnesHut_Grid --run-id r2fp2
for n in 2000000 5000000; do
  for d in 2 3; do
    run 2400 --sizes $n --dims $d --accuracy off --methods BVH_Radix --run-id r2fp2
  done
done
for n in 100000 200000; do
  for d in 2 3; do
    run 900 --sizes $n --dims $d --accuracy on --methods BVH_Radix --run-id r2ap2
  done
done
echo "=== remeasure done $(date +%H:%M:%S)"
