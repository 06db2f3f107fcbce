#!/bin/bash
# Phase-2 TPU measurement agenda: the fused paths added after the phase-1
# watcher (scripts/tpu_watch_cyl.sh) was launched. Waits for phase 1 to
# finish (its pid in /tmp/tpu_watch.pid), then probes for the TPU and runs:
#   1. 2048^2 taylor_green --pallas: fused 2D PERIODIC whole-step
#      (vs 1946 MLUPS jnp in docs/PARITY.md)
#   2. 256^3 taylor_green3d: fused 3D periodic whole-step (new datapoint)
#   3. 256^3 duct_periodic: periodic + static forcing through the fused path
#   4. 512x256x256 sphere (obstacle + outflow, iterative mg): fused 3D
#      obstacle path at scale
out=/tmp/tpu_phase2_results.txt
p1=$(cat /tmp/tpu_watch.pid 2>/dev/null)
for i in $(seq 1 200); do
  kill -0 "$p1" 2>/dev/null || break
  sleep 120
done
probe() {
  timeout 90 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then
    echo "[phase2] TPU up at attempt $i, $(date)" | tee -a "$out"
    echo "=== taylor_green 2048^2 (jnp baseline) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case taylor_green \
      --nx 2048 --ny 2048 --re 1000 --no-pallas >> "$out" 2>&1
    echo "=== taylor_green 2048^2 --pallas (fused 2D periodic) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case taylor_green \
      --nx 2048 --ny 2048 --re 1000 --pallas >> "$out" 2>&1
    echo "=== taylor_green3d 256^3 (fused 3D periodic, auto) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case taylor_green3d --re 1600 \
      --nx 256 --ny 256 --nz 256 >> "$out" 2>&1
    echo "=== duct_periodic 256^3 (periodic + forcing fused) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case duct_periodic --re 400 \
      --nx 256 --ny 256 --nz 256 --poisson fft >> "$out" 2>&1
    echo "=== sphere 512x256x256 mg (fused 3D obstacle path) ===" >> "$out"
    timeout 2400 python /root/repo/bench.py --case sphere --re 300 \
      --nx 512 --ny 256 --nz 256 --poisson mg --steps 50 >> "$out" 2>&1
    echo "[phase2] done $(date)" >> "$out"
    exit 0
  fi
  sleep 180
done
echo "[phase2] TPU never came back" >> "$out"
exit 1
