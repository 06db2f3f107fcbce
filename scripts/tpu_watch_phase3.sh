#!/bin/bash
# Phase-3 TPU measurement agenda: the fused THERMAL paths. Waits for
# phase 2 (/tmp/tpu_phase2.pid), then probes for the TPU and runs:
#   1. 1024^2 heated cavity --pallas: fused 2D thermal whole-step
#      (vs 1879 MLUPS jnp in docs/PARITY.md)
#   2. 128^3 heated cavity: fused 3D thermal (vs 1133 MLUPS jnp)
#   3. 256^3 heated cavity: fused 3D thermal at config-#5 scale
#   4. 2048x512 rayleigh_benard --pallas: periodic rows + thermal fused
out=/tmp/tpu_phase3_results.txt
p2=$(cat /tmp/tpu_phase2.pid 2>/dev/null)
for i in $(seq 1 300); do
  kill -0 "$p2" 2>/dev/null || break
  sleep 120
done
probe() {
  timeout 90 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then
    echo "[phase3] TPU up at attempt $i, $(date)" | tee -a "$out"
    echo "=== heated_cavity 1024^2 (jnp baseline) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case heated_cavity \
      --nx 1024 --ny 1024 --ra 1e8 --no-pallas >> "$out" 2>&1
    echo "=== heated_cavity 1024^2 --pallas (fused 2D thermal) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case heated_cavity \
      --nx 1024 --ny 1024 --ra 1e8 --pallas >> "$out" 2>&1
    echo "=== heated_cavity 128^3 (fused 3D thermal, auto) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case heated_cavity \
      --nx 128 --ny 128 --nz 128 --ra 1e5 >> "$out" 2>&1
    echo "=== heated_cavity 256^3 (fused 3D thermal, auto) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case heated_cavity \
      --nx 256 --ny 256 --nz 256 --ra 1e5 >> "$out" 2>&1
    echo "=== rayleigh_benard 2048x512 --pallas (periodic + thermal) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --case rayleigh_benard \
      --nx 2048 --ny 512 --ra 1e6 --pallas >> "$out" 2>&1
    echo "[phase3] done $(date)" >> "$out"
    exit 0
  fi
  sleep 180
done
echo "[phase3] TPU never came back" >> "$out"
exit 1
