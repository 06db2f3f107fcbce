#!/bin/bash
# Wait for the TPU tunnel to come back, then run the round's measurement
# agenda, appending everything to /tmp/cyl_tpu_results.txt:
#   1. 2048x1024 cylinder bench: dctcg (new spectral-Woodbury path) vs mg
#   2. 2048^2 cavity fft: fused-2D whole-step on vs off
#   3. 512^3 cavity fft: fused single-buffer (db=False) vs r1's fallback
#   4. 256^3 cavity fft: regression check
out=/tmp/cyl_tpu_results.txt
probe() {
  timeout 90 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d" >/dev/null 2>&1
}
for i in $(seq 1 120); do
  if probe; then
    echo "[watch] TPU back at attempt $i, $(date)" | tee -a "$out"
    for m in dctcg mg; do
      echo "=== cyl 2048x1024 method=$m ===" >> "$out"
      timeout 1800 python /root/repo/scripts/cyl_bench.py --method "$m" \
        --shape 2048x1024 --steps 100 --settle 100 >> "$out" 2>&1
      echo "=== cyl 2048x1024 method=$m --pallas (fused 2D step) ===" >> "$out"
      timeout 1800 python /root/repo/scripts/cyl_bench.py --method "$m" \
        --shape 2048x1024 --steps 100 --settle 100 --pallas >> "$out" 2>&1
    done
    echo "=== cavity 2048^2 fft (jnp step) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --nx 2048 --ny 2048 \
      --poisson fft >> "$out" 2>&1
    echo "=== cavity 2048^2 fft --pallas (fused 2D whole-step) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --nx 2048 --ny 2048 \
      --poisson fft --pallas >> "$out" 2>&1
    echo "=== cavity 256^3 fft (regression) ===" >> "$out"
    timeout 1800 python /root/repo/bench.py --nx 256 --ny 256 --nz 256 \
      --poisson fft >> "$out" 2>&1
    echo "=== cavity 512^3 fft (db=False fused whole-step) ===" >> "$out"
    timeout 2400 python /root/repo/bench.py --nx 512 --ny 512 --nz 512 \
      --poisson fft --steps 20 >> "$out" 2>&1
    echo "[watch] done $(date)" >> "$out"
    exit 0
  fi
  sleep 180
done
echo "[watch] TPU never came back" >> "$out"
exit 1
