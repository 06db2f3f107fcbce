#!/bin/bash
# Wait for the TPU tunnel to come back, then run the 2048x1024 cylinder
# bench on it (dctcg and mg) and record results to /tmp/cyl_tpu_results.txt.
out=/tmp/cyl_tpu_results.txt
probe() {
  timeout 90 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d; print(d)" >/dev/null 2>&1
}
for i in $(seq 1 80); do
  if probe; then
    echo "[watch] TPU back at attempt $i, $(date)" | tee "$out"
    for m in dctcg mg; do
      echo "=== method=$m ===" >> "$out"
      timeout 1800 python /root/repo/scripts/cyl_bench.py --method "$m" \
        --shape 2048x1024 --steps 100 --settle 100 >> "$out" 2>&1
    done
    echo "[watch] done $(date)" >> "$out"
    exit 0
  fi
  sleep 180
done
echo "[watch] TPU never came back" > "$out"
exit 1
