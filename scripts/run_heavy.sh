#!/bin/bash
# Heavy tier, fresh process per file: immune to the XLA-CPU
# cumulative-compile crash (pytest.ini) by construction.
set -u
files=$(grep -l "pytest.mark.heavy" tests/test_*.py)
total=0; failed=0
for f in $files; do
  out=$(python -m pytest "$f" -q -m heavy -o addopts= 2>&1 | tail -1)
  echo "$f: $out"
  case "$out" in *failed*|*error*) failed=1;; esac
done
exit $failed
