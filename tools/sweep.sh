#!/usr/bin/env bash
# Full correctness sweep: the three configurations that gate a round.
#   1. sf0.01 at local[32]  (the driver's t2 configuration)
#   2. sf0.1  at local[32]  (scale-up: 10x rows, same oracles)
#   3. sf0.01 at local[5]   (determinism under different partitioning)
# Each runs graft.Verify then the TYPE-STRICT tools/selfcheck.py.
# Exit nonzero on the first failing configuration.
set -euo pipefail
cd "$(dirname "$0")/.."

run() { # run <sfdir> <cpus> <outdir>
  local sfdir=$1 cpus=$2 out=$3
  echo "=== verify $sfdir (local[$cpus]) -> $out"
  rm -rf "$out"
  SPARK_GRAFT_CPUS=$cpus sbt -batch "runMain graft.Verify $sfdir $out" \
    > "$out.verify.log" 2>&1 \
    || { echo "verify FAILED; tail of $out.verify.log:"; tail -20 "$out.verify.log"; exit 1; }
  # don't die inside the redirect — print the tail first, then gate
  python3 tools/selfcheck.py "$sfdir" "$out" > "$out.selfcheck.log" 2>&1 || true
  tail -3 "$out.selfcheck.log"
  grep -q " 0 fail" "$out.selfcheck.log"
}

run /root/testdata/sf0.01 32 /tmp/sweep_sf001
run /root/testdata/sf0.1  32 /tmp/sweep_sf01
run /root/testdata/sf0.01 5  /tmp/sweep_l5
echo "=== all three sweeps green"
