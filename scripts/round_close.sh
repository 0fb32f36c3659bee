#!/usr/bin/env bash
# Round-close protocol (VERDICT r9 #6): run the official-config bench at
# sf0.1, then the per-query regression diff against bench_history/
# history.jsonl, and persist the diff as an artifact (DIFF_LATEST.txt,
# committed with the round record) — the regression discipline as
# something the driver and judge can read, not a manual eyeball.
#
# Exit nonzero iff the bench failed or the diff found a real (non-ambient)
# per-query regression above 1.5x + 0.3s.
set -uo pipefail
cd "$(dirname "$0")/.."

export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

scripts/runjava.sh graft.Bench 2>/dev/null | grep '"metric"'
bench_rc=$?
if [ $bench_rc -ne 0 ]; then
  echo "round_close: bench failed rc=$bench_rc" >&2
  exit $bench_rc
fi

python3 scripts/bench_diff.py > bench_history/DIFF_LATEST.txt 2>&1
diff_rc=$?
cat bench_history/DIFF_LATEST.txt
exit $diff_rc
