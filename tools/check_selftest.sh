#!/usr/bin/env bash
# Self-test of the correctness harness: the DuckDB-compare gate must FAIL
# when results are wrong — a gate that cannot fail is vacuous. Dumps one
# known-good query, then corrupts the result three ways (a value, a
# dropped row, a renamed column) and asserts tools/check.py flags each.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
WORK="$(mktemp -d /tmp/graft_check_selftest.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

SPARK_GRAFT_ONLY=q12_distinct SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.Verify $SF $WORK/good" >"$WORK/verify.log" 2>&1
python3 tools/check.py "$WORK/good" "$SF" | grep -q "1/1 queries match" \
  || { echo "baseline dump did not pass"; exit 1; }

corrupt() { # $1 = python mutation over the pyarrow table
  rm -rf "$WORK/bad"; cp -r "$WORK/good" "$WORK/bad"
  python3 - "$WORK/bad" "$1" <<'PY'
import glob, sys
import pyarrow.parquet as pq
d, mode = sys.argv[1], sys.argv[2]
f = glob.glob(f"{d}/q12_distinct/*.parquet")[0]
t = pq.read_table(f)
if mode == "value":
    import pyarrow as pa
    import pyarrow.compute as pc
    col = t.column_names[0]
    c = t.column(0)
    mutated = (pc.binary_join_element_wise(c.cast(pa.string()), "x", "")
               if pa.types.is_string(c.type) else pc.add(c, 1))
    t = t.set_column(0, col, mutated.cast(c.type) if not pa.types.is_string(c.type) else mutated)
elif mode == "drop":
    t = t.slice(0, t.num_rows - 1)
elif mode == "rename":
    t = t.rename_columns(["zz_" + c for c in t.column_names])
pq.write_table(t, f)
PY
  if python3 tools/check.py "$WORK/bad" "$SF" | grep -q "1/1 queries match"; then
    echo "GATE FAILED TO FAIL on corruption mode=$1"; exit 1
  fi
  echo "gate correctly rejects corruption mode=$1"
}

corrupt value
corrupt drop
corrupt rename
echo "== check self-test PASSED (the gate can fail)"
