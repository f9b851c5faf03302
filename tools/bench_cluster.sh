#!/usr/bin/env bash
# Full-registry bench across a REAL executor boundary: the same
# graft.Bench the driver runs, but under a local-cluster master (separate
# executor JVMs launched from SPARK_HOME), so shuffle fetch, closure and
# connector-commit serde, broadcast distribution, and block-manager
# traffic are all PAID in the timings instead of simulated away by
# local[*]'s in-process shortcuts. Produces BENCH_cluster.json (the
# bench_full.json shape: full query names + shuffle attribution).
#
# Usage: tools/bench_cluster.sh [out.json]
#   GRAFT_BENCH_MASTER (default local-cluster[2,16,8192]) — 2 executor
#   JVMs x 16 cores matches the host's 32 threads; 8 GiB each.
#   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) passes through.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-BENCH_cluster.json}"
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
MASTER="${GRAFT_BENCH_MASTER:-local-cluster[2,16,8192]}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
WORK="$(mktemp -d /tmp/graft_bench_cluster.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

echo "== cluster bench: master=$MASTER sf=$SF"
SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_OUT_DIR="$WORK" \
  sbt -batch "runMain graft.Bench" >"$WORK/bench.log" 2>&1 \
  || { tail -40 "$WORK/bench.log"; exit 1; }
cp "$WORK/bench_full.json" "$OUT"
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"total={d['value']:.1f}s n={d['n_queries']} failed={d['failed']}")
EOF
echo "wrote $OUT"
