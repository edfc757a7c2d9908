#!/bin/bash
# Test-tier runner. Usage: scripts/ci.sh [fast|slow|all]
#
# fast (~6 min on a 1-core host): units, golden numpy oracles, verbatim
#   reference cross-execution, interpret-mode kernel parity.
# slow (~30-45 min; spawns 2-process multi-host workers with full CPU
#   compiles): mini end-to-end trainings, convergence, sharded-eval
#   equality, dryrun regression under the driver env.
#
# Both tiers run on CPU (tests/conftest.py forces jax_platforms=cpu with 8
# virtual devices). XLA CPU compiles are NOT served by the persistent
# compile cache across runs with code changes, but jit caching within one
# pytest process is what keeps the fast tier fast — run tiers as single
# invocations, don't split files across processes.
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-fast}"
case "$tier" in
  fast) exec python -m pytest tests/ -q ;;
  slow) exec python -m pytest tests/ -q -m slow ;;
  all)  python -m pytest tests/ -q && exec python -m pytest tests/ -q -m slow ;;
  *) echo "usage: scripts/ci.sh [fast|slow|all]" >&2; exit 2 ;;
esac
