#!/bin/bash
# Dump .explain("formatted") for the named queries into plans/<round>/
# as <query>_<suffix>.txt — one sbt session for all of them.
# Usage: tools/dump_plans.sh <round-dir e.g. r15> <suffix: before|after> q84_x q85_y ...
set -e
ROUND=$1; SUFFIX=$2; shift 2
mkdir -p "plans/$ROUND"
sbt -batch "runMain graft.tools.Explain $*" 2>/dev/null \
  | awk -v rd="plans/$ROUND" -v sx="$SUFFIX" '
    /^\[info\] ======== / { if (f) close(f); f = rd "/" $3 "_" sx ".txt"; next }
    f && /^\[info\]/ { line = $0; sub(/^\[info\] ?/, "", line); print line > f }'
ls -la "plans/$ROUND/" | grep "_$SUFFIX" | tail -12
