#!/usr/bin/env bash
# Cluster deployment entry point (the north rule's `ray job submit` path).
#
# On a real multi-node cluster:
#   ray job submit --address http://<head>:8265 \
#       --working-dir /root/repo \
#       -- python bench.py
#
# The engine needs nothing beyond the working dir: no runtime_env pip
# (ray[data]/pyarrow/numpy are cluster-image deps), no dashboard, no
# driver-local state — index segments and manifests live on the shared
# filesystem given to build_index(), and a resumed job skips _SUCCESS-marked
# segments.  In this sandbox there is no cluster, so the same command runs
# the local-mode equivalent:
set -euo pipefail
cd "$(dirname "$0")/.."
exec python bench.py "$@"
