#!/usr/bin/env bash
# Kill camera servers on all capture hosts (reference: the companion kill
# script in scripts/ — SURVEY.md §1 L6).
#
# Usage: scripts/kill_cameras.sh hosts.txt
set -euo pipefail

HOSTS_FILE="${1:?usage: kill_cameras.sh hosts.txt}"
while IFS= read -r line; do
  [[ -z "$line" || "$line" == \#* ]] && continue
  host="${line%%:*}"
  echo "killing camera servers on $host"
  ssh -o BatchMode=yes "$host" \
    "pkill -f pointcloud_stitching_tpu.runtime.fake_server || true" &
done < "$HOSTS_FILE"
wait
