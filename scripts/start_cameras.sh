#!/usr/bin/env bash
# Start a camera server on each remote capture host over ssh.
#
# Equivalent of the reference's scripts/*.sh cluster orchestration
# (reference: ssh-launch of pcs-camera-server on each NUC — SURVEY.md §1 L6).
# Hosts come from a file (one "user@host[:port]" per line) or arguments.
#
# Usage: scripts/start_cameras.sh hosts.txt [extra fake_server args...]
set -euo pipefail

HOSTS_FILE="${1:?usage: start_cameras.sh hosts.txt [args...]}"
shift || true
EXTRA_ARGS=("$@")

i=0
while IFS= read -r line; do
  [[ -z "$line" || "$line" == \#* ]] && continue
  host="${line%%:*}"
  port="${line#*:}"; [[ "$port" == "$host" ]] && port=8000
  echo "starting camera server $i on $host:$port"
  ssh -o BatchMode=yes "$host" \
    "nohup python -m pointcloud_stitching_tpu.runtime.fake_server \
       --port $port ${EXTRA_ARGS[*]:-} > /tmp/pcs-camera-$i.log 2>&1 &" &
  i=$((i+1))
done < "$HOSTS_FILE"
wait
echo "started $i camera servers"
