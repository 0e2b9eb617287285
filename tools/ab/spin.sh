#!/bin/sh
# Pure-CPU-starvation arm of the bench A/B rig (SURVEY §6.0, ROUND15 §2):
# N busy-loop processes for SECONDS. Burns cycles, touches no memory.
# Usage: spin.sh [n=12] [seconds=600]
N=${1:-12}
SECS=${2:-600}
i=0
while [ "$i" -lt "$N" ]; do
  timeout "$SECS" sh -c 'while :; do :; done' &
  i=$((i + 1))
done
wait
