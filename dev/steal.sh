#!/bin/bash
# prints steal% and idle% of the last 3 seconds (host time-share probe);
# busy = 100 - idle - steal
a=($(grep "^cpu " /proc/stat)); sleep 3; b=($(grep "^cpu " /proc/stat))
tot=0; for i in $(seq 1 10); do tot=$((tot + ${b[$i]:-0} - ${a[$i]:-0})); done
st=$(( ${b[8]} - ${a[8]} )); id=$(( ${b[4]} - ${a[4]} ))
echo "steal=$(( 100 * st / (tot==0?1:tot) ))% idle=$(( 100 * id / (tot==0?1:tot) ))%"
