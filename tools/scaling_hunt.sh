#!/bin/bash
# Scaling-window hunter: probe the host's own parallel-speedup ceiling
# every few minutes (6 s, hardware-only) and launch the full forked
# N->4N scaling pair only when the window is clean. Appends one JSON
# line per probe and per pair to $OUT. Runs graft.Bench straight from
# the compiled classes (no sbt lock).
set -u
OUT=${OUT:-/tmp/scaling_hunt.jsonl}
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA=/usr/lib/jvm/java-17-openjdk-amd64/bin/java
PAIRS=${PAIRS:-"28 832"}   # 2->8 (the contract pair) first, then 8->32
MIN_CPU=${MIN_CPU:-0.95}   # pure-CPU 32v8 per-4x must be near-ideal (clean ~1.02)
MIN_MEM=${MIN_MEM:-0.50}   # bandwidth per-4x; clean windows measure 0.55-0.67
# ABSOLUTE bandwidth floor: external steal often depresses BOTH widths
# proportionally, so the ratio gate alone passes a dirty window. Set it
# between the CURRENT host's idle band and its steal band (2026-08-19:
# idle ~4900-5100, steal <=4400; earlier sessions idled at ~6600)
MIN_MEM32=${MIN_MEM32:-4600}
REPS=${REPS:-2}            # best-of-N per width inside the pair
REPEAT=${REPEAT:-2048}     # corpus scale: docs = 5000 * REPEAT
SLEEP=${SLEEP:-180}
BENCH_LOCK=/tmp/graft_bench.lock
PAIR_LOCK=/tmp/graft_hunt_pair.lock
# the driver bench announces itself via $BENCH_LOCK; while it exists
# (and is < 30 min old — stale otherwise) the hunt must stay entirely
# quiet: even the 6 s probe is load the bench record would absorb
bench_running() {
  [ -f "$BENCH_LOCK" ] || return 1
  local age=$(( $(date +%s) - $(stat -c %Y "$BENCH_LOCK" 2>/dev/null || echo 0) ))
  [ "$age" -lt 1800 ]
}
trap 'rm -f "$PAIR_LOCK"' EXIT
i=0
while true; do
  if bench_running; then sleep 30; continue; fi
  probe=$(SPARK_GRAFT_CALPROBE=1 $JAVA $OPENS -Xmx2g -cp "$CP" graft.Bench 2>/dev/null | grep calprobe || true)
  ts=$(date -u +%FT%TZ)
  if [ -n "$probe" ]; then
    echo "{\"ts\":\"$ts\",${probe#\{}" >> "$OUT"
  else
    echo "{\"ts\":\"$ts\",\"probe\":\"failed\"}" >> "$OUT"
  fi
  cpu=$(echo "$probe" | grep -o '"cpuRatio":[0-9.]*' | cut -d: -f2)
  mem=$(echo "$probe" | grep -o '"memRatio":[0-9.]*' | cut -d: -f2)
  mem32=$(echo "$probe" | grep -o '"mem32":[0-9.]*' | cut -d: -f2)
  if [ -n "${cpu:-}" ] && [ -n "${mem:-}" ] && [ -n "${mem32:-}" ] && \
     python3 -c "import sys; sys.exit(0 if float('$cpu')>=$MIN_CPU and float('$mem')>=$MIN_MEM and float('$mem32')>=$MIN_MEM32 else 1)"; then
    for p in $PAIRS; do
      if bench_running; then break; fi
      if [ "$p" = "832" ]; then FROM=8; TO=32; else FROM=2; TO=8; fi
      rm -rf /dev/shm/graftbench/idx/scale$FROM /dev/shm/graftbench/idx/scale$TO
      touch "$PAIR_LOCK"
      line=$(SPARK_GRAFT_SCALING=1 SPARK_GRAFT_REPEAT=$REPEAT \
        SPARK_GRAFT_SCALE_FROM=$FROM SPARK_GRAFT_SCALE_TO=$TO \
        SPARK_GRAFT_SCALE_REPS=$REPS SPARK_GRAFT_SPECULATION=false \
        SPARK_GRAFT_INPUT_ORDERED=${SPARK_GRAFT_INPUT_ORDERED:-1} \
        SPARK_GRAFT_LOCAL_DIR=/dev/shm/graftbench \
        SPARK_GRAFT_BENCH_DIR=/dev/shm/graftbench/idx \
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        $JAVA $OPENS -Xmx8g -cp "$CP" -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC graft.Bench 2>/dev/null | grep '"scaling"')
      rm -f "$PAIR_LOCK"
      ts=$(date -u +%FT%TZ)
      if [ -n "$line" ]; then
        echo "{\"ts\":\"$ts\",\"pair\":\"$p\",${line#\{}" >> "$OUT"
      else
        echo "{\"ts\":\"$ts\",\"pair\":\"$p\",\"status\":\"failed\"}" >> "$OUT"
      fi
    done
  fi
  i=$((i+1))
  [ -n "${MAX_ITERS:-}" ] && [ "$i" -ge "${MAX_ITERS}" ] && break
  sleep "$SLEEP"
done
