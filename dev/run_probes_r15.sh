#!/bin/bash
# Round-15 scale probes (VERDICT items 3 + 6 + the d23 line for the log).
# Runs from a snapshot of target/scala-2.13/classes so sbt stays free.
# Appends ProbeR15's JSONL lines to dev/scaleprobe_r15.jsonl.
set -u
CLS=${1:-/tmp/probecls}
OUT=/root/repo/dev/scaleprobe_r15.jsonl
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run() {
  section=$1; shift
  echo "=== probe $section $* $(date -u +%H:%M:%S) ===" >&2
  java -Xmx48g $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" graft.tools.ProbeR15 "$section" "$@" \
    2>/dev/null | grep '^{' | tee -a "$OUT"
}

run d23 1000000
run c27skew 1000000
run t18t19long 1000000
run p01chain 10000000
echo "=== probes done $(date -u +%H:%M:%S) ===" >&2
