#!/usr/bin/env bash
# Two-JVM full-board soak over ONE shared artifact store (VERDICT r12
# "next round" #3): the unit-level race/recovery pins prove single keys;
# this proves the whole 175-key inventory under real cross-process store
# contention. Two graft.Verify processes start together against the same
# FRESH store root at sf0.01; both boards must come out oracle-green and
# the store must end with exactly one live fingerprint per (name, scope)
# and zero .tmp_ debris.
#
# Usage: bash dev/two_jvm_soak.sh   (from /root/repo, after sbt compile)
# The build/read split is read from the [artifact] stderr breadcrumbs.
set -u
cd "$(dirname "$0")/.."

SF=/root/testdata/sf0.01
WORK=$(mktemp -d /tmp/graft_soak_XXXX)
STORE=$WORK/artifacts
MAIN=target/scala-2.13/classes
CP="/opt/spark/jars/*:$MAIN"

if [ ! -d "$MAIN/graft" ]; then
  echo "soak: compile first (sbt -batch compile)" >&2; exit 1
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

launch() { # $1 = tag — backgrounds in THIS shell so wait() can see it
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  java $ADD_OPENS -Xmx8g -cp "$CP" \
    -Dspark.graft.artifacts.dir="$STORE" \
    graft.Verify "$SF" "$WORK/out_$1" \
    >"$WORK/stdout_$1.log" 2>"$WORK/stderr_$1.log" &
}

echo "soak: work dir $WORK (shared store: $STORE)"
launch A; PA=$!
launch B; PB=$!
T0=$(date +%s)
FAIL=0
wait "$PA" || { echo "soak: Verify A exited nonzero" >&2; FAIL=1; }
TA=$(( $(date +%s) - T0 ))
wait "$PB" || { echo "soak: Verify B exited nonzero" >&2; FAIL=1; }
TB=$(( $(date +%s) - T0 ))
echo "soak: A finished by ${TA}s, B by ${TB}s"

# per-process build/read split from the [artifact] breadcrumbs
for t in A B; do
  n=$(grep -c "^\[artifact\] build" "$WORK/stderr_$t.log" || true)
  echo "soak: process $t paid $n artifact builds:"
  grep "^\[artifact\] build" "$WORK/stderr_$t.log" | sed 's/^/  /'
done

# store audit: one live fp per name, no temp debris
echo "soak: store contents:"
ls -1 "$STORE" | sed 's/^/  /'
TMPS=$(ls -1 "$STORE" | grep -c '^\.tmp_' || true)
DUP=$(ls -1 "$STORE" | grep -v '^\.tmp_' | sed 's/_[0-9a-f]\{16\}$//' | sort | uniq -d)
if [ "$TMPS" -ne 0 ]; then echo "soak: FAIL — $TMPS .tmp_ debris dirs" >&2; FAIL=1; fi
if [ -n "$DUP" ]; then echo "soak: FAIL — duplicate live names: $DUP" >&2; FAIL=1; fi
for d in "$STORE"/*/; do
  if [ ! -f "$d/_graft_done" ]; then
    echo "soak: FAIL — $d lacks its done marker" >&2; FAIL=1
  fi
done

# both boards through the full DuckDB-oracle gate
for t in A B; do
  echo "soak: oracle gate for board $t"
  SUMMARY=$(python3 dev/check_oracle.py "$SF" "$WORK/out_$t" | tail -1)
  echo "  $SUMMARY"
  if ! echo "$SUMMARY" | grep -q " 0 fail, 0 skipped"; then
    echo "soak: FAIL — board $t not fully green" >&2; FAIL=1
  fi
done

if [ "$FAIL" -eq 0 ]; then echo "soak: PASS"; else echo "soak: FAIL"; fi
exit $FAIL
