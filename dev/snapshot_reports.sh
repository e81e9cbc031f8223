#!/usr/bin/env bash
# Round-close evidence snapshot (VERDICT r15 #1): target/test-reports is
# a SINGLE-GENERATION directory — any later test launch (including the
# driver's own post-close evaluation pass, which is what made round 15
# fail its own check on a green board) destroys the close-time evidence.
# So at close, the board the closing claim rests on is copied — mtimes
# preserved, that's what the ordering check certifies — to a
# round-stamped snapshot that gets COMMITTED with the closing note:
#   bash dev/snapshot_reports.sh 16   ->  reports/r16/*.xml
# Run AFTER the final full `sbt -batch test`, BEFORE the closing commit;
# dev/check_close.sh <N> then verifies the snapshot, not the live dir.
set -eu
cd "$(dirname "$0")/.."

N="${1:?usage: snapshot_reports.sh <roundN>}"
N="${N#r}"
SRC=target/test-reports
DST="reports/r$N"

count=$(ls "$SRC"/*.xml 2>/dev/null | wc -l)
if [ "$count" -eq 0 ]; then
  echo "snapshot: FAIL - no suite XMLs in $SRC (run the full suite first)" >&2
  exit 1
fi
rm -rf "$DST"
mkdir -p "$DST"
cp -p "$SRC"/*.xml "$DST/"
# Manifest of the run's mtimes (ADVICE r16): git does NOT preserve
# mtimes, so on any fresh clone/checkout every snapshot file's mtime
# becomes checkout time and the "newest report precedes HEAD" gate
# would fail on perfectly good committed evidence. The manifest records
# the RUN's timestamps (fractional epoch seconds, from the cp -p
# copies) and check_close.sh prefers it over the filesystem when
# present — so the evidence stays verifiable off the producing tree.
find "$DST" -name '*.xml' -printf '%T@\t%f\n' | sort -k2 > "$DST/manifest.tsv"
echo "snapshot: $count suite reports -> $DST (mtimes preserved + manifest.tsv; commit this with the closing note)"
