#!/usr/bin/env bash
# Close-ritual invariant check (VERDICT r13 #2: claim AFTER evidence;
# VERDICT r14 #1: the check is the LAST action of a round — any test
# launch after it re-opens the round).
# Run AFTER the final full `sbt -batch test` and AFTER the closing
# commit; exits non-zero if the persisted evidence does not back the
# claimed board:
#   1. target/test-reports holds >0 suite XMLs with 0 failures/errors
#   2. evidence ordering is TWO-SIDED (ADVICE r14): every report mtime
#      postdates the last commit touching src//build.sbt (a green board
#      run against an older binary is stale), and the newest report
#      precedes the HEAD commit time (1 s slack — a report write and
#      the closing commit may legitimately share a second)
#   3. the working tree is clean (uncommitted changes mean the claimed
#      final state isn't the committed one)
#   4. bench/bench_full_r<N>.json exists when a round number is given
# Usage: bash dev/check_close.sh [roundN]
set -u
cd "$(dirname "$0")/.."

python3 - "$@" <<'EOF'
import glob, os, subprocess, sys
import xml.etree.ElementTree as ET

rc = 0
xmls = glob.glob('target/test-reports/*.xml')
if not xmls:
    print('close: FAIL - no persisted reports in target/test-reports'); sys.exit(1)
tot = fail = err = skip = 0
for x in xmls:
    r = ET.parse(x).getroot()
    tot += int(r.get('tests', 0)); fail += int(r.get('failures', 0))
    err += int(r.get('errors', 0)); skip += int(r.get('skipped') or 0)
print(f'close: {len(xmls)} reports, {tot} tests, {fail} failures, {err} errors, {skip} skipped')
if fail or err:
    print('close: FAIL - red persisted board'); rc = 1
if skip:
    print('close: WARN - canceled/skipped tests persisted (hot box during an envelope test?)')

head_ts = int(subprocess.check_output(
    ['git', 'log', '-1', '--format=%ct']).decode().strip())
src_ts = int(subprocess.check_output(
    ['git', 'log', '-1', '--format=%ct', '--', 'src', 'build.sbt']).decode().strip())
newest = max(os.path.getmtime(x) for x in xmls)
oldest = min(os.path.getmtime(x) for x in xmls)
if oldest < src_ts:
    print(f'close: FAIL - oldest report predates the last src/build.sbt commit by '
          f'{src_ts - oldest:.0f} s (stale board: part of the evidence certifies an older binary)')
    rc = 1
else:
    print(f'close: freshness ok - oldest report {oldest - src_ts:.0f} s after the last src commit')
if newest > head_ts + 1:
    print(f'close: FAIL - newest report postdates HEAD by {newest - head_ts:.0f} s '
          '(the closing commit preceded its evidence)'); rc = 1
else:
    print(f'close: ordering ok - newest report {head_ts - newest:.0f} s before HEAD')

dirty = subprocess.check_output(['git', 'status', '--porcelain']).decode().strip()
if dirty:
    print('close: FAIL - working tree not clean:\n' + dirty); rc = 1
else:
    print('close: working tree clean')

if len(sys.argv) > 1:
    n = sys.argv[1].lstrip('r')
    p = f'bench/bench_full_r{n}.json'
    if not os.path.exists(p):
        print(f'close: FAIL - {p} not archived'); rc = 1
    else:
        print(f'close: {p} archived')
print('close: PASS' if rc == 0 else 'close: FAIL')
sys.exit(rc)
EOF
